package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Funcs.safeDiv

/** Group-level aggregation operators A1-A30 (SURVEY §2.4) re-expressed as
  * single-shuffle Spark aggregations.
  *
  * Reference pattern: `groupby(k).agg(...)` then `merge(df, on=k)`
  * (reference: src/features/aggregation_features_engine.py). Here each
  * family is one `groupBy` (partial aggregation map-side, one shuffle on
  * the key), and "merge back" is a broadcast join when the agg result is
  * dimension-sized — never a second fact shuffle.
  */
object AggFeatures {

  /** A1+A2+A3 — per-key descriptive stats: sum/mean/median/std/min/max/
    * count, higher moments, distinct counts
    * (reference: aggregation_features_engine.py:64-91). The median is
    * exact by default (oracle parity); a cluster deployment sets
    * `spark.graft.exactPercentiles=false` to switch every whole-group
    * percentile in the engine to the t-digest sketch.
    */
  def keyStats(df: DataFrame, key: Seq[Column], qty: Column,
               extraDistinct: Seq[(String, Column)] = Nil,
               exactMedian: Option[Boolean] = None): DataFrame = {
    val base = Seq(
      sum(qty).as("qty_sum"),
      avg(qty).as("qty_mean"),
      graft.functions.Funcs.pct(qty, 0.5, exactMedian).as("qty_median"),
      graft.functions.Funcs.nanToNull(stddev(qty)).as("qty_std"),
      min(qty).as("qty_min"),
      max(qty).as("qty_max"),
      count(qty).as("qty_count"),
      graft.functions.Funcs.nanToNull(variance(qty)).as("qty_var"))
    val distincts = extraDistinct.map { case (n, c) => countDistinct(c).as(n) }
    df.groupBy(key: _*).agg(base.head, (base.tail ++ distincts): _*)
  }

  /** A5 — per-key share of the global total via a grand-total window over
    * the (small) aggregated frame (reference: :168-205). */
  def withShareOfTotal(agg: DataFrame, valueCol: String, shareCol: String): DataFrame = {
    val all = Window.partitionBy()
    agg.withColumn(shareCol, col(valueCol) / sum(col(valueCol)).over(all))
  }

  /** A6 — Shannon entropy of the value distribution within each outer key
    * (portfolio entropy, reference: :194-198): two-level agg,
    * p = v/Σv per outer key, entropy = −Σ p·ln(p).
    */
  def entropy(df: DataFrame, outerKey: Seq[Column], innerKey: Seq[Column], value: Column,
              outNames: Seq[String]): DataFrame = {
    val inner = df.groupBy((outerKey ++ innerKey): _*).agg(sum(value).as("__v"))
    val w = Window.partitionBy(outNames.map(col): _*)
    inner.withColumn("__p", col("__v") / sum(col("__v")).over(w))
      .groupBy(outNames.map(col): _*)
      .agg((-sum(when(col("__p") > 0, col("__p") * log(col("__p"))).otherwise(0.0))).as("entropy"))
  }

  /** A7 — top-N concentration: share of group volume held by the N
    * largest inner members (reference `nlargest(5)`, :233-237). */
  def topNShare(df: DataFrame, outerKey: Seq[Column], innerKey: Seq[Column], value: Column,
                outNames: Seq[String], n: Int = 5): DataFrame = {
    val inner = df.groupBy((outerKey ++ innerKey): _*).agg(sum(value).as("__v"))
    val w = Window.partitionBy(outNames.map(col): _*)
      .orderBy((col("__v").desc +: innerKey.map(_.asc)): _*)
    inner.withColumn("__rk", row_number().over(w))
      .groupBy(outNames.map(col): _*)
      .agg((sum(when(col("__rk") <= n, col("__v")).otherwise(0.0)) / sum(col("__v"))).as(s"top${n}_share"))
  }

  /** A9 — per-key OLS trend slope over monthly buckets, closed form
    * (n·Σxy−ΣxΣy)/(n·Σx²−(Σx)²) with x = months since epoch.
    * Replaces the reference's per-store Python loop
    * (aggregation_features_engine.py:208-230) with a set-based two-level
    * agg — the big asymptotic win flagged in SURVEY §4.
    */
  def monthlyTrendSlope(df: DataFrame, key: Seq[Column], date: Column, value: Column,
                        outNames: Seq[String], epochYear: Int = 1970): DataFrame = {
    val monthly = df
      .withColumn("__x", ((year(date) - epochYear) * 12 + month(date)).cast("double"))
      .groupBy((key :+ col("__x")): _*)
      .agg(sum(value).as("__y"))
    monthly.groupBy(outNames.map(col): _*)
      .agg(
        count(lit(1)).cast("double").as("__n"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"))
      .withColumn("trend_slope",
        when(col("__n") * col("__sxx") - col("__sx") * col("__sx") > 0,
          (col("__n") * col("__sxy") - col("__sx") * col("__sy")) /
            (col("__n") * col("__sxx") - col("__sx") * col("__sx"))))
      .drop("__n", "__sx", "__sy", "__sxy", "__sxx")
  }

  /** A13 — market share + rank + long-tail flags over an aggregated
    * dimension-grain frame (reference: behavioral_features_engine.py:357-436).
    * Rank runs on the AGGREGATED frame (dim-sized) so the single-partition
    * global ordering is safe; never rank the raw fact.
    */
  def marketShareRank(df: DataFrame, key: Seq[Column], value: Column, keyNames: Seq[String]): DataFrame = {
    val agg = df.groupBy(key: _*).agg(sum(value).as("volume"))
    val all = Window.partitionBy()
    val byVol = Window.orderBy((col("volume").desc +: keyNames.map(col(_).asc)): _*)
    agg.withColumn("share", col("volume") / sum(col("volume")).over(all))
      .withColumn("rnk", row_number().over(byVol))
      .withColumn("is_top100", (col("rnk") <= 100).cast("int"))
      .withColumn("is_long_tail", (col("rnk") > count(lit(1)).over(all) * 0.8).cast("int"))
  }

  /** A14 — Herfindahl-Hirschman concentration index per category
    * (reference: behavioral_features_engine.py:397-403). */
  def hhi(df: DataFrame, outerKey: Seq[Column], innerKey: Seq[Column], value: Column,
          outNames: Seq[String]): DataFrame = {
    val inner = df.groupBy((outerKey ++ innerKey): _*).agg(sum(value).as("__v"))
    val w = Window.partitionBy(outNames.map(col): _*)
    inner.withColumn("__p", col("__v") / sum(col("__v")).over(w))
      .groupBy(outNames.map(col): _*)
      .agg(sum(col("__p") * col("__p")).as("hhi"))
  }

  /** A10 — hierarchy-level aggregations in ONE pass via GROUPING SETS
    * instead of the reference's four separate scans
    * (aggregation_features_engine.py:368-472; SURVEY §4 optimization).
    * Uses the Spark 4 `Dataset.groupingSets` API directly — no temp view,
    * so concurrent callers can't collide on a shared view name.
    */
  def hierarchyRollup(df: DataFrame, levels: Seq[String], value: String): DataFrame =
    df.groupingSets(levels.map(l => Seq(col(l))), levels.map(col): _*)
      .agg(
        sum(col(value)).as("level_sum"),
        avg(col(value)).as("level_avg"),
        count(lit(1)).as("level_count"))

  /** A25 — discount lift: mean(qty | discounted) / mean(qty | full price)
    * (reference: business_features_engine.py:186-193) — conditional aggs,
    * one pass. */
  def discountLift(df: DataFrame, key: Seq[Column], qty: Column, discount: Column): DataFrame =
    df.groupBy(key: _*)
      .agg(
        avg(when(discount > 0, qty)).as("avg_qty_discounted"),
        avg(when(discount <= 0, qty)).as("avg_qty_full"))
      .withColumn("discount_lift", safeDiv(col("avg_qty_discounted"), col("avg_qty_full")))

  /** A26 — zero-demand ratios per series (reference: behavioral_features_engine.py:71-88). */
  def zeroDemand(df: DataFrame, key: Seq[Column], qty: Column): DataFrame =
    df.groupBy(key: _*)
      .agg(
        avg(when(qty <= 0, 1.0).otherwise(0.0)).as("zero_ratio"),
        sum(when(qty <= 0, 1L).otherwise(0L)).as("zero_count"),
        count(lit(1)).as("n_obs"))

  /** A21 — price-elasticity correlation per key with a 3-way
    * classification (reference: business_features_engine.py:516-528). */
  def priceElasticity(df: DataFrame, key: Seq[Column], price: Column, qty: Column,
                      minN: Int = 5): DataFrame =
    df.groupBy(key: _*)
      .agg(corr(price, qty).as("price_qty_corr"), count(lit(1)).as("n_obs"))
      // zero-variance groups: Spark corr yields NaN, pandas/SQL yield
      // NULL — normalize so the class ladder matches the reference
      .withColumn("price_qty_corr", graft.functions.Funcs.nanToNull(col("price_qty_corr")))
      .withColumn("elasticity_class",
        when(col("n_obs") <= minN || col("price_qty_corr").isNull, "unknown")
          .when(col("price_qty_corr") < -0.1, "elastic")
          .when(col("price_qty_corr") > 0.1, "premium")
          .otherwise("inelastic"))

  /** A29 — basket co-occurrence with lift, as a distributed self-join on
    * the basket key with a < b dedup and min-support threshold —
    * replacing the reference's driver-memory pair dictionary
    * (behavioral_features_engine.py:457-508; min support 5).
    */
  def coOccurrence(df: DataFrame, basketKey: Seq[String], item: String,
                   minSupport: Long = 5): DataFrame =
    coOccurrenceFromItems(
      df.select((basketKey.map(col) :+ col(item).as("item")): _*).distinct()
        .cache(), // reused 4x below (pair join sides, basket count, item counts)
      basketKey, minSupport)

  /** [[coOccurrence]] over a pre-distincted (basketKey..., item) frame —
    * the shared body that lets [[coOccurrenceAutoWithPath]] reuse the
    * SAME cached frame its gate already materialized instead of
    * re-scanning the fact. `items` must be distinct and cached. */
  private def coOccurrenceFromItems(items: DataFrame, basketKey: Seq[String],
                                    minSupport: Long): DataFrame = {
    val a = items.toDF((basketKey :+ "item_a"): _*)
    val b = items.toDF((basketKey :+ "item_b"): _*)
    // Total basket count as a 1-row agg cross-joined in (broadcast) — no
    // driver-side action at plan-construction time (the eager .count()
    // here was a scale-killer: two extra full scans per call).
    val nBaskets = items.select(basketKey.map(col): _*).distinct()
      .agg(count(lit(1)).cast("double").as("__n_baskets"))
    val itemCounts = items.groupBy(col("item"))
      .agg(countDistinct(col(basketKey.head), basketKey.tail.map(col): _*).as("n"))
    val pairs = a.join(b, basketKey).filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b")).agg(count(lit(1)).as("pair_count"))
      .filter(col("pair_count") >= minSupport)
    pairs
      .join(broadcast(itemCounts.withColumnRenamed("n", "n_a")), col("item_a") === col("item"))
      .drop("item")
      .join(broadcast(itemCounts.withColumnRenamed("n", "n_b")), col("item_b") === col("item"))
      .drop("item")
      .join(broadcast(nBaskets))
      .withColumn("lift",
        (col("pair_count") / col("__n_baskets")) /
          ((col("n_a") / col("__n_baskets")) * (col("n_b") / col("__n_baskets"))))
      .drop("__n_baskets")
  }

  /** A29 (FP-Growth path) — the same co-occurrence+lift table computed
    * via MLlib's distributed FP-Growth instead of the pair self-join.
    * The self-join shuffles |basket|² candidate pairs per basket; at
    * >10⁹ baskets with fat baskets FP-Growth's conditional-tree mining
    * bounds that blowup (BENCH_NOTES names this as the q21 scale path).
    * Output schema and values are identical to `coOccurrence` —
    * AggFeaturesSpec proves parity on real sf0.01 data.
    *
    * One deliberate driver-side action: FP-Growth takes min support as a
    * FRACTION, so the basket count is aggregated once (a single scalar,
    * once per call — not per row). The fraction is nudged half a count
    * below `minSupport` (MLlib takes `ceil(fraction·n)`) and the exact
    * `pair_count >= minSupport` filter is re-applied on the result, so
    * float rounding at the boundary can only over-generate, never drop.
    */
  def coOccurrenceFpGrowth(df: DataFrame, basketKey: Seq[String], item: String,
                           minSupport: Long = 5): DataFrame = {
    import org.apache.spark.ml.fpm.FPGrowth
    val baskets = df.select((basketKey.map(col) :+ col(item).as("item")): _*).distinct()
      .groupBy(basketKey.map(col): _*)
      .agg(collect_set(col("item")).as("items"))
      .cache() // two MLlib passes + the basket count below
    val nBaskets = baskets.count()
    val model = new FPGrowth()
      .setItemsCol("items")
      .setMinSupport((minSupport.toDouble - 0.5) / nBaskets)
      .fit(baskets)
    val freq = model.freqItemsets
    val singles = freq.filter(size(col("items")) === 1)
      .select(element_at(col("items"), 1).as("item"), col("freq").as("n"))
    val pairs = freq.filter(size(col("items")) === 2)
      .select(array_sort(col("items")).as("__its"), col("freq").as("pair_count"))
      .filter(col("pair_count") >= minSupport)
      .select(element_at(col("__its"), 1).as("item_a"),
        element_at(col("__its"), 2).as("item_b"), col("pair_count"))
    pairs
      .join(broadcast(singles.toDF("item", "n_a")), col("item_a") === col("item"))
      .drop("item")
      .join(broadcast(singles.toDF("item", "n_b")), col("item_b") === col("item"))
      .drop("item")
      .withColumn("lift",
        (col("pair_count") / lit(nBaskets.toDouble)) /
          ((col("n_a") / lit(nBaskets.toDouble)) * (col("n_b") / lit(nBaskets.toDouble))))
  }

  /** The A29 path gate: measures the items-per-basket distribution
    * with ONE light aggregate (graft.etl.Skew.keySkewReport over the
    * distinct (basket, item) frame) and names the co-occurrence path
    * that survives it. The exact self-join shuffles Σ|basket|²
    * candidate pairs — fine while baskets are thin, quadratic death on
    * fat ones — so the gate routes to FP-Growth when EITHER the p99
    * basket (heavy tail: most baskets fat) or the max basket (one
    * whale: a single 10⁵-item basket alone emits 10¹⁰ pairs) crosses
    * its bound. One scalar collect per call (the same deliberate
    * driver action class as FP-Growth's own minSupport fraction). */
  def coOccurrencePath(df: DataFrame, basketKey: Seq[String], item: String,
                       fatP99: Long = 64, fatMax: Long = 1024): String =
    pathFromItems(
      df.select((basketKey.map(col) :+ col(item).as("item")): _*).distinct(),
      basketKey, fatP99, fatMax)

  private def pathFromItems(items: DataFrame, basketKey: Seq[String],
                            fatP99: Long, fatMax: Long): String = {
    val rep = graft.etl.Skew.keySkewReport(items, basketKey).head()
    val p99 = rep.getAs[Double]("p99_cnt")
    val mx = rep.getAs[Long]("max_cnt")
    if (p99 > fatP99 || mx > fatMax) "fpgrowth" else "exact"
  }

  /** A29 single entry point (r17 verdict ask #5): the basket-size gate
    * above picks the execution path, so callers stop hand-choosing
    * between [[coOccurrence]] and [[coOccurrenceFpGrowth]]. Returns
    * (chosen path, result) — the path makes the decision pinnable in
    * specs; use [[coOccurrenceAuto]] when only the frame is wanted.
    * Output schema and values are path-independent (AggFeaturesSpec
    * proves parity on real data AND on a fat corpus at the boundary).
    * Cost discipline: the distinct (basket, item) frame is built and
    * cached ONCE — the gate's skew report materializes it, and the
    * exact path's four reuses then hit the cache, so the gate adds one
    * dim-grain aggregate to the plain-coOccurrence cost, not a second
    * fact scan. */
  def coOccurrenceAutoWithPath(df: DataFrame, basketKey: Seq[String], item: String,
                               minSupport: Long = 5, fatP99: Long = 64,
                               fatMax: Long = 1024): (String, DataFrame) = {
    val items = df.select((basketKey.map(col) :+ col(item).as("item")): _*).distinct()
      .cache()
    val path = pathFromItems(items, basketKey, fatP99, fatMax)
    val out = if (path == "fpgrowth")
      coOccurrenceFpGrowth(df, basketKey, item, minSupport)
    else coOccurrenceFromItems(items, basketKey, minSupport)
    (path, out)
  }

  /** [[coOccurrenceAutoWithPath]] without the path tag. */
  def coOccurrenceAuto(df: DataFrame, basketKey: Seq[String], item: String,
                       minSupport: Long = 5): DataFrame =
    coOccurrenceAutoWithPath(df, basketKey, item, minSupport)._2

  /** A18 — frequency encoding: per-value counts joined back
    * (reference: src/data/preprocessors.py:210-248). */
  def frequencyEncode(df: DataFrame, c: String): DataFrame = {
    val counts = df.groupBy(col(c)).agg(count(lit(1)).as(s"${c}_freq"))
    df.join(broadcast(counts), Seq(c), "left")
  }

  /** A4 — derived per-key ratios on top of keyStats: avg unit price
    * Σnet/Σqty, velocity, consistency mean/std, penetration
    * (reference: aggregation_features_engine.py:114-144). Pure post-agg
    * expressions — no extra shuffle. */
  def withDerivedRatios(agg: DataFrame, totalStores: Column): DataFrame =
    agg
      .withColumn("velocity", col("qty_sum") * col("n_stores"))
      .withColumn("consistency", safeDiv(col("qty_mean"), col("qty_std")))
      .withColumn("penetration", col("n_stores") / totalStores)

  /** A8 — modal-category focus: share of the group's volume held by its
    * most frequent inner value (reference: :241-244). max_by-style via a
    * rank window over the two-level agg. */
  def modalShare(df: DataFrame, outerKey: Seq[Column], innerKey: Seq[Column], value: Column,
                 outNames: Seq[String]): DataFrame = {
    val inner = df.groupBy((outerKey ++ innerKey): _*).agg(sum(value).as("__v"))
    val w = Window.partitionBy(outNames.map(col): _*)
      .orderBy((col("__v").desc +: innerKey.map(_.asc)): _*)
    inner.withColumn("__rk", row_number().over(w))
      .groupBy(outNames.map(col): _*)
      .agg((sum(when(col("__rk") === 1, col("__v")).otherwise(0.0)) / sum(col("__v"))).as("modal_share"))
  }

  /** A11 — brand-in-category dominance: Σv(inner within outer)/Σv(outer)
    * (reference: aggregation_features_engine.py:447-467). One two-level
    * agg + a window over the (small) aggregated frame. */
  def dominance(df: DataFrame, outerKey: Seq[Column], innerKey: Seq[Column], value: Column,
                outNames: Seq[String]): DataFrame = {
    val inner = df.groupBy((outerKey ++ innerKey): _*).agg(sum(value).as("volume"))
    val w = Window.partitionBy(outNames.map(col): _*)
    inner.withColumn("dominance", col("volume") / sum(col("volume")).over(w))
  }

  /** A12 — volume-weight tiers: share of global total bucketed into
    * high/medium/low (reference `pd.cut` tiers,
    * aggregation_features_engine.py:474-533). */
  def volumeTiers(df: DataFrame, key: Seq[Column], value: Column, keyNames: Seq[String],
                  hi: Double = 0.01, lo: Double = 0.001): DataFrame = {
    val agg = df.groupBy(key: _*).agg(sum(value).as("volume"))
    val all = Window.partitionBy()
    agg.withColumn("weight", col("volume") / sum(col("volume")).over(all))
      .withColumn("tier",
        when(col("weight") >= hi, "high")
          .when(col("weight") >= lo, "medium")
          .otherwise("low"))
  }

  /** A15 — percent-rank of a value within a key
    * (reference `rank(pct=True)`, aggregation_features_engine.py:340-351).
    * pandas pct rank = rank/count; Spark percent_rank = (rank-1)/(n-1) —
    * engine exposes Spark semantics (documented divergence), with the
    * ordering pinned by a tiebreaker for determinism.
    */
  def percentRankWithin(key: Seq[Column], order: Seq[Column]): Column =
    percent_rank().over(Window.partitionBy(key: _*).orderBy(order: _*))

  /** A19 — label encoding with OOV: values with count ≥ minCount get a
    * dense rank id, the rest map to -1 (reference "__other__",
    * preprocessors.py:222-248). Deterministic: ids ordered by
    * (count desc, value asc) over the dim-sized counts frame. */
  def labelEncode(df: DataFrame, c: String, minCount: Long = 2): DataFrame = {
    val counts = df.groupBy(col(c)).agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") >= minCount)
      .withColumn(s"${c}_code",
        row_number().over(Window.orderBy(col("__cnt").desc, col(c).asc)) - 1)
      .drop("__cnt")
    df.join(broadcast(counts), Seq(c), "left")
      .na.fill(-1, Seq(s"${c}_code"))
  }

  /** A22 — turnover: volume and revenue per active day
    * (reference: business_features_engine.py:531-542). */
  def turnover(df: DataFrame, key: Seq[Column], qty: Column, revenue: Column,
               date: Column): DataFrame =
    df.groupBy(key: _*)
      .agg(sum(qty).as("qty_sum"), sum(revenue).as("rev_sum"),
        countDistinct(to_date(date)).as("active_days"))
      .withColumn("qty_turnover", col("qty_sum") / col("active_days"))
      .withColumn("rev_turnover", col("rev_sum") / col("active_days"))

  /** A27 — burst frequency: share of rows above the per-key median
    * (reference: behavioral_features_engine.py:171-180). Exact percentile
    * as a group window (same shuffle as the agg). */
  def burstFrequency(df: DataFrame, key: Seq[Column], value: Column,
                     outNames: Seq[String], exact: Option[Boolean] = None): DataFrame = {
    val w = Window.partitionBy(key: _*)
    df.withColumn("__med", graft.functions.Funcs.pct(value, 0.5, exact).over(w))
      .groupBy(outNames.map(col): _*)
      .agg(avg(when(value > col("__med"), 1.0).otherwise(0.0)).as("burst_freq"),
        count(lit(1)).as("n_obs"))
  }

  /** A28 — basket stats: per-basket item counts, then per-group
    * mean/std/max basket size (reference: behavioral_features_engine.py:454-517). */
  def basketStats(df: DataFrame, basketKey: Seq[Column], group: Seq[Column], item: Column,
                  groupNames: Seq[String]): DataFrame =
    df.groupBy((basketKey ++ group): _*)
      .agg(countDistinct(item).as("basket_size"))
      .groupBy(groupNames.map(col): _*)
      .agg(
        avg(col("basket_size")).as("avg_basket_size"),
        graft.functions.Funcs.nanToNull(stddev(col("basket_size"))).as("std_basket_size"),
        max(col("basket_size")).as("max_basket_size"),
        count(lit(1)).as("n_baskets"))

  /** A30 — substitute detection: negative demand correlation between
    * same-bucket item pairs. The reference pivots top-100 items into a
    * wide matrix and scans pairwise corr
    * (behavioral_features_engine.py:593-621); here it is a distributed
    * self-join of the (bucket, item, qty) long table on the bucket key
    * restricted to a top-N item set (bounded fan-out, never all-pairs
    * over the catalog). */
  def substituteDetection(df: DataFrame, bucket: Seq[Column], item: Column, qty: Column,
                          bucketNames: Seq[String], topN: Int = 100,
                          corrThreshold: Double = -0.3): DataFrame = {
    val totals = df.groupBy(item.as("__item")).agg(sum(qty).as("__v"))
    val top = totals.orderBy(col("__v").desc, col("__item").asc).limit(topN).drop("__v")
    val long = df.join(broadcast(top), item === col("__item")).drop("__item")
      .groupBy((bucket :+ item.as("item")): _*).agg(sum(qty).as("q"))
    val a = long.toDF((bucketNames :+ "item_a" :+ "qa"): _*)
    val b = long.toDF((bucketNames :+ "item_b" :+ "qb"): _*)
    a.join(b, bucketNames).filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(corr(col("qa"), col("qb")).as("demand_corr"), count(lit(1)).as("n_buckets"))
      .filter(col("demand_corr") < corrThreshold)
  }

  /** O2 — global top-N by aggregated value (reference `nlargest`,
    * analyze_real_data.py:96-106). orderBy+limit = TakeOrdered: per
    * partition top-N then driver merge — no global sort shuffle. */
  def topN(df: DataFrame, key: Seq[Column], value: Column, n: Int): DataFrame =
    df.groupBy(key: _*).agg(sum(value).as("volume"))
      .orderBy(col("volume").desc, key.head.asc)
      .limit(n)

  /** A2 — higher moments per key: skewness and excess kurtosis
    * (reference: aggregation_features_engine.py:80-91). Spark's
    * built-ins are the population (g1/g2) definitions; NaN on zero
    * variance normalized to NULL. */
  def moments(df: DataFrame, key: Seq[Column], value: Column): DataFrame =
    df.groupBy(key: _*)
      .agg(
        graft.functions.Funcs.nanToNull(skewness(value)).as("qty_skew"),
        graft.functions.Funcs.nanToNull(kurtosis(value)).as("qty_kurt"),
        count(lit(1)).as("n_obs"))

  /** A23 — regional rollups: sum/mean/count/std, share of total,
    * 3-way quantile tier, store density and product diversity per
    * region (reference: business_features_engine.py:277-361). The
    * window ops run on the REGION-grain aggregated frame (dim-sized). */
  def regionalRollup(df: DataFrame, region: Column, store: Column, product: Column,
                     value: Column, regionName: String): DataFrame = {
    val agg = df.groupBy(region.as(regionName))
      .agg(
        sum(value).as("vol_sum"),
        avg(value).as("vol_mean"),
        count(lit(1)).as("n_rows"),
        graft.functions.Funcs.nanToNull(stddev(value)).as("vol_std"),
        countDistinct(store).as("n_stores"),
        countDistinct(product).as("n_products"))
    val all = Window.partitionBy()
    agg
      .withColumn("vol_share", col("vol_sum") / sum(col("vol_sum")).over(all))
      .withColumn("econ_tier",
        ntile(3).over(Window.orderBy(col("vol_sum").asc, col(regionName).asc)))
      .withColumn("product_diversity", col("n_products") / col("n_stores"))
  }

  /** J6 — cross-dimension affinity: the (store, product) pair mean
    * against the product's overall mean and the store's overall mean
    * (reference: aggregation_features_engine.py:275-295) — two
    * broadcast joins of dim-grain aggs onto the pair-grain agg. */
  def affinity(df: DataFrame, store: Column, product: Column, value: Column): DataFrame = {
    val pair = df.groupBy(store.as("store"), product.as("product"))
      .agg(avg(value).as("pair_mean"))
    val byProduct = df.groupBy(product.as("product")).agg(avg(value).as("product_mean"))
    val byStore = df.groupBy(store.as("store")).agg(avg(value).as("store_mean"))
    pair
      .join(broadcast(byProduct), Seq("product"))
      .join(broadcast(byStore), Seq("store"))
      .withColumn("product_affinity", col("pair_mean") / col("product_mean"))
      .withColumn("store_affinity", col("pair_mean") / col("store_mean"))
  }

  /** S3 — deterministic row sampling: Bernoulli sample with a fixed
    * seed (the engine analogue of the reference's random row-group
    * sampling, loaders.py:68-98). Pushed to the scan where possible. */
  def sampleRows(df: DataFrame, fraction: Double, seed: Long = 42L): DataFrame =
    df.sample(withReplacement = false, fraction, seed)

  /** Sketch-based per-key profile — the bounded-memory 100 TB posture
    * for A1/A3-style profiling: HyperLogLog++ distinct counts
    * (`approx_count_distinct`, fixed ~kilobytes per group regardless of
    * cardinality) and t-digest medians (`percentile_approx`, bounded by
    * `accuracy`) instead of exact distinct sets / ObjectHashAggregate
    * value buffers. Estimates are engine-specific (registered rows-only;
    * `AggFeaturesSpec` bounds the relative error against the exact
    * aggregates), deterministic for a fixed input.
    */
  def sketchProfile(df: DataFrame, keys: Seq[Column], value: Column,
                    accuracy: Int = 10000, rsd: Double = 0.02): DataFrame =
    df.groupBy(keys: _*)
      .agg(
        count(lit(1)).as("n_rows"),
        approx_count_distinct(value, rsd).as("approx_distinct"),
        percentile_approx(value, lit(0.5), lit(accuracy)).as("approx_median"),
        avg(value).as("mean"))

  /** Robust per-key location: TRIMMED mean (values outside the
    * [lo, hi] within-key percent-rank band are dropped) and WINSORIZED
    * mean (they are clamped to the band-edge values) — the robust
    * family next to the z-score/quantile caps (F4/F5), resistant to
    * the fat tails those caps merely bound. One percent_rank window +
    * one aggregate on the same key exchange; the winsorized sum is
    * reassembled from aggregates (mid-band sum + edge value × tail
    * count), so no second pass over the data. percent_rank is exact
    * rational arithmetic — deterministic across engines; at extreme
    * per-key cardinality swap the window for sketch quantile edges.
    */
  def robustMean(df: DataFrame, key: Seq[Column], value: Column,
                 lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi)
    import graft.functions.Funcs.r
    val w = Window.partitionBy(key: _*).orderBy(value.asc)
    df.withColumn("__pr", percent_rank().over(w))
      .groupBy(key: _*)
      .agg(
        count(lit(1)).as("n_rows"),
        avg(when(col("__pr") >= lo && col("__pr") <= hi, value)).as("__tm"),
        min(when(col("__pr") >= lo, value)).as("__plo"),
        max(when(col("__pr") <= hi, value)).as("__phi"),
        sum(when(col("__pr") >= lo && col("__pr") <= hi, value)
          .otherwise(lit(0.0))).as("__smid"),
        sum(when(col("__pr") < lo, 1L).otherwise(0L)).as("__nlo"),
        sum(when(col("__pr") > hi, 1L).otherwise(0L)).as("__nhi"))
      .withColumn("trimmed_mean", r(col("__tm")))
      .withColumn("winsorized_mean",
        r((col("__smid") + col("__plo") * col("__nlo") + col("__phi") * col("__nhi"))
          / col("n_rows")))
      .select(key ++ Seq(col("n_rows"), col("trimmed_mean"), col("winsorized_mean")): _*)
  }
}
