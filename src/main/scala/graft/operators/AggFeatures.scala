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
    * (reference: aggregation_features_engine.py:64-91). Exact `percentile`
    * for oracle parity — swap to percentile_approx at 100 TB.
    */
  def keyStats(df: DataFrame, key: Seq[Column], qty: Column, extraDistinct: Seq[(String, Column)] = Nil): DataFrame = {
    val base = Seq(
      sum(qty).as("qty_sum"),
      avg(qty).as("qty_mean"),
      percentile(qty, lit(0.5)).as("qty_median"),
      stddev(qty).as("qty_std"),
      min(qty).as("qty_min"),
      max(qty).as("qty_max"),
      count(qty).as("qty_count"),
      variance(qty).as("qty_var"))
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
                        outNames: Seq[String]): DataFrame = {
    val monthly = df
      .withColumn("__x", (year(date) * 12 + month(date)).cast("double"))
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
                   minSupport: Long = 5): DataFrame = {
    val items = df.select((basketKey.map(col) :+ col(item).as("item")): _*).distinct()
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

  /** A18 — frequency encoding: per-value counts joined back
    * (reference: src/data/preprocessors.py:210-248). */
  def frequencyEncode(df: DataFrame, c: String): DataFrame = {
    val counts = df.groupBy(col(c)).agg(count(lit(1)).as(s"${c}_freq"))
    df.join(broadcast(counts), Seq(c), "left")
  }
}
