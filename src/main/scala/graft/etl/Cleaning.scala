package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cleaning predicates F1-F12 (SURVEY §2.2) as composable
  * `DataFrame => DataFrame` transforms mirroring the reference's
  * `clean_data.py` / `preprocessors.py` semantics (same quantiles, same
  * caps), re-expressed as declarative Spark so Catalyst can push filters
  * to the scan and fuse projections.
  *
  * Scale notes: the stats-dependent ops (quantile range, z-score caps,
  * rare-category grouping) compute a tiny agg DataFrame and join it back
  * with a broadcast/scalar subquery shape — one extra small job, no
  * per-row driver logic.
  */
object Cleaning {

  /** F1 — drop rows with nulls in critical key columns
    * (reference: src/data/preprocessors.py:155-167). */
  def dropNullKeys(keys: Seq[String])(df: DataFrame): DataFrame =
    df.na.drop(keys)

  /** F2 — fill missing measures with 0 (reference: preprocessors.py:168-175). */
  def fillZero(cols: Seq[String])(df: DataFrame): DataFrame =
    df.na.fill(0, cols)

  /** F3 — keep strictly-positive measure rows (reference: clean_data.py:107-112). */
  def positiveOnly(c: String)(df: DataFrame): DataFrame =
    df.filter(col(c) > 0)

  /** F4 — keep values within [q_lo, q_hi] exact quantiles
    * (reference: clean_data.py:114-121 uses [Q01, Q99]).
    * Exact `percentile` (not approx) for oracle parity; at 100 TB swap to
    * `percentile_approx` — the transform shape is unchanged.
    */
  def quantileRangeFilter(c: String, lo: Double = 0.01, hi: Double = 0.99,
                          exact: Option[Boolean] = None)(df: DataFrame): DataFrame = {
    val b = df.agg(graft.functions.Funcs.pctArray(col(c), Seq(lo, hi), exact)
        .as("__b"))
      .select(col("__b").getItem(0).as("__lo"), col("__b").getItem(1).as("__hi"))
    df.join(broadcast(b))
      .filter(col(c).between(col("__lo"), col("__hi")))
      .drop("__lo", "__hi")
  }

  /** F5 — z-score outlier capping at mean±kσ, floored at 0
    * (reference: preprocessors.py:130-153, k=3). */
  def zscoreCap(c: String, k: Double = 3.0)(df: DataFrame): DataFrame = {
    val stats = df.agg(avg(col(c)).as("__mu"), stddev(col(c)).as("__sd"))
    df.join(broadcast(stats))
      .withColumn(c,
        greatest(least(col(c), col("__mu") + lit(k) * col("__sd")),
                 greatest(col("__mu") - lit(k) * col("__sd"), lit(0.0))))
      .drop("__mu", "__sd")
  }

  /** F6 — consistency repair: where |total − q·p| > tol and q > 0,
    * recompute unit price as total/q (reference: clean_data.py:123-138). */
  def repairUnitPrice(total: String, qty: String, price: String, tol: Double = 0.01)(df: DataFrame): DataFrame =
    df.withColumn(price,
      when(abs(col(total) - col(qty) * col(price)) > tol && col(qty) > 0,
        col(total) / col(qty)).otherwise(col(price)))

  /** F7 — deterministic keep-first dedup on key columns with an explicit
    * tiebreaker ordering (reference: clean_data.py:140-147 relies on
    * input row order; plain `dropDuplicates` keeps an arbitrary row, so
    * we pin the choice with row_number).
    */
  def dedupKeepFirst(keys: Seq[String], tiebreak: Seq[Column])(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tiebreak: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** F8 — inclusive date-range filter (reference: clean_data.py:149-161). */
  def dateRange(c: String, start: String, end: String)(df: DataFrame): DataFrame =
    df.filter(col(c).between(lit(start), lit(end)))

  /** F9 — trim + titlecase string normalization (reference: clean_data.py:190-192). */
  def normalizeString(c: String)(df: DataFrame): DataFrame =
    df.withColumn(c, initcap(trim(col(c))))

  /** F10 — rare-category grouping: values with group count < minCount
    * become "Other" (reference: clean_data.py:194-202, minCount=100).
    * Count agg → broadcast join back (dim-sized, never a fact shuffle).
    */
  def groupRareCategories(c: String, minCount: Long = 100)(df: DataFrame): DataFrame = {
    val counts = df.groupBy(col(c)).agg(count(lit(1)).as("__cnt"))
    df.join(broadcast(counts), Seq(c), "left")
      .withColumn(c, when(col("__cnt") < minCount, lit("Other")).otherwise(col(c)))
      .drop("__cnt")
  }

  /** F11 — price anomaly repair: drop negatives, cap values above
    * capMult×Q99 at Q99 (reference: clean_data.py:204-219, capMult=10). */
  def priceAnomalyRepair(c: String, capMult: Double = 10.0,
                         exact: Option[Boolean] = None)(df: DataFrame): DataFrame = {
    val pos = df.filter(col(c) >= 0)
    val q = pos.agg(graft.functions.Funcs.pct(col(c), 0.99, exact).as("__q99"))
    pos.join(broadcast(q))
      .withColumn(c, when(col(c) > lit(capMult) * col("__q99"), col("__q99")).otherwise(col(c)))
      .drop("__q99")
  }

  /** F12 — coordinate validation (reference: clean_data.py:258-271). */
  def validCoordinates(lat: String, lon: String)(df: DataFrame): DataFrame =
    df.filter(
      col(lat).between(-90, 90) && col(lon).between(-180, 180) &&
      !(col(lat) === 0 && col(lon) === 0))

  /** F13 — referential-integrity probe: orphan fact keys not present in a
    * dimension (reference: clean_data.py:303-334) as a left_anti join. */
  def orphans(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String): DataFrame =
    fact.join(dim, fact(factKey) === dim(dimKey), "left_anti")

  /** F14 — single-pass data-quality report: per requested column the
    * null count, distinct count, zero count
    * (reference: src/data/validators.py:361-474 does one pandas pass per
    * column; here ONE distributed agg covers all columns).
    */
  def qualityReport(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
        countDistinct(col(c)).as(s"${c}_distinct"),
        sum(when(col(c) === 0, 1L).otherwise(0L)).as(s"${c}_zeros"))
    } :+ count(lit(1)).as("total_rows")
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** F15 — business-range violation report: counts of rows breaking
    * named predicates (reference: src/data/validators.py:536-541 checks
    * non-negativity and hard caps). One pass, conditional sums. */
  def rangeViolations(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    val aggs = checks.map { case (n, pred) =>
      sum(when(pred, 1L).otherwise(0L)).as(n)
    } :+ count(lit(1)).as("total_rows")
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Robust (median/IQR) scaling within keys — the outlier-resistant
    * sibling of the F5 z-score (median and quartiles shrug off the tail
    * values that drag a mean/stddev). Percentiles go through
    * [[graft.functions.Funcs.pct]], so the engine-wide exactness conf
    * applies: exact (oracle parity) locally, t-digest sketches at
    * 100 TB. One exchange — all three quantiles share the key window. */
  def robustScale(df: DataFrame, keys: Seq[Column], value: Column,
                  out: String = "robust_z"): DataFrame = {
    import graft.functions.Funcs
    val w = Window.partitionBy(keys: _*)
    // r17: the three quantiles share one array-percentile window
    // function (one value->count buffer per partition, one sort)
    // instead of three independent ones
    // __robustz_q, not a generic __q: withColumn silently replaces a
    // pre-existing caller column of the same name (r17 ADVICE) — the
    // operator-specific prefix makes a collision practically impossible
    df.withColumn("__robustz_q", Funcs.pctArray(value, Seq(0.5, 0.25, 0.75)).over(w))
      .withColumn(out, Funcs.safeDiv(value - col("__robustz_q").getItem(0),
        col("__robustz_q").getItem(2) - col("__robustz_q").getItem(1)))
      .drop("__robustz_q")
  }

  /** Expectation-suite style rule report: each rule is a named boolean
    * expectation; a row violates the rule when the predicate is not
    * TRUE (NULL counts as a violation — an unknown is not a pass). All
    * rules evaluate in ONE aggregate pass over one scan, exploded to a
    * (rule, n_rows, n_violations, violation_rate) row per rule —
    * the generalized form of the F14/F15 fixed reports. */
  def ruleReport(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    import graft.functions.Funcs
    require(rules.nonEmpty)
    val aggs = count(lit(1)).as("__n") +:
      rules.zipWithIndex.map { case ((_, pred), i) =>
        sum(when(pred, 0L).otherwise(1L)).as(s"__v_$i")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = rules.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("rule"), col("__n").as("n_rows"),
        col(s"__v_$i").as("n_violations"),
        Funcs.r(col(s"__v_$i") / col("__n")).as("violation_rate"))
    }
    one.select(explode(array(rows: _*)).as("__r")).select(col("__r.*"))
  }
}
