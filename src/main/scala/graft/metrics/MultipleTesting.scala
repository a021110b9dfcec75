package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Funcs

/** Multiple-testing control — the capstone the engine's rank-test
  * battery implies: running Mann–Whitney/Wilcoxon/Kruskal–Wallis per
  * SEGMENT produces hundreds-to-thousands of simultaneous hypotheses
  * (one per supplier/part/store), and reading their raw p-values at
  * α inflates false discoveries linearly in the family size. The
  * standard fix is Benjamini–Hochberg step-up FDR control
  * (Benjamini & Hochberg 1995), plus the normal-tail p-value bridge
  * from the tests' z statistics.
  *
  * Scale shape: one rank window + two window aggregates per family —
  * family-keyed exchanges only, fact-free (input is the TEST grain,
  * one row per hypothesis).
  */
object MultipleTesting {

  /** Two-sided normal p-value from a z statistic:
    * p = erfc(|z|/√2) via the Abramowitz–Stegun 7.1.26 polynomial
    * (|error| < 1.5e-7, far below the 4dp output grid):
    *   t = 1/(1 + 0.3275911·x),
    *   erf(x) ≈ 1 − (a₁t + a₂t² + a₃t³ + a₄t⁴ + a₅t⁵)·e^(−x²)
    * The only libm call is exp — the accepted cross-engine class
    * (AIC/q276/q316 precedent) under the 4dp rounding; every other
    * term is plain polynomial arithmetic an oracle replays verbatim.
    * Input z is rounded to the 4dp grid first so both engines evaluate
    * the identical polynomial argument. */
  def normalPTwoSided(z: Column): Column = {
    val x = Funcs.r(abs(z)) / math.sqrt(2.0)
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
    val poly = (lit(0.254829592) * t - lit(0.284496736) * (t * t)
      + lit(1.421413741) * (t * t * t) - lit(1.453152027) * (t * t * t * t)
      + lit(1.061405429) * (t * t * t * t * t))
    Funcs.r(poly * exp(-(x * x)))
  }

  /** Benjamini–Hochberg step-up over a family of hypotheses: rows are
    * tests, `p` their (4dp-rounded) p-values, `familyCols` the scope
    * within which the false-discovery rate is controlled (empty = one
    * global family). Returns the input keys plus
    *   p_value  — the rounded input,
    *   bh_rank  — 1-based rank of p within the family (ties break by
    *              `tiebreak` so the rank is deterministic),
    *   m_tests  — family size,
    *   q_value  — the BH adjusted p: min_{j ≥ rank}(p_(j)·m/j),
    *              clamped to 1 (monotone by the running-min window),
    *   reject   — 1 iff rank ≤ max{ j : p_(j) ≤ j·α/m } (the step-up
    *              rule: everything below the largest passing rank
    *              rejects, even rows that individually miss their own
    *              threshold).
    * All arithmetic is deterministic transforms of the rounded p and
    * exact integer ranks; q_value rounds to the 4dp grid.
    *
    * Scale bound: BH is a GLOBAL order statistic over each family, so
    * every family's ranks run in one window partition — with empty
    * `familyCols` that is one single partition over the whole battery.
    * Intended bound: ≤ ~10⁶ hypotheses per family (a one-partition
    * sort of narrow (p, tiebreak) rows; same class as A13's documented
    * dim-grain ranks). Wider batteries must carry a real family key in
    * `familyCols` (per-metric, per-segment) so the rank windows
    * partition — FDR control is per-family by definition, so that is
    * also the statistically right scoping. */
  def bhFdr(df: DataFrame, familyCols: Seq[String], idCols: Seq[String],
            p: Column, alpha: Double, tiebreak: Column): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    if (familyCols.isEmpty)
      System.err.println("graft.MultipleTesting.bhFdr: empty familyCols = " +
        "single-partition rank over the whole battery; intended for " +
        "families <= ~1e6 hypotheses (pass familyCols to partition wider)")
    val fam = familyCols.map(col)
    val ids = idCols.map(col)
    val base = df.select((fam ++ ids) :+ Funcs.r(p).as("p_value") :+
      tiebreak.as("__tb"): _*)
      .filter(col("p_value").isNotNull)
    val wRank = Window.partitionBy(fam: _*).orderBy(col("p_value"), col("__tb"))
    val wFam = Window.partitionBy(fam: _*)
    val wTail = Window.partitionBy(fam: _*).orderBy(col("bh_rank").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("bh_rank", row_number().over(wRank).cast("long"))
      .withColumn("m_tests", count(lit(1)).over(wFam))
      .withColumn("__qraw",
        col("p_value") * col("m_tests") / col("bh_rank"))
      .withColumn("q_value", Funcs.r(least(min(col("__qraw")).over(wTail), lit(1.0))))
      .withColumn("__passrk",
        max(when(col("p_value") <= col("bh_rank") * lit(alpha) / col("m_tests"),
          col("bh_rank"))).over(wFam))
      .withColumn("reject",
        (col("__passrk").isNotNull && col("bh_rank") <= col("__passrk"))
          .cast("int"))
      .select((fam ++ ids) ++ Seq(col("p_value"), col("bh_rank"),
        col("m_tests"), col("q_value"), col("reject")): _*)
  }
}
