package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Funcs.{microSum, r}
import graft.functions.PortableHash

/** k-anonymity / l-diversity governance profile (Sweeney 2002;
  * Machanavajjhala et al. 2007) — the privacy-risk assessment a
  * training-data pipeline runs BEFORE releasing user-derived records
  * into a corpus. Complements the PII scrubber (TextAnalysis.scrub,
  * q121): that redacts free text; this measures re-identification risk
  * carried by STRUCTURED quasi-identifier combinations.
  *
  * A record is k-anonymous when at least k records share its
  * quasi-identifier (QI) combination; its equivalence class is
  * l-diverse when the class carries ≥ l distinct sensitive values
  * (a class can be large yet still leak the sensitive attribute when
  * every member shares it — the homogeneity attack).
  *
  * Scale shape: ONE hash-aggregate on the QI key computes class size
  * and the exact distinct sensitive count (no window, no join);
  * prosecutor risk is the rounded reciprocal class size. 100 TB
  * posture: the QI grain is the output grain — cardinality-bounded by
  * the QI domain, never by row count — and partial aggregation
  * combines map-side like any other groupBy.
  */
object Privacy {

  /** Per-equivalence-class profile: QI values, class size, distinct
    * sensitive values, prosecutor re-identification risk (1/size), and
    * the k / l gate flags. */
  def kAnonymityProfile(df: DataFrame, qiCols: Seq[(String, Column)],
                        sensitive: Column, k: Int = 5,
                        l: Int = 2): DataFrame =
    df.groupBy(qiCols.map { case (n, c) => c.as(n) }: _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(sensitive).as("l_distinct"))
      .select(qiCols.map { case (n, _) => col(n) } ++ Seq(
        col("class_size"),
        col("l_distinct"),
        r(lit(1.0) / col("class_size")).as("prosecutor_risk"),
        (col("class_size") < k).as("below_k"),
        (col("l_distinct") < l).as("below_l")): _*)

  /** Corpus-level release gate over [[kAnonymityProfile]]: rows/classes
    * at risk, worst class, and the max prosecutor risk — the one-row
    * scorecard a release pipeline thresholds on. */
  def kAnonymitySummary(df: DataFrame, qiCols: Seq[(String, Column)],
                        sensitive: Column, k: Int = 5,
                        l: Int = 2): DataFrame = {
    val prof = kAnonymityProfile(df, qiCols, sensitive, k, l)
    prof.agg(
      count(lit(1)).as("n_classes"),
      sum(col("class_size")).as("n_rows"),
      sum(when(col("below_k"), 1L).otherwise(0L)).as("classes_below_k"),
      sum(when(col("below_k"), col("class_size")).otherwise(lit(0L)))
        .as("rows_below_k"),
      sum(when(col("below_l"), 1L).otherwise(0L)).as("classes_below_l"),
      min(col("class_size")).as("min_class_size"),
      max(col("prosecutor_risk")).as("max_prosecutor_risk"))
      .select(col("n_classes"), col("n_rows"),
        col("classes_below_k"), col("rows_below_k"),
        r(col("rows_below_k").cast("double") / col("n_rows") * 100)
          .as("pct_rows_below_k"),
        col("classes_below_l"), col("min_class_size"),
        col("max_prosecutor_risk"))
  }

  /** ε-differentially-private count/sum release (the Laplace
    * mechanism, Dwork et al. 2006): per released group, noise with
    * scale sensitivity/ε is added to the true count (sensitivity 1)
    * and true sum before anything leaves the operator — the
    * aggregate-release complement of [[suppressBelowK]] (that drops
    * risky rows; this perturbs what is published).
    *
    * The noise draw is DETERMINISTIC and replayable: the group key
    * string hashes through the portable polynomial into a Lehmer
    * uniform u ∈ (0,1), and the inverse-CDF transform
    * −b·sign(u−½)·ln(1−2|u−½|) yields the Laplace deviate (ln feeds a
    * hash-checked output only after the house 4dp rounding — the
    * q144/q276 libm convention; count and sum draw DISTINCT uniforms
    * via different Lehmer round counts — decorrelated by the
    * multiplicative step, not formally independent). Keyed deterministic
    * noise is the consistent-release discipline (repeated releases of
    * the same group reuse one draw, so averaging attacks gain
    * nothing); `seed` stands in for the secret a production deployment
    * would key with. True values never appear in the output.
    *
    * Scale shape: ONE hash-aggregate at the release grain; the noise
    * is scalar expression work on the (small) released table. */
  def dpRelease(df: DataFrame, qiCols: Seq[(String, Column)], value: Column,
                eps: Double = 1.0, sensitivity: Double = 1.0,
                seed: Long = 42L): DataFrame = {
    val grouped = df.groupBy(qiCols.map { case (n, c) => c.as(n) }: _*)
      .agg(count(lit(1)).as("__n"), microSum(value).as("__s"))
    val keyHash = PortableHash.polyHash(
      concat_ws("|", qiCols.map { case (n, _) => col(n).cast("string") }: _*))
    def lap(rounds: Int, b: Double) = {
      val u = (PortableHash.lehmer(keyHash + lit(seed), rounds).cast("double") +
        lit(0.5)) / lit(PortableHash.M31.toDouble)
      val c = u - lit(0.5)
      r(-lit(b) * signum(c) * log(lit(1.0) - lit(2.0) * abs(c)))
    }
    grouped.select(qiCols.map { case (n, _) => col(n) } ++ Seq(
      r(col("__n") + lap(3, 1.0 / eps)).as("dp_count"),
      r(col("__s") + lap(4, sensitivity / eps)).as("dp_sum")): _*)
  }

  /** Suppression pass: drop every row whose QI equivalence class is
    * smaller than k — the minimal-distortion release transform (coarsen
    * a QI column and re-profile when the suppression rate is too high).
    *
    * The kept-class table has one row per surviving equivalence class —
    * up to n/k rows, i.e. DATA-dependent, and largest precisely in the
    * high-cardinality-QI regime this operator exists for. So no
    * broadcast hint: the semi-join is null-safe-equality (shuffle-hash /
    * sort-merge joinable) and AQE broadcasts it at runtime when the
    * measured size is actually small. The fact table is touched once. */
  def suppressBelowK(df: DataFrame, qiCols: Seq[(String, Column)],
                     k: Int = 5): DataFrame = {
    val names = qiCols.map(_._1)
    val withQi = df.select(col("*") +:
      qiCols.map { case (n, c) => c.as(s"__qi_$n") }: _*)
    val keep = withQi.groupBy(names.map(n => col(s"__qi_$n")): _*)
      .agg(count(lit(1)).as("__cs")).filter(col("__cs") >= k)
      .select(names.map(n => col(s"__qi_$n").as(s"__k_$n")): _*)
    val cond = names.map(n => col(s"__qi_$n") <=> col(s"__k_$n")).reduce(_ && _)
    withQi.join(keep, cond, "leftsemi")
      .drop(names.map(n => s"__qi_$n"): _*)
  }
}
