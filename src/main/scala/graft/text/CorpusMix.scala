package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.PortableHash

/** Corpus source mixing — sample a multi-source corpus down to target
  * proportions (the pretraining "data mixing" step: N% web, M% books,
  * … of a target token budget). Per-source sampling fractions are
  * derived from the observed source sizes entirely inside the plan (a
  * tiny source-count broadcast — no driver collect), and the row-level
  * decision is the deterministic Lehmer threshold test, so the same
  * document is kept or dropped consistently in every engine and run.
  *
  * A source whose weight asks for more documents than it has is kept
  * whole (fraction capped at 1) — the standard under-supplied-source
  * behavior; upsampling/epoch repetition is a separate concern.
  *
  * Scale shape: one partial-agg groupBy for source counts (rows =
  * #sources), broadcast back, then a pure codegen'd filter on the fact —
  * no fact shuffle at all.
  */
object CorpusMix {

  /** Keep a deterministic sample such that source `s` contributes
    * ≈ `weights(s) · targetFraction · |corpus|` documents (capped at the
    * source's size). Sources absent from `weights` are dropped. */
  def mixToTarget(df: DataFrame, id: String, source: String,
                  weights: Map[String, Double],
                  targetFraction: Double): DataFrame = {
    val counts = df.groupBy(col(source).as("__src"))
      .agg(count(lit(1)).cast("double").as("__cnt"))
    val total = df.agg(count(lit(1)).cast("double").as("__total"))
    // weight·targetFraction precomputed per source so both engines see
    // the identical double literal (oracle parity)
    val wtf = weights.foldLeft(lit(0.0)) { case (acc, (s, w)) =>
      when(col(source) === lit(s), lit(w * targetFraction)).otherwise(acc)
    }
    val frac = least(lit(1.0), wtf * col("__total") / col("__cnt"))
    df.join(broadcast(counts), col(source) === col("__src"))
      .crossJoin(broadcast(total))
      .filter(PortableHash.lehmer(col(id)) < floor(lit(PortableHash.M31) * frac))
      .drop("__src", "__cnt", "__total")
  }

  /** Temperature-scaled source weights — the multilingual-LM sampling
    * scheme (mBERT/XLM-R style): w_s ∝ (n_s/N)^(1/T), normalized.
    * T = 1 reproduces the observed proportions; T → ∞ flattens toward
    * uniform, boosting low-resource sources at the expense of the
    * head. Emits the (source, n_docs, raw_share, weight) table a
    * caller feeds to [[mixToTarget]].
    *
    * Determinism: the share is rounded to the 4dp grid BEFORE the
    * power (both engines then exponentiate the identical double; the
    * residual pow() last-ulp class is the champion ln()/exp()
    * convention), the powered value rounds to the 1e-8 grid, and the
    * normalizer is an exact micro-int sum of those rounded values.
    * Scale shape: one source-grain aggregate + windows over that tiny
    * grain — the fact is scanned once, nothing fact-sized shuffles. */
  def temperatureWeights(df: DataFrame, source: String,
                         temperature: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Funcs.r
    val invT = 1.0 / temperature
    val wAll = Window.partitionBy(lit(0))
    val counts = df.groupBy(col(source).as("source"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("__tot", sum(col("n_docs")).over(wAll))
      .withColumn("raw_share",
        r(col("n_docs").cast("double") / col("__tot")))
      .withColumn("__pw", r(pow(col("raw_share"), lit(invT)), 8))
    counts
      .withColumn("__norm",
        sum(graft.expr.RoundHalfUpExpr.column(col("__pw") * lit(1e8)).cast("decimal(38,0)")).over(wAll)
          .cast("double") / lit(1e8))
      .select(col("source"), col("n_docs"), col("raw_share"),
        r(col("__pw") / col("__norm"), 6).as("weight"))
  }
}
