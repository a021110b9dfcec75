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
}
