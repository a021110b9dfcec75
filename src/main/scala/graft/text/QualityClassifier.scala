package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** CCNet/fastText-style trained quality classifier over hashed token
  * features — the "learn a linear scorer from a weak label, score the
  * whole corpus" curation step of a large-scale training-data pipeline
  * (complements the rule-based [[QualityFilter]]: that one applies
  * fixed heuristics, this one FITS weights to a supervision signal).
  *
  * Design for cross-engine exactness (the Lloyd/ALS recipe):
  *   - features: token → portable polynomial hash → one of `buckets`
  *     count buckets, normalized by doc length and quantized to the
  *     1e-6 grid as micro-int longs; the bias is bucket `buckets` with
  *     constant feature value 1.0 (the standard augmentation), so no
  *     code path special-cases it;
  *   - squash: the rational fast-sigmoid p = 1/2 + s/(2(1+|s|)) instead
  *     of the logistic 1/(1+e^-s) — every operation (+ · / abs) is
  *     IEEE-correctly-rounded, so any engine computes bit-identical
  *     probabilities, where exp() differs in last ulps across libms;
  *   - arithmetic: weights, scores, probabilities and gradients all
  *     live on the 1e-6 micro-int grid; every cross-row sum is an
  *     exact integer sum (order-independent), and every division is a
  *     single deterministic double op followed by an explicit
  *     away-from-zero round — DuckDB replays the whole fit term for
  *     term in an unrolled CTE (q288).
  *
  * Scale shape: the feature table (≤ buckets+1 rows per doc) is
  * repartitioned by doc_id and cached once; each of the `iters` steps
  * is one doc-grain aggregate + one co-partitioned join + one
  * bucket-grain aggregate whose result (buckets+1 longs) is collected
  * to the driver — the weight vector is the only driver-side state,
  * exactly like [[graft.sim.Similarity.lloydCentroids]]. Nothing
  * fact-sized ever reaches the driver; iteration count is fixed.
  */
object QualityClassifier {

  val Micro = 1000000L

  /** Away-from-zero half rounding — matches C++ std::round / DuckDB
    * round(); `math.round` would pull negative halves toward +inf. */
  private def roundAway(x: Double): Long =
    (math.signum(x) * math.floor(math.abs(x) + 0.5)).toLong

  /** Train `iters` fixed steps of quasi-logistic regression of `label`
    * on hashed token counts of `text`, then score every doc. Output:
    * (doc_id, label, score, prob, pred) — score/prob on the 1e-6 grid.
    * `lrHalf`: the learning rate is fixed at 1/2 so the weight step
    * `g/2` stays exactly representable on the micro grid. */
  def trainScore(docs: DataFrame, idCol: Column, textCol: Column,
                 labelCol: Column, buckets: Int = 16,
                 iters: Int = 6): DataFrame = {
    val spark = docs.sparkSession
    val nDocs = docs.count()
    val base = docs.select(idCol.as("doc_id"),
      labelCol.cast("int").as("y"),
      split(trim(lower(textCol)), "\\s+").as("toks"))

    // bucket rows: per (doc, hash bucket) normalized count, micro-int
    val tok = base.select(col("doc_id"), col("y"),
        explode(col("toks")).as("w"))
      .filter(length(col("w")) > 0)
    val nTok = tok.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val bucketRows = tok
      .withColumn("b", PortableHash.polyBucket(col("w"), buckets).cast("int"))
      .groupBy(col("doc_id"), col("y"), col("b"))
      .agg(count(lit(1)).as("cnt"))
      .join(nTok, "doc_id")
      .select(col("doc_id"), col("y"), col("b"),
        graft.expr.RoundHalfUpExpr.column(col("cnt").cast("double") / col("n") * lit(1e6))
          .cast("long").as("xi"))
    // bias rows: constant feature 1.0 for EVERY doc (even token-less)
    val biasRows = base.select(col("doc_id"), col("y"),
      lit(buckets).as("b"), lit(Micro).as("xi"))
    // eager localCheckpoint (the Lloyd/ALS house pattern): materialized
    // once, lineage truncated, doc_id partitioning kept for the
    // per-iteration doc-grain aggregate + join, nothing left pinned in
    // the cache manager after the session moves on
    val feat = bucketRows.unionByName(biasRows)
      .repartition(col("doc_id")).localCheckpoint(true)

    var w = Array.fill(buckets + 1)(0L) // micro-int weights, bias last
    def termSum: Column = // Σ_b w_b·x_b on the 1e-12 integer grid
      sum(element_at(lit(w), col("b") + 1) * col("xi"))
    def docFrame: DataFrame = feat
      .groupBy(col("doc_id"), col("y"))
      .agg(graft.expr.RoundHalfUpExpr.column(termSum.cast("double") / lit(1e6)).cast("long").as("sm"))
      .withColumn("s", col("sm").cast("double") / lit(1e6))
      .withColumn("pm", graft.expr.RoundHalfUpExpr.column((lit(0.5) + col("s") /
        (lit(2.0) * (lit(1.0) + abs(col("s"))))) * lit(1e6)).cast("long"))
      .withColumn("rm", col("pm") - col("y") * lit(Micro))

    var i = 0
    while (i < iters) {
      val grads = feat.join(docFrame.select(col("doc_id"), col("rm")), "doc_id")
        .groupBy("b").agg(sum(col("xi") * col("rm")).as("gs"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      var b = 0
      while (b <= buckets) {
        val g = roundAway(grads.getOrElse(b, 0L).toDouble / 1e6 / nDocs)
        w(b) -= g / 2 + g % 2 // round-away(g/2), exactly, in integers
        b += 1
      }
      i += 1
    }

    val out = docFrame.select(col("doc_id"), col("y").as("label"),
      (col("sm").cast("double") / lit(1e6) + lit(0.0)).as("score"),
      (col("pm").cast("double") / lit(1e6) + lit(0.0)).as("prob"),
      when(col("pm") >= lit(Micro / 2), 1).otherwise(0).as("pred"))
    out
  }
}
