package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Funcs

/** Importance-weighted data selection (DSIR/CCNet-style, unigram
  * grain): score every document by how much more likely its tokens are
  * under a TARGET slice of the corpus than under the corpus as a whole,
  * `score(doc) = mean_w ln( P_target(w) / P_corpus(w) )` with add-k
  * smoothed unigram models. High scorers read like the target domain —
  * the standard cheap proxy for "keep data that looks like my
  * high-quality seed" when curating pretraining corpora. The hashed
  * n-gram variant of the published method trades the vocabulary for
  * fixed buckets; at the unigram grain the vocabulary IS bounded, so
  * the exact form stays fully relational and oracle-checkable.
  *
  * Scale shape: identical to [[NgramLm]] — two vocabulary-bounded count
  * tables (one map-side-combined groupBy each), per-token log-ratios
  * INTEGERIZED to micro-units before the per-doc mean (a 6dp-rounded
  * double is still binary-inexact, so summing it is partial-agg-order
  * dependent; integer micro-sums are exact in any order), one
  * corpus-sized aggregation to the doc grain. The ratio table joins
  * broadcast under AQE.
  */
object Dsir {

  /** @param isTarget row predicate marking the target slice (its rows
    *                 also count in the corpus model — DSIR's raw
    *                 distribution is the whole pool).
    * @return (idCol, n_tokens, dsir_score) for docs with ≥1 token. */
  def unigramLogRatioScore(df: DataFrame, idCol: String, text: String,
                           isTarget: Column, k: Double = 0.5): DataFrame = {
    val toks = df.select(col(idCol), isTarget.as("__t"),
        explode(split(trim(lower(col(text))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
    val counts = toks.groupBy(col("w"))
      .agg(count(lit(1)).as("__cc"),
        sum(when(col("__t"), 1L).otherwise(0L)).as("__ct"))
      .localCheckpoint(true) // vocab grain — totals and the join read it
    val totals = counts.agg(sum(col("__cc")).as("__tc"),
      sum(col("__ct")).as("__tt"), count(lit(1)).as("__v"))
    val ratios = counts.crossJoin(broadcast(totals))
      .select(col("w"), graft.expr.RoundHalfUpExpr.column(
        log(((col("__ct") + lit(k)) / (col("__tt") + lit(k) * col("__v"))) /
          ((col("__cc") + lit(k)) / (col("__tc") + lit(k) * col("__v")))) * 1e6).cast("long").as("__lr"))
    toks.join(ratios, "w")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        Funcs.r(sum(col("__lr")) / lit(1e6) / count(lit(1))).as("dsir_score"))
  }
}
