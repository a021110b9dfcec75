package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining batch construction: assign documents
  * to fixed token-budget bins ("pack 2048-token sequences") using the
  * streaming contiguous-fill strategy — documents in a deterministic
  * order, a running token count, bin id = exclusive-prefix-sum ÷ budget.
  * The standard large-scale approximation of bin packing (first-fit on
  * a stream); exact bin packing is NP-hard and needs no distributed
  * engine to lose to this on wall-clock.
  *
  * Scale shape: packing runs INDEPENDENTLY per `partCol` (source, shard,
  * language…) — one hash exchange on it, a window cumsum within, so
  * parallelism = number of packing groups and no global order is ever
  * imposed. A document longer than the budget occupies its own bin(s)
  * boundary-straddling (contiguous fill never splits documents).
  */
object SequencePack {

  /** Per-document bin assignment: (partCol, id, n_tokens, bin). */
  def assign(df: DataFrame, partCol: String, id: String, text: String,
             budget: Int): DataFrame = {
    val nTok = size(TextAnalysis.tokens(col(text))).cast("long")
    val w = Window.partitionBy(col(partCol)).orderBy(col(id))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(partCol), col(id), nTok.as("n_tokens"))
      .withColumn("bin",
        floor(coalesce(sum(col("n_tokens")).over(w), lit(0L)) / lit(budget.toLong)))
  }

  /** Bin-level rollup: documents and tokens per (partCol, bin) — the
    * packing efficiency view (tokens ≈ budget per full bin). */
  def bins(df: DataFrame, partCol: String, id: String, text: String,
           budget: Int): DataFrame =
    assign(df, partCol, id, text, budget)
      .groupBy(col(partCol), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
}
