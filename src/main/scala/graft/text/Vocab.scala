package graft.text

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Funcs

/** Corpus vocabulary statistics for tokenizer/vocab construction: global
  * token frequencies, Zipf ranks and cumulative coverage — "how many
  * vocab entries cover X% of the corpus", the sizing question for BPE /
  * WordPiece vocabularies over a pretraining corpus.
  *
  * Scale shape (100 TB): tokenize → ONE partial-aggregated groupBy on
  * token (map-side combine collapses within-partition repeats, so the
  * shuffle carries per-partition distinct tokens — bounded by vocabulary,
  * not corpus size), then a TakeOrdered top-k. Rank/coverage windows run
  * on the k-row result only; the full token distribution is never
  * globally sorted.
  */
object Vocab {

  /** Token frequencies (whitespace tokenization, lowercased). */
  def tokenCounts(df: DataFrame, text: String): DataFrame =
    df.select(explode(split(trim(lower(col(text))), "\\s+")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))

  /** Top-k vocabulary with Zipf rank and cumulative corpus coverage.
    * Deterministic order: count desc, token asc. `cum_share` is the
    * fraction of ALL token occurrences (not just top-k) covered by
    * ranks 1..r. */
  def topTokens(df: DataFrame, text: String, k: Int): DataFrame = {
    val counts = tokenCounts(df, text)
    val total = counts.agg(sum(col("cnt")).cast("double").as("__total"))
    val top = counts.orderBy(col("cnt").desc, col("token").asc).limit(k)
    // windows below run on k rows (post-limit) — single-partition is fine
    val byRank = Window.orderBy(col("cnt").desc, col("token").asc)
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(byRank).cast("long"))
      .withColumn("cum_share", Funcs.r(
        sum(col("cnt")).over(byRank.rowsBetween(Window.unboundedPreceding, 0)) /
          col("__total")))
      .select(col("token"), col("cnt"), col("rank"), col("cum_share"))
  }

  /** Zipf's-law fit over the top-k vocabulary: OLS of ln(freq) on
    * ln(rank) — slope ≈ −s (the Zipf exponent), plus R². Single-row
    * output from one aggregate over the k-row top-token frame; the
    * sufficient-statistic formulation keeps it engine-portable. */
  def zipfFit(df: DataFrame, text: String, k: Int): DataFrame = {
    val t = topTokens(df, text, k)
      .select(log(col("rank").cast("double")).as("x"),
        log(col("cnt").cast("double")).as("y"))
    t.agg(count(lit(1)).cast("double").as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("n").cast("long").as("n_terms"),
        Funcs.r((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx"))).as("slope"),
        Funcs.r((col("sy") - (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")) * col("sx")) / col("n"))
          .as("intercept"),
        Funcs.r(
          ((col("n") * col("sxy") - col("sx") * col("sy")) *
            (col("n") * col("sxy") - col("sx") * col("sy"))) /
            ((col("n") * col("sxx") - col("sx") * col("sx")) *
              (col("n") * col("syy") - col("sy") * col("sy")))).as("r2"))
  }
}
