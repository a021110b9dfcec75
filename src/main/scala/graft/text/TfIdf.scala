package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF term scoring over a document corpus — the classic
  * text-analysis primitive for training-data pipelines (keyword
  * extraction, near-topic filtering, corpus drift monitoring).
  *
  * Scale shape: the token explode is a narrow map; `tf` shuffles on
  * (doc, term) — the corpus grain; `df` is vocabulary-grain (≪ corpus —
  * Heaps' law) and joins back BROADCAST, as does the one-row corpus
  * count, so the fact-sized frame shuffles exactly once more for the
  * per-document top-k window. No driver-side collection anywhere.
  */
object TfIdf {

  /** Whitespace tokens of the trimmed text (shared with
    * [[TextAnalysis.tokens]] so tf/df and the stats block agree). */
  private def toks(text: Column): Column = TextAnalysis.tokens(text)

  /** Smoothed IDF: ln((N+1)/(df+1)) — strictly positive, defined for
    * terms present in every document. */
  def idf(dfCount: Column, nDocs: Column): Column =
    log((nDocs + lit(1.0)) / (dfCount + lit(1.0)))

  /** Top-k terms per document by tf·idf (score desc, term asc tiebreak).
    * Output: (idCol, term, tf, df, tfidf) with tfidf rounded via
    * [[graft.functions.Funcs.r]] BEFORE ranking so the cut is stable
    * across engines. */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val tok = docs.select(col(idCol), explode(toks(col(textCol))).as("term"))
    val tf = tok.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val df = tok.groupBy(col("term")).agg(countDistinct(col(idCol)).as("df"))
    val n = docs.agg(countDistinct(col(idCol)).as("n_docs"))
    val scored = tf
      .join(broadcast(df), "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        graft.functions.Funcs.r(col("tf") * idf(col("df"), col("n_docs"))))
    val w = Window.partitionBy(col(idCol)).orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("tfidf"),
        col("rank").cast("long").as("rank"))
  }
}
