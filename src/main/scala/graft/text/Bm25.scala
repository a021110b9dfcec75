package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Funcs

/** BM25 ranked retrieval over a document corpus — the lexical-search
  * primitive of data pipelines (targeted corpus slicing, contamination
  * triage, retrieval-augmented labeling). Okapi BM25 with the Lucene
  * idf flavor: ln(1 + (N − df + 0.5)/(df + 0.5)).
  *
  * Scale shape: the token explode is FILTERED to the query's terms
  * before anything shuffles (query terms are literals → an `In` filter
  * inside codegen), so the (doc, term) aggregation shuffles only
  * matching postings — the corpus never shuffles whole. Document
  * lengths are a per-row projection; term df and the corpus size join
  * back BROADCAST (bounded by |query|, not the corpus). Top-k is a
  * TakeOrdered, not a global sort.
  */
object Bm25 {

  /** Score every matching document against a bag-of-words query and
    * return the top `k` by (score desc, id asc). Output:
    * (id, n_terms_matched, score). */
  def search(docs: DataFrame, idCol: String, textCol: String,
             queryTerms: Seq[String], k: Int = 20,
             k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val withDl = docs.select(col(idCol), toks.as("__toks"))
      .withColumn("__dl", size(col("__toks")).cast("double"))
    val stats = withDl.agg(
      count(lit(1)).cast("double").as("__n_docs"),
      avg(col("__dl")).as("__avgdl"))
    // postings: only query-term tokens survive the explode
    val postings = withDl
      .select(col(idCol), col("__dl"), explode(col("__toks")).as("term"))
      .filter(col("term").isInCollection(queryTerms))
    val tf = postings.groupBy(col(idCol), col("__dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dft = postings.groupBy(col("term"))
      .agg(countDistinct(col(idCol)).as("df"))
    val idf = log(lit(1.0) +
      (col("__n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val contrib = idf * (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl")))
    tf.join(broadcast(dft), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("__contrib", contrib)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_terms_matched"), Funcs.r(sum(col("__contrib"))).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }
}
