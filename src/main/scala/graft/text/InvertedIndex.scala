package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inverted index construction: token → document frequency + a bounded,
  * sorted posting list — the retrieval-side companion to `Bm25` (which
  * scores against precomputed stats; this materializes the index
  * itself).
  *
  * Scale shape: tokenize → distinct (token, doc) → ONE hash aggregate
  * on token. Posting lists are capped at `maxPostings` ids BEFORE
  * aggregation via a window row_number on the (token) partition — a
  * stop-word token with a billion documents contributes a bounded list,
  * never an unbounded collect_list. The full df count is aggregated
  * separately (cheap long), so the cap never under-reports df.
  */
object InvertedIndex {

  def build(df: DataFrame, docId: String, text: String,
            maxPostings: Int = 20): DataFrame = {
    val pairs = df.select(col(docId).as("doc_id"),
      explode(split(trim(lower(col(text))), "\\s+")).as("token"))
      .distinct()
    val byDoc = Window.partitionBy(col("token")).orderBy(col("doc_id").asc)
    pairs
      .withColumn("__rn", row_number().over(byDoc))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("df"),
        // sort NUMERICALLY before stringifying ("10" < "2" lexicographic)
        array_join(transform(sort_array(collect_list(when(col("__rn") <= maxPostings,
          col("doc_id")))), _.cast("string")), ",").as("postings"))
  }
}
