package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking for retrieval pipelines: split each document into
  * fixed-size character windows with overlap (chunk i starts at
  * i·stride, stride = size − overlap) — the standard RAG indexing
  * prep, and the chunk-grain companion to the span-level dedup family.
  *
  * Pure per-row explode (rows multiply by ⌈len/stride⌉, bytes stay
  * ~len·size/stride) — no shuffle, fully codegen'd, embarrassingly
  * parallel at any scale.
  */
object Chunker {

  def chunk(df: DataFrame, idCol: String, textCol: String,
            size: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < size, s"need 0 <= overlap < size")
    val stride = size - overlap
    // greatest(len,1) keeps an empty document as one empty chunk instead
    // of a truncating-vs-floor division divergence on (len-1)/stride
    val nMinus1 = floor((greatest(length(col(textCol)), lit(1)) - 1)
      / lit(stride)).cast("long")
    df.select(col(idCol), col(textCol),
      posexplode(sequence(lit(0L), nMinus1)))
      .select(col(idCol), col("col").as("chunk_id"),
        substring(col(textCol), (col("col") * stride + 1).cast("int"), lit(size))
          .as("chunk"))
      .withColumn("chunk_chars", length(col("chunk")).cast("long"))
  }

  /** Token-aware chunking: windows of `size` whitespace tokens with
    * `overlap` tokens shared between consecutive chunks — the variant a
    * token-budgeted RAG context needs (character windows split words
    * and mis-count budget). Same per-row explode shape as [[chunk]]:
    * one split, slices of the token array, no shuffle. */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
                    size: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < size, s"need 0 <= overlap < size")
    val stride = size - overlap
    val toks = split(trim(col(textCol)), "\\s+")
    // Stage the token array BELOW the generate: aliasing a computed
    // column in the same select as posexplode plans that expression in
    // a Project ABOVE the Generate, re-running the split once per chunk
    // row instead of once per document (the QualityFilter.gopherFilter
    // staging note — same analyzer behavior).
    val nMinus1 = floor((greatest(size_(col("__toks")), lit(1)) - 1)
      / lit(stride)).cast("long")
    df.select(col(idCol), toks.as("__toks"))
      .select(col(idCol), col("__toks"),
        posexplode(sequence(lit(0L), nMinus1)))
      .select(col(idCol), col("col").as("chunk_id"),
        slice(col("__toks"), (col("col") * stride + 1).cast("int"), lit(size)).as("__ctoks"))
      .select(col(idCol), col("chunk_id"),
        array_join(col("__ctoks"), " ").as("chunk"),
        org.apache.spark.sql.functions.size(col("__ctoks")).cast("long").as("n_tokens"))
  }

  private def size_(c: Column): Column = org.apache.spark.sql.functions.size(c)

  /** Element-wise mean pooling of an embedding column per group, as
    * (group, dim, mean) rows: one explode + one (group, dim)
    * hash-aggregate — dims are data-parallel, no vector assembly. */
  def meanPool(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.select(col(groupCol), posexplode(col(vecCol)))
      .groupBy(col(groupCol), col("pos").cast("long").as("dim"))
      .agg(graft.functions.Funcs.r(avg(col("col").cast("double"))).as("mean_v"))
}
