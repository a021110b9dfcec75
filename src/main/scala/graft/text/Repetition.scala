package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Funcs

/** Repetition signals for pretraining-corpus quality filtering — the
  * word-n-gram family of the Gopher/MassiveText filter rules ("fraction
  * of characters in the most frequent n-gram" and "fraction of
  * characters in duplicated n-grams"). Documents dominated by a few
  * repeated phrases (templated spam, keyword stuffing, scraped
  * boilerplate) score high and get filtered before training.
  *
  * The reference engine has no text layer; this extends its
  * quality-report idiom (reference: src/utils/data_loader.py:206-246 —
  * per-column diagnostic frames) to per-document text diagnostics.
  *
  * Scale shape (100 TB): explode to (doc, gram) then ONE partial-agg
  * groupBy on (doc, gram) — map-side combine collapses within-partition
  * repeats, so the shuffle carries at most the per-partition DISTINCT
  * grams. The per-document ranking window and final rollup ride the
  * same hash partitioning prefix (doc id). Nothing is ever collected;
  * memory per task is O(distinct grams per document).
  */
object Repetition {

  /** Explode to 1-based word n-grams: one row per (id, gram) occurrence.
    * Documents shorter than `n` words produce no rows. */
  def ngrams(df: DataFrame, id: String, text: String, n: Int): DataFrame = {
    val ws = split(col(text), " ")
    val grams = when(size(ws) >= n,
      transform(sequence(lit(1), size(ws) - (n - 1)),
        i => concat_ws(" ", slice(ws, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
    df.select(col(id), length(col(text)).cast("long").as("n_chars"),
      explode(grams).as("gram"))
  }

  /** Per-document repetition metrics over word `n`-grams:
    *   - `top_gram` / `top_cnt`: the most frequent n-gram (count-desc,
    *     gram-asc tiebreak) and its occurrence count;
    *   - `top_gram_char_frac`: chars covered by the top n-gram's
    *     occurrences over total document chars;
    *   - `dup_gram_char_frac`: chars covered by ALL n-grams occurring
    *     ≥ 2 times, clipped at 1.0 (n-grams overlap for n > 1, so the
    *     raw sum can exceed the document length — the clip keeps the
    *     score a fraction; Gopher's exact overlap accounting needs
    *     positional merging that buys little for filtering).
    * Fractions are rounded via [[Funcs.r]] for oracle-stable output.
    */
  def ngramRepetition(df: DataFrame, id: String, text: String, n: Int): DataFrame = {
    val counted = ngrams(df, id, text, n)
      .groupBy(col(id), col("n_chars"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
    val byDoc = Window.partitionBy(col(id))
      .orderBy(col("cnt").desc, col("gram").asc)
    counted.withColumn("__rk", row_number().over(byDoc))
      .groupBy(col(id))
      .agg(
        max(when(col("__rk") === 1, col("gram"))).as("top_gram"),
        max(when(col("__rk") === 1, col("cnt"))).as("top_cnt"),
        Funcs.r(max(when(col("__rk") === 1, col("cnt") * length(col("gram")))) /
          first(col("n_chars")).cast("double")).as("top_gram_char_frac"),
        Funcs.r(least(lit(1.0),
          sum(when(col("cnt") >= 2, col("cnt") * length(col("gram"))).otherwise(0L)) /
            first(col("n_chars")).cast("double"))).as("dup_gram_char_frac"))
  }
}
