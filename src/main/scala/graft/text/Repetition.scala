package graft.text

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Per-document gram-run statistics computed INSIDE one projection
    * (r18): sort the document's gram array so equal grams are adjacent,
    * then fold the runs in one pass. Emits
    * `struct(top_gram, top_cnt, dup_chars)` — the most frequent gram
    * under the (count DESC, gram ASC) order, its count, and the chars
    * covered by grams occurring ≥ 2 times — or NULL for an empty array.
    *
    * This replaces the explode → (doc, gram) hash-agg exchange →
    * per-doc ranking window (a full sort of the exploded corpus) with
    * per-row compute: ZERO shuffles, zero Generate, memory O(grams per
    * document) — the array the projection already holds. Equivalence:
    * run lengths over the sorted array ARE the per-gram counts; walking
    * ascending and replacing the champion only on a STRICTLY greater
    * count keeps the lexicographically smallest gram on count ties —
    * exactly `row_number() OVER (ORDER BY cnt DESC, gram ASC) = 1`
    * (sort_array and the window's gram ordering are both UTF8-binary).
    * The dup sum is order-independent.
    *
    * Kept as the READABLE REFERENCE TWIN of the production kernel:
    * the hot paths ([[ngramRepetition]], `QualityFilter.gopherFilter`)
    * use [[graft.expr.WordGramRunStatsExpr]], which computes the same
    * struct from zero-copy byte spans without materializing the gram
    * array; RepetitionKernelSpec pins the two against each other and
    * against the original explode → aggregate → window form. */
  private[text] val GramStatsType = "struct<top_gram:string,top_cnt:bigint,dup_chars:bigint>"
  def gramRunStats(grams: Column): Column = {
    def champion(st: Column): (Column, Column) = (
      when(st.getField("run") > st.getField("best_cnt"), st.getField("prev"))
        .otherwise(st.getField("best_gram")),
      when(st.getField("run") > st.getField("best_cnt"), st.getField("run"))
        .otherwise(st.getField("best_cnt")))
    def dupAcc(st: Column): Column =
      st.getField("dup_chars") + when(st.getField("run") >= 2,
        st.getField("run") * length(st.getField("prev")).cast("long")).otherwise(lit(0L))
    aggregate(sort_array(grams),
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(null).cast("string").as("best_gram"), lit(0L).as("best_cnt"),
        lit(0L).as("dup_chars")),
      (st, g) => when(st.getField("prev").isNull,
        struct(g.as("prev"), lit(1L).as("run"),
          lit(null).cast("string").as("best_gram"), lit(0L).as("best_cnt"),
          lit(0L).as("dup_chars")))
        .when(g === st.getField("prev"),
          struct(g.as("prev"), (st.getField("run") + 1L).as("run"),
            st.getField("best_gram").as("best_gram"),
            st.getField("best_cnt").as("best_cnt"),
            st.getField("dup_chars").as("dup_chars")))
        .otherwise {
          // run boundary: fold the finished run into champion + dup sum
          val (bg, bc) = champion(st)
          struct(g.as("prev"), lit(1L).as("run"), bg.as("best_gram"),
            bc.as("best_cnt"), dupAcc(st).as("dup_chars"))
        },
      st => when(st.getField("prev").isNull, lit(null).cast(GramStatsType))
        .otherwise {
          val (bg, bc) = champion(st)
          struct(bg.as("top_gram"), bc.as("top_cnt"), dupAcc(st).as("dup_chars"))
        })
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
    *
    * r18 execution shape: one narrow projection via
    * [[graft.expr.WordGramRunStatsExpr]] — no explode, no exchange, no
    * window (the pre-r18 form shuffled and sorted the exploded
    * (doc, gram) corpus), and no gram-array materialization either:
    * because `concat_ws(" ", ...)` re-joins with the same separator
    * `split` consumed, every n-gram is a contiguous byte span of the
    * original text, so the expression works on zero-copy UTF8String
    * slices (the array-building `transform`+`slice`+`concat_ws` was
    * 2.1 s of q130's 2.5 s at sf0.1 — CurateProbe r18). Value-identical
    * by the run-fold argument on [[gramRunStats]], whose HOF form is
    * the committed reference twin (RepetitionKernelSpec pins all three
    * forms against each other). Docs shorter than `n` words still
    * produce no row (the explode-form dropped their empty arrays; here
    * an explicit word-count filter does). */
  def ngramRepetition(df: DataFrame, id: String, text: String, n: Int): DataFrame = {
    val chars = col("n_chars").cast("double")
    df.filter(size(split(col(text), " ")) >= n)
      .select(col(id), length(col(text)).cast("long").as("n_chars"),
        graft.expr.WordGramRunStatsExpr.column(col(text), n).as("__st"))
      .select(col(id),
        col("__st").getField("top_gram").as("top_gram"),
        col("__st").getField("top_cnt").as("top_cnt"),
        Funcs.r(col("__st").getField("top_cnt") *
          length(col("__st").getField("top_gram")) / chars).as("top_gram_char_frac"),
        Funcs.r(least(lit(1.0),
          col("__st").getField("dup_chars") / chars)).as("dup_gram_char_frac"))
  }
}
