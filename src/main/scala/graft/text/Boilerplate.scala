package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-frequency boilerplate removal (the CCNet / RefinedWeb
  * paragraph-frequency filter): split every document into
  * non-overlapping `w`-word spans, count each span's DOCUMENT
  * frequency across the corpus, and delete every occurrence of spans
  * appearing in at least `maxDocFreq` distinct documents — navigation
  * chrome, cookie banners, licence footers. The complement of
  * [[SpanDedup.dedupSpans]]: keep-first dedup retains ONE copy of a
  * repeated span (copied passages are content), the frequency filter
  * removes ALL copies past the threshold (content repeated across many
  * unrelated pages is template noise, and the "first" page deserves it
  * no more than the rest). Real pipelines run both — keep-first for
  * plagiarised passages, frequency scrub for boilerplate.
  *
  * Reference scope: the reference's dedup layer is row-level keep-first
  * (src/utils/data_loader.py:300-330); sub-document frequency scrubbing
  * is part of the LLM-pipeline extension surface, same as SpanDedup.
  *
  * Scale shape (100 TB): the span explode multiplies row count but not
  * corpus bytes. The census is a distinct on (doc, span) — map-side
  * combine collapses within-document repeats before the shuffle — then
  * a count per span, partially aggregated again, so a span shared by
  * millions of documents costs one row per upstream partition, never a
  * single hot reducer. The verdict joins back to occurrences as the
  * FILTERED census (only spans past the threshold — the boilerplate
  * vocabulary), so the build side is broadcast-sized in any realistic
  * corpus and the occurrence side never shuffles by span; reassembly is
  * one document-grain shuffle with a bounded per-document collect.
  * Memory per task is O(longest document). By default the census and join key is `xxhash64(span)`
  * (8-byte shuffle key instead of the span text); pass
  * `hashedKey = false` for the bit-exact string-keyed twin (what the
  * DuckDB oracle replays — identical output short of a 64-bit hash
  * collision).
  */
object Boilerplate {

  /** Document-frequency census over `w`-word spans: one row per
    * distinct span with `span_df` = number of distinct documents
    * containing it (within-document repeats count once). */
  def census(df: DataFrame, id: String, text: String, w: Int): DataFrame =
    SpanDedup.spans(df, id, text, w)
      .select(col(id), col("span")).distinct()
      .groupBy("span").agg(count(lit(1)).as("span_df"))

  /** Frequency scrub. One row per document: `n_spans` (before),
    * `n_dropped` (spans deleted as boilerplate), and `clean_text`
    * (surviving spans re-joined in original order, `""` when the whole
    * document was boilerplate). Deterministic: the census is exact and
    * the reassembly orders by the unique in-document span number. */
  def scrub(df: DataFrame, id: String, text: String, w: Int = 3,
            maxDocFreq: Int = 5, hashedKey: Boolean = true): DataFrame = {
    require(w >= 1, s"span width must be >= 1, got $w")
    require(maxDocFreq >= 2,
      s"maxDocFreq must be >= 2 (1 would delete every span), got $maxDocFreq")
    val sp = SpanDedup.spans(df, id, text, w)
    val keyed = if (hashedKey) sp.withColumn("__sk", xxhash64(col("span")))
                else sp.withColumn("__sk", col("span"))
    // r18 join shape: the occurrences only need the BOILERPLATE VERDICT
    // (span_df >= maxDocFreq ⟺ the span is in the filtered census), so
    // join the filtered verdict SET, not the full census — the build
    // side shrinks from every distinct span to the boilerplate
    // vocabulary (AQE broadcasts it at any realistic size, removing the
    // corpus-wide span-keyed exchange of the occurrence side; a
    // pathological vocabulary falls back to a shuffle join that carries
    // strictly less data than the unfiltered census did). A LEFT join
    // marks occurrences: matched ⟺ dropped — value-identical to the
    // old inner-join-the-census + threshold-per-row form
    // (BoilerplateSpec pins the pair).
    val bad = keyed.select(col(id), col("__sk")).distinct()
      .groupBy("__sk").agg(count(lit(1)).as("span_df"))
      .filter(col("span_df") >= maxDocFreq)
      .select(col("__sk"), lit(true).as("__bad"))
    keyed.join(bad, Seq("__sk"), "left")
      .groupBy(col(id))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("__bad").isNotNull, 1L).otherwise(0L)).as("n_dropped"),
        array_join(
          transform(
            array_sort(collect_list(when(col("__bad").isNull,
              struct(col("span_no"), col("span"))))),
            s => s.getField("span")),
          " ").as("clean_text"))
  }
}
