package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Funcs.safeDiv

/** Gopher/MassiveText-style document quality filtering: a bundle of
  * per-document rule checks (length, word shape, digit noise, n-gram
  * repetition) and the combined keep/drop decision. This is the
  * pretraining-corpus filter stage; every rule is exposed individually
  * so filter composition and per-rule loss can be audited downstream
  * (the reference's quality-report idiom, src/utils/data_loader.py:206-246,
  * at document grain).
  *
  * Scale shape: the stats rules are pure per-row projections; the
  * repetition rules come from [[Repetition.ngramRepetition]] (one
  * partial-agg shuffle on (doc, gram) + doc rollup) joined back at doc
  * grain — both sides doc-partitioned, no broadcast of anything
  * corpus-sized.
  */
object QualityFilter {

  /** Rule thresholds (fixed, documented). A document is kept when ALL
    * rules pass. Flags are ints (1 = pass) for cross-engine hashing.
    *
    * Single-scan fusion (r17): the per-row stats rules and the
    * bigram-repetition rules share ONE pass over the text column. The
    * stats flags are evaluated in the same projection that builds the
    * bigram array (so the document text is read and tokenized once,
    * not twice), ride the (doc, gram) partial aggregation as
    * constant-per-doc key columns, and the doc rollup emits flags and
    * repetition fractions together — no second fact scan, no doc-grain
    * join. Docs shorter than the gram width survive via explode_outer
    * (their NULL gram row is masked out of every repetition sum, so
    * the fractions stay NULL → coalesce(0.0), exactly the left-join
    * semantics of the unfused form). All value expressions are
    * verbatim [[Repetition.ngramRepetition]] / stats shapes — output
    * is bit-identical to the unfused composition (QualityFilterSpec
    * pins the equality). Assumes `id` is unique per document (the
    * corpus contract; the unfused form fans duplicate ids out through
    * the join instead — neither is meaningful on dup ids).
    */
  def gopherFilter(df: DataFrame, id: String, text: String,
                   minWords: Int = 10, maxWords: Int = 1000,
                   minAvgWordLen: Double = 2.0, maxAvgWordLen: Double = 12.0,
                   maxDigitRatio: Double = 0.2,
                   maxTopGramFrac: Double = 0.2,
                   maxDupGramFrac: Double = 0.4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Funcs
    val ws = TextAnalysis.tokens(col(text))
    val nWords = size(ws)
    val avgLen = safeDiv(
      aggregate(ws, lit(0L), (acc, w) => acc + length(w)).cast("double"),
      nWords.cast("double"))
    val digitRatio = safeDiv(
      (length(col(text)) - length(regexp_replace(col(text), "[0-9]", ""))).cast("double"),
      length(col(text)).cast("double"))
    // bigram array — the exact Repetition.ngrams(n = 2) expression
    val ws2 = split(col(text), " ")
    val grams = when(size(ws2) >= 2,
      transform(sequence(lit(1), size(ws2) - 1),
        i => concat_ws(" ", slice(ws2, i, lit(2)))))
      .otherwise(array().cast("array<string>"))
    // Stage the gram ARRAY as a named column so the stats expressions
    // land in the Generate's CHILD projection (evaluated once per doc).
    // Selecting stats and explode_outer in one projection puts the
    // stats Project ABOVE the Generate — the tokenizer/regex exprs
    // then re-evaluate once per gram row (measured 2.8× slower).
    val staged = df.select(col(id),
      (nWords >= minWords && nWords <= maxWords).cast("int").as("ok_words"),
      (avgLen >= minAvgWordLen && avgLen <= maxAvgWordLen).cast("int").as("ok_word_len"),
      (digitRatio < maxDigitRatio).cast("int").as("ok_digit"),
      length(col(text)).cast("long").as("__n_chars"),
      grams.as("__grams"))
    val exploded = staged.select(col(id), col("ok_words"), col("ok_word_len"),
      col("ok_digit"), col("__n_chars"), explode_outer(col("__grams")).as("gram"))
    val counted = exploded
      .groupBy(col(id), col("ok_words"), col("ok_word_len"), col("ok_digit"),
        col("__n_chars"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
    val byDoc = Window.partitionBy(col(id))
      .orderBy(col("cnt").desc, col("gram").asc)
    counted.withColumn("__rk", row_number().over(byDoc))
      .groupBy(col(id))
      .agg(
        first(col("ok_words")).as("ok_words"),
        first(col("ok_word_len")).as("ok_word_len"),
        first(col("ok_digit")).as("ok_digit"),
        Funcs.r(max(when(col("__rk") === 1 && col("gram").isNotNull,
            col("cnt") * length(col("gram")))) /
          first(col("__n_chars")).cast("double")).as("top_gram_char_frac"),
        // NULL (not 0/0) for gram-less docs: the when-guard reproduces
        // the unfused left-join NULL so coalesce(0.0) below matches
        Funcs.r(when(
          max(when(col("gram").isNotNull, lit(1)).otherwise(lit(0))) === 1,
          least(lit(1.0),
            sum(when(col("cnt") >= 2 && col("gram").isNotNull,
                col("cnt") * length(col("gram"))).otherwise(0L)) /
              first(col("__n_chars")).cast("double")))).as("dup_gram_char_frac"))
      .withColumn("ok_top2",
        (coalesce(col("top_gram_char_frac"), lit(0.0)) < maxTopGramFrac).cast("int"))
      .withColumn("ok_dup2",
        (coalesce(col("dup_gram_char_frac"), lit(0.0)) < maxDupGramFrac).cast("int"))
      .withColumn("keep",
        (col("ok_words") === 1 && col("ok_word_len") === 1 && col("ok_digit") === 1 &&
          col("ok_top2") === 1 && col("ok_dup2") === 1).cast("int"))
      .select(col(id), col("ok_words"), col("ok_word_len"), col("ok_digit"),
        col("ok_top2"), col("ok_dup2"), col("keep"))
  }
}
