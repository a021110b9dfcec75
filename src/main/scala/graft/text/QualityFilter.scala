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
    * rules pass. Flags are ints (1 = pass) for cross-engine hashing. */
  def gopherFilter(df: DataFrame, id: String, text: String,
                   minWords: Int = 10, maxWords: Int = 1000,
                   minAvgWordLen: Double = 2.0, maxAvgWordLen: Double = 12.0,
                   maxDigitRatio: Double = 0.2,
                   maxTopGramFrac: Double = 0.2,
                   maxDupGramFrac: Double = 0.4): DataFrame = {
    val ws = TextAnalysis.tokens(col(text))
    val nWords = size(ws)
    val avgLen = safeDiv(
      aggregate(ws, lit(0L), (acc, w) => acc + length(w)).cast("double"),
      nWords.cast("double"))
    val digitRatio = safeDiv(
      (length(col(text)) - length(regexp_replace(col(text), "[0-9]", ""))).cast("double"),
      length(col(text)).cast("double"))
    val rep = Repetition.ngramRepetition(df, id, text, 2)
      .select(col(id), col("top_gram_char_frac"), col("dup_gram_char_frac"))
    df.select(col(id), col(text))
      .withColumn("ok_words",
        (nWords >= minWords && nWords <= maxWords).cast("int"))
      .withColumn("ok_word_len",
        (avgLen >= minAvgWordLen && avgLen <= maxAvgWordLen).cast("int"))
      .withColumn("ok_digit", (digitRatio < maxDigitRatio).cast("int"))
      .join(rep, Seq(id), "left")
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
