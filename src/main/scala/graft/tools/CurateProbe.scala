package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage decomposition for q138 (curateCorpus): time each
  * pipeline stage in isolation (noop sink, warm best-of-3) so the
  * dominant stage is measured, not guessed (guide §1.1/§1.4).
  * Usage: runMain graft.tools.CurateProbe <sfDir> */
object CurateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.text.{CorpusMix, Dedup, QualityFilter, SequencePack}

    def t(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"CURATE $name%-22s ${ts.map(x => f"$x%.2f").mkString(" ")} min=${ts.min}%.2f")
    }

    val docs = graft.core.Tables.documents(spark, sfDir)
    val weights = Map("web" -> 0.5, "books" -> 0.3, "code" -> 0.2)

    t("docs_scan")(docs)
    // --- sub-expression profile of the gopher projection ---
    locally {
      import graft.functions.Funcs.safeDiv
      val ws = graft.text.TextAnalysis.tokens(col("text"))
      val nWords = size(ws)
      val avgLen = safeDiv(
        aggregate(ws, lit(0L), (acc, w) => acc + length(w)).cast("double"),
        nWords.cast("double"))
      val digitRatio = safeDiv(
        (length(col("text")) - length(regexp_replace(col("text"), "[0-9]", ""))).cast("double"),
        length(col("text")).cast("double"))
      val ws2 = split(col("text"), " ")
      val grams = when(size(ws2) >= 2,
        transform(sequence(lit(1), size(ws2) - 1),
          i => concat_ws(" ", slice(ws2, i, lit(2)))))
        .otherwise(array().cast("array<string>"))
      t("p_tokens_nwords")(docs.select(nWords.as("x")))
      t("p_avglen_fold")(docs.select(avgLen.as("x")))
      t("p_digit_regex")(docs.select(digitRatio.as("x")))
      t("p_grams_build")(docs.select(
        aggregate(grams, lit(0L), (a, g) => a + length(g)).as("x")))
      t("p_grams_sorted")(docs.select(
        aggregate(sort_array(grams), lit(0L), (a, g) => a + length(g)).as("x")))
      t("p_gram_run_fold")(docs.select(
        graft.text.Repetition.gramRunStats(grams).as("x")))
    }
    t("gopher_stats")(QualityFilter.gopherFilter(docs, "doc_id", "text"))
    def keepIds = QualityFilter.gopherFilter(docs, "doc_id", "text")
      .filter(col("keep") === 1).select(col("doc_id"))
    t("keep_ids")(keepIds.toDF())
    def kept = docs.join(keepIds, Seq("doc_id"))
    t("dedup")(Dedup.exactDedup(kept, "text", Seq(col("doc_id"))))
    def dedupNoCkpt = Dedup.exactDedup(kept, "text", Seq(col("doc_id")))
    t("mix")(CorpusMix.mixToTarget(dedupNoCkpt, "doc_id", "source", weights, 0.5))
    t("pack")(SequencePack.bins(
      CorpusMix.mixToTarget(dedupNoCkpt, "doc_id", "source", weights, 0.5),
      "source", "doc_id", "text", 256))
    t("full_q138")(graft.app.Jobs.curateCorpus(spark, sfDir, weights, 0.5, 256))
    spark.stop()
  }
}
