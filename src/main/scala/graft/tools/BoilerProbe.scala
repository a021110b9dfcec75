package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage decomposition for q312 (corpus-frequency boilerplate
  * scrub, string-keyed oracle twin) — time the span explode, the
  * census, the verdict join and the full scrub in isolation (noop
  * sink, warm best-of-3) so the dominant stage is measured, not
  * guessed (guide §1). Usage: runMain graft.tools.BoilerProbe <sfDir> */
object BoilerProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"BOILERPROBE $name%-16s ${ts.map(x => f"$x%.2f").mkString(" ")} min=${ts.min}%.2f")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    t("docs_scan")(docs)
    def sp = graft.text.SpanDedup.spans(docs, "doc_id", "text", 3)
    t("spans")(sp)
    def cen = sp.select(col("doc_id"), col("span")).distinct()
      .groupBy("span").agg(count(lit(1)).as("span_df"))
    t("census")(cen)
    t("join_only")(sp.join(cen, "span"))
    t("full_q312")(graft.text.Boilerplate.scrub(docs, "doc_id", "text",
      w = 3, maxDocFreq = 5, hashedKey = false))
    t("full_hashed")(graft.text.Boilerplate.scrub(docs, "doc_id", "text",
      w = 3, maxDocFreq = 5, hashedKey = true))
    // shingle-build stage of the LSH/Jaccard family (q64/q65/q146):
    // is the transform+slice+concat_ws gram build a material slice of
    // those rows, or is the prefix-filter join the whole cost?
    t("shingles")(graft.text.Dedup.shingles(docs, "doc_id", "text", 3))
    t("full_q64")(graft.text.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.8))
    t("full_q65")(graft.text.Dedup.minHashCandidates(docs, "doc_id", "text"))
    spark.stop()
  }
}
