package graft

import graft.text.TfIdf

class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark spark shuffle"),
    (2L, "spark join"),
    (3L, "window window window join")
  ).toDF("doc_id", "text")

  test("tf and df counts are exact") {
    val rows = TfIdf.topTerms(docs, "doc_id", "text", 10)
      .select("doc_id", "term", "tf", "df").as[(Long, String, Long, Long)]
      .collect().map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(rows((1L, "spark")) == (2L, 2L))   // tf 2 in doc 1, df 2 corpus-wide
    assert(rows((3L, "window")) == (3L, 1L))
    assert(rows((2L, "join")) == (1L, 2L))
  }

  test("rare repeated terms outrank common terms within a doc") {
    val top1 = TfIdf.topTerms(docs, "doc_id", "text", 1)
      .select("doc_id", "term").as[(Long, String)].collect().toMap
    assert(top1(1L) == "shuffle" || top1(1L) == "spark") // shuffle: tf1·idf(1) vs spark: tf2·idf(2)
    assert(top1(3L) == "window")
    // verify doc1 numerically: idf = ln((3+1)/(df+1))
    val shuffleScore = 1 * math.log(4.0 / 2.0)
    val sparkScore = 2 * math.log(4.0 / 3.0)
    val expected = if (shuffleScore > sparkScore) "shuffle" else "spark"
    assert(top1(1L) == expected)
  }

  test("redact masks every match; extractLong pulls the capture or null") {
    import org.apache.spark.sql.functions.col
    import graft.text.TextAnalysis
    val rows = Seq("""{"k": 42, "u": 7}""", "no digits here")
      .toDF("props")
      .select(
        TextAnalysis.redact(col("props"), "\\d+").as("red"),
        TextAnalysis.extractLong(col("props"), "\"k\":\\s*(\\d+)").as("k"))
      .as[(String, Option[Long])].collect()
    assert(rows(0) == ("""{"k": #, "u": #}""", Some(42L)))
    assert(rows(1) == ("no digits here", None))
  }

  test("k bounds output per doc; rank is 1-based contiguous") {
    val g = TfIdf.topTerms(docs, "doc_id", "text", 2)
      .select("doc_id", "rank").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (d, rs) => d -> rs.map(_._2).sorted.toSeq }
    g.values.foreach(rs => assert(rs == (1L to rs.size).toSeq && rs.size <= 2))
  }
}
