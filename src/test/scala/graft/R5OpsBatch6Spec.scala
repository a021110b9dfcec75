package graft

import org.apache.spark.sql.functions._
import graft.operators.{EventSeq, Reshape}

/** Round-5 batch-6 operators: melt/profile reshaping and
  * event-sequence analytics (transitions, paths). */
class R5OpsBatch6Spec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("melt: one row per (id, value column), values unified to double") {
    val wide = Seq((1L, 10.0, 3L), (2L, 20.0, 4L)).toDF("k", "a", "b")
    val long = Reshape.melt(wide, Seq("k"), Seq("a", "b"))
      .orderBy("k", "metric").as[(Long, String, Double)].collect().toSeq
    assert(long == Seq((1L, "a", 10.0), (1L, "b", 3.0),
      (2L, "a", 20.0), (2L, "b", 4.0)))
  }

  test("profile: nulls counted, distincts exact, mean/std from portable sums") {
    val df = Seq(Some(1.0), Some(2.0), Some(3.0), None)
      .toDF("v").withColumn("c", lit(7L))
    val out = Reshape.profile(df, Seq("v", "c"))
      .orderBy("col_name")
      .select("col_name", "n", "n_nulls", "n_distinct", "min_v", "max_v", "mean", "std")
      .as[(String, Long, Long, Long, Double, Double, Double, Option[Double])]
      .collect().toSeq
    // v: mean 2, sample std 1; c: constant 7 -> std 0
    assert(out == Seq(("c", 4L, 0L, 1L, 7.0, 7.0, 7.0, Some(0.0)),
      ("v", 3L, 1L, 3L, 1.0, 3.0, 2.0, Some(1.0))))
  }

  test("chunk: stride/overlap boundaries, short and empty docs") {
    val docs = Seq((1L, "abcdefghij"), (2L, "abc"), (3L, ""))
      .toDF("doc_id", "text")
    val out = graft.text.Chunker.chunk(docs, "doc_id", "text", size = 4, overlap = 1)
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "chunk")
      .as[(Long, Long, String)].collect().toSeq
    // stride 3: starts 1,4,7,10 -> abcd, defg, ghij, j; short doc one
    // chunk; empty doc one empty chunk (not zero rows)
    assert(out == Seq((1L, 0L, "abcd"), (1L, 1L, "defg"), (1L, 2L, "ghij"),
      (1L, 3L, "j"), (2L, 0L, "abc"), (3L, 0L, "")))
  }

  test("chunkByTokens: token windows with overlap, short docs whole") {
    val docs = Seq((1L, "a b c d e f g"), (2L, "a b"), (3L, ""))
      .toDF("doc_id", "text")
    val out = graft.text.Chunker.chunkByTokens(docs, "doc_id", "text",
      size = 4, overlap = 1)
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "chunk", "n_tokens")
      .as[(Long, Long, String, Long)].collect().toSeq
    // stride 3 over 7 tokens: [a b c d], [d e f g], [g]
    assert(out == Seq(
      (1L, 0L, "a b c d", 4L), (1L, 1L, "d e f g", 4L), (1L, 2L, "g", 1L),
      (2L, 0L, "a b", 2L), (3L, 0L, "", 1L)), out.toString)
  }

  test("meanPool: element-wise per-group means as (group, dim) rows") {
    val df = Seq((1, Seq(1.0f, 3.0f)), (1, Seq(3.0f, 5.0f)), (2, Seq(10.0f, 0.0f)))
      .toDF("g", "v")
    val out = graft.text.Chunker.meanPool(df, "g", "v")
      .orderBy("g", "dim").as[(Int, Long, Double)].collect().toSeq
    assert(out == Seq((1, 0L, 2.0), (1, 1L, 4.0), (2, 0L, 10.0), (2, 1L, 0.0)))
  }

  test("transitionMatrix: counts and row-normalized probabilities") {
    val ev = Seq(
      (1L, 1L, "a", ts(1)), (1L, 2L, "b", ts(2)), (1L, 3L, "a", ts(3)),
      (2L, 4L, "a", ts(1)), (2L, 5L, "b", ts(2)),
      (3L, 6L, "a", ts(1)), (3L, 7L, "c", ts(2)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val out = EventSeq.transitionMatrix(ev, "user_id", "event_type", "ts", "event_id")
      .orderBy("from_type", "to_type")
      .select("from_type", "to_type", "n", "p")
      .as[(String, String, Long, Double)].collect().toSeq
    // from a: ->b twice, ->c once (p .6667/.3333); from b: ->a once (p 1)
    assert(out == Seq(("a", "b", 2L, 0.6667), ("a", "c", 1L, 0.3333),
      ("b", "a", 1L, 1.0)))
  }

  test("topPaths: k-prefix only, time order kept, simultaneity broken by id") {
    val ev = Seq(
      // u1: a>b>c then a 4th event that must NOT appear in the path
      (1L, 1L, "a", ts(1)), (1L, 2L, "b", ts(2)), (1L, 3L, "c", ts(3)),
      (1L, 4L, "d", ts(4)),
      // u2: same opening path, with simultaneous first two (id order)
      (2L, 5L, "a", ts(1)), (2L, 6L, "b", ts(1)), (2L, 7L, "c", ts(2)),
      // u3: short history -> 2-step path
      (3L, 8L, "b", ts(1)), (3L, 9L, "a", ts(2)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val out = EventSeq.topPaths(ev, "user_id", "event_type", "ts", "event_id", 3)
      .orderBy(col("n_users").desc, col("path"))
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("a>b>c", 2L), ("b>a", 1L)))
  }
}
