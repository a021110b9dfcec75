package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.io.{Sinks, SubmissionValidator}

class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def submission = Seq(
    (1, 10L, 100L, 5L), (1, 10L, 101L, 3L), (2, 10L, 100L, 0L),
    (3, 11L, 100L, 7L), (4, 11L, 101L, 2L), (5, 10L, 101L, 1L)
  ).toDF("semana", "pdv", "produto", "quantidade")

  test("csv submission round-trips through the ;-separated sink") {
    val dir = Files.createTempDirectory("graft_sub").toString + "/sub"
    val back = Sinks.csvSubmission(spark, submission, dir)
    assert(back.count() == 6)
    assert(back.columns.toSeq == Seq("semana", "pdv", "produto", "quantidade"))
    // separator really is ';': raw file has ; and no ,
    val part = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".csv")).head
    val firstLine = scala.io.Source.fromFile(part, "UTF-8").getLines().next()
    assert(firstLine == "semana;pdv;produto;quantidade")
    assert(SubmissionValidator.isValid(back))
  }

  test("validator rejects bad weeks, negatives, dupes and nulls") {
    val bad = Seq(
      (0, 10L, 100L, 5L),   // week out of range
      (1, 10L, 100L, -2L),  // negative qty
      (2, 10L, 100L, 1L), (2, 10L, 100L, 2L) // duplicate key
    ).toDF("semana", "pdv", "produto", "quantidade")
    val r = SubmissionValidator.report(bad).head()
    assert(r.getAs[Long]("bad_week_rows") == 1L)
    assert(r.getAs[Long]("negative_qty_rows") == 1L)
    assert(r.getAs[Long]("dup_rows") == 1L)
    assert(!SubmissionValidator.isValid(bad))
  }

  test("validator rejects a frame missing required columns") {
    assert(!SubmissionValidator.isValid(Seq((1, 2)).toDF("a", "b")))
  }

  test("parquet sink writes partitioned layout") {
    val dir = Files.createTempDirectory("graft_pq").toString + "/out"
    Sinks.parquet(submission, dir, partitionByCols = Seq("semana"))
    val dirs = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("semana="))
    assert(dirs.length == 5)
    assert(spark.read.parquet(dir).count() == 6)
  }
}
