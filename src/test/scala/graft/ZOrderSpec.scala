package graft

import org.apache.spark.sql.functions._
import graft.operators.ZOrder

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue matches the hand-computed Morton interleave") {
    val df = Seq((1L, 0L), (0L, 1L), (3L, 5L), (0L, 0L), (7L, 7L))
      .toDF("x", "y")
    val z = df.select(col("x"), col("y"),
        ZOrder.zValue(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(z((1L, 0L)) == 1L)  // x takes even bit positions
    assert(z((0L, 1L)) == 2L)  // y takes odd bit positions
    assert(z((0L, 0L)) == 0L)
    assert(z((3L, 5L)) == 39L) // 0b100111: x=11 interleaved with y=101
    assert(z((7L, 7L)) == 63L) // full low six bits
  }

  test("a z-bucket's bounding box is provably tight on both dimensions") {
    // bucket = z >> 16 fixes all but 8 low bits of EACH dimension, so
    // every bucket's range is < 256 in x AND y — the data-skipping
    // guarantee a lexicographic sort only gives the leading column
    val li = core.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val prof = ZOrder.zProfile(li, col("l_partkey"), col("l_suppkey"),
      bits = 21, bucketShift = 16)
      .select("x_min", "x_max", "y_min", "y_max")
      .as[(Long, Long, Long, Long)].collect()
    assert(prof.nonEmpty)
    prof.foreach { case (x0, x1, y0, y1) =>
      assert(x1 - x0 < 256 && y1 - y0 < 256)
    }
  }

  test("zOrderBy keeps all rows and sorts partitions by z") {
    val df = Seq.tabulate(100)(i => (i.toLong * 7 % 64, i.toLong * 13 % 64))
      .toDF("x", "y")
    val out = ZOrder.zOrderBy(df, col("x"), col("y"), numPartitions = 4)
    assert(out.count() == 100)
    assert(out.columns.toSeq == Seq("x", "y")) // helper column dropped
  }
}
