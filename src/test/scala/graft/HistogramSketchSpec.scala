package graft

import org.apache.spark.sql.functions._
import graft.operators.SketchRollup

class HistogramSketchSpec extends SparkSpec {
  import spark.implicits._

  private val Lo = 0.0
  private val Hi = 100.0
  private val Bins = 20
  private val Width = (Hi - Lo) / Bins

  /** 2 keys × 4 periods × 300 rows, values spread over [−10, 110) so
    * the edge bins exercise clipping; `i` is a row id for disjoint
    * base/delta splits. */
  private def ledger = (0 until 2).flatMap { g =>
    (0 until 4).flatMap { p =>
      (0 until 300).map { i =>
        val v = ((i * 37 + p * 11 + g * 5) % 120) - 10
        (g.toLong, p.toLong, i.toLong, v.toDouble)
      }
    }
  }.toDF("g", "period", "i", "v")

  test("merge-then-estimate equals estimate-of-recompute bit for bit") {
    val df = ledger
    val qs = Seq(0.5, 0.9, 0.99)
    val viaMerge = SketchRollup.quantilesFromHistograms(
      SketchRollup.histogramSketchTable(df, Seq("g"), col("period"),
        col("v"), Lo, Hi, Bins),
      Seq("g"), qs, Lo, Hi, Bins)
      .as[(Long, Double, Double, Long)].collect().toSet
    val direct = SketchRollup.quantilesFromHistograms(
      SketchRollup.histogramSketchTable(df, Seq("g"), lit("all"),
        col("v"), Lo, Hi, Bins),
      Seq("g"), qs, Lo, Hi, Bins)
      .as[(Long, Double, Double, Long)].collect().toSet
    assert(viaMerge == direct)
    assert(viaMerge.size == 2 * qs.size)
  }

  test("incremental mergeHistograms is equivalent to full recompute") {
    val df = ledger
    def sk(part: org.apache.spark.sql.DataFrame) =
      SketchRollup.histogramSketchTable(part, Seq("g"), col("period"),
        col("v"), Lo, Hi, Bins)
    val merged = SketchRollup.mergeHistograms(
      sk(df.filter(col("i") < 150)), sk(df.filter(col("i") >= 150)), Seq("g"))
      .as[(Long, Long, Seq[Long])].collect()
      .map { case (g, p, h) => ((g, p), h) }.toMap
    val full = sk(df)
      .as[(Long, Long, Seq[Long])].collect()
      .map { case (g, p, h) => ((g, p), h) }.toMap
    assert(merged == full)
    assert(full.values.forall(_.length == Bins))
  }

  test("quantile estimate lands within one bin width of the exact percentile") {
    // in-range data only (no clipping distortion): uniform 0..99
    val df = (0 until 2).flatMap { g =>
      (0 until 1200).map(i => (g.toLong, (i % 4).toLong, ((i * 53) % 100).toDouble))
    }.toDF("g", "period", "v")
    val est = SketchRollup.quantilesFromHistograms(
      SketchRollup.histogramSketchTable(df, Seq("g"), col("period"),
        col("v"), Lo, Hi, Bins),
      Seq("g"), Seq(0.5, 0.9), Lo, Hi, Bins)
      .as[(Long, Double, Double, Long)].collect()
    val exact = df.groupBy("g")
      .agg(expr("percentile(v, array(0.5, 0.9))").as("p"))
      .as[(Long, Seq[Double])].collect().toMap
    assert(est.length == 4)
    est.foreach { case (g, q, e, n) =>
      assert(n == 1200L)
      val ex = if (q == 0.5) exact(g)(0) else exact(g)(1)
      assert(math.abs(e - ex) <= Width,
        s"g=$g q=$q est=$e exact=$ex width=$Width")
    }
  }

  test("out-of-range values clip to the edge bins; NULLs are not counted") {
    val df = Seq[(Long, java.lang.Double)]((1L, -5.0), (1L, 0.0), (1L, 99.0),
      (1L, 100.0), (1L, 150.0), (1L, null))
      .toDF("g", "v")
    val h = SketchRollup.histogramSketchTable(df, Seq("g"), lit("all"),
      col("v"), Lo, Hi, bins = 10)
      .as[(Long, String, Seq[Long])].collect()
    assert(h.length == 1)
    val hist = h.head._3
    assert(hist.length == 10)
    assert(hist.head == 2L) // −5 and 0 in bin 0
    assert(hist.last == 3L) // 99, 100 (clip), 150 (clip) in bin 9
    assert(hist.sum == 5L)  // the NULL row is not counted
  }
}
