package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, RangeJoin}

class AsOfRangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100.0, "a"),
    (1L, ts("2024-01-01 10:05:00"), 101.0, "b"),
    (1L, ts("2024-01-01 10:10:00"), 102.0, "c"),
    (2L, ts("2024-01-01 10:07:00"), 55.0, "d")
  ).toDF("key", "qts", "px", "tag")

  private val trades = Seq(
    (1L, ts("2024-01-01 10:03:00"), 1),  // after 10:00 quote
    (1L, ts("2024-01-01 10:05:00"), 2),  // exactly at 10:05
    (1L, ts("2024-01-01 10:20:00"), 3),  // after all
    (2L, ts("2024-01-01 10:00:00"), 4),  // before any quote of key 2
    (3L, ts("2024-01-01 10:00:00"), 5)   // key with no quotes
  ).toDF("key", "tts", "trade_id")

  test("asOf inclusive picks the latest quote at-or-before each trade") {
    val out = AsOfJoin.asOf(trades, quotes, Seq("key"), "tts", "qts", Seq("px", "tag"))
      .select(col("trade_id"), col("asof_px"), col("asof_tag"))
      .as[(Int, Option[Double], Option[String])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1) == (Some(100.0), Some("a")))
    assert(out(2) == (Some(101.0), Some("b"))) // inclusive: equal ts matches
    assert(out(3) == (Some(102.0), Some("c")))
    assert(out(4) == (None, None))             // quote is later than trade
    assert(out(5) == (None, None))             // key absent from right
  }

  test("asOf strict excludes the equal-timestamp right row") {
    val out = AsOfJoin.asOf(trades, quotes, Seq("key"), "tts", "qts", Seq("px"),
      inclusive = false)
      .select(col("trade_id"), col("asof_px"))
      .as[(Int, Option[Double])].collect().toMap
    assert(out(2) == Some(100.0)) // 10:05 quote no longer eligible
  }

  test("asOf payload fields always come from the SAME right row (null field safe)") {
    val q = Seq((1L, ts("2024-01-01 10:00:00"), Some(100.0), "a"),
                (1L, ts("2024-01-01 10:05:00"), None: Option[Double], "b"))
      .toDF("key", "qts", "px", "tag")
    val t = Seq((1L, ts("2024-01-01 10:06:00"), 1)).toDF("key", "tts", "trade_id")
    val row = AsOfJoin.asOf(t, q, Seq("key"), "tts", "qts", Seq("px", "tag"))
      .select(col("asof_px"), col("asof_tag"))
      .as[(Option[Double], String)].head()
    // latest row (b) has null px — a per-column carry would smuggle
    // 100.0 from row a next to tag "b"
    assert(row == (None, "b"))
  }

  test("asOf forward picks the earliest quote at-or-after each trade") {
    val out = AsOfJoin.asOf(trades, quotes, Seq("key"), "tts", "qts",
      Seq("px"), forward = true)
      .select(col("trade_id"), col("asof_px"))
      .as[(Int, Option[Double])].collect().toMap
    // trade 1 @10:03 -> next quote 10:05 (101); trade 2 @10:05 -> itself
    // (inclusive); trade 3 @10:20 -> nothing later; trade 4 @10:00 ->
    // key-2 quote at 10:07
    assert(out(1) == Some(101.0) && out(2) == Some(101.0))
    assert(out(3).isEmpty && out(4) == Some(55.0) && out(5).isEmpty)
  }

  test("asOf tolerance nulls out matches farther than the bound") {
    // backward, 120s tolerance: trade @10:03 is 180s past the 10:00
    // quote -> nulled; trade @10:05 matches its equal-time quote
    val out = AsOfJoin.asOf(trades, quotes, Seq("key"), "tts", "qts",
      Seq("px"), tolerance = Some(lit(120.0)))
      .select(col("trade_id"), col("asof_px"))
      .as[(Int, Option[Double])].collect().toMap
    assert(out(1).isEmpty && out(2) == Some(101.0))
  }

  test("asOf tolerance is inclusive exactly at the bound and rounds fractional seconds to micros") {
    // trade @10:03 is EXACTLY 180s past the 10:00 quote: the bound is
    // inclusive, so tolerance=180.0 keeps the match
    val atBound = AsOfJoin.asOf(trades, quotes, Seq("key"), "tts", "qts",
      Seq("px"), tolerance = Some(lit(180.0)))
      .select(col("trade_id"), col("asof_px"))
      .as[(Int, Option[Double])].collect().toMap
    assert(atBound(1) == Some(100.0))
    // sub-second grain: right row 2 µs earlier than the left row.
    // Tolerance 1.5e-6 s must ROUND to 2 µs (keep) — a truncating cast
    // would tighten it to 1 µs and drop the match
    val r = Seq((1L, Timestamp.from(java.time.Instant.parse("2024-01-01T10:00:00.000001Z")), 9.0))
      .toDF("key", "qts", "px")
    val l = Seq((1L, Timestamp.from(java.time.Instant.parse("2024-01-01T10:00:00.000003Z")), 1))
      .toDF("key", "tts", "trade_id")
    val frac = AsOfJoin.asOf(l, r, Seq("key"), "tts", "qts", Seq("px"),
      tolerance = Some(lit(0.0000015)))
      .select(col("asof_px")).as[Option[Double]].head()
    assert(frac == Some(9.0))
  }

  test("bandedRange matches broadcastRange exactly, including boundary values") {
    val intervals = Seq((0, 0.0, 10.0), (1, 10.0, 25.0), (2, 25.0, 40.0))
      .toDF("tier", "lo", "hi")
    // values on bucket and interval boundaries
    val fact = Seq(0.0, 5.0, 9.999, 10.0, 24.999, 25.0, 39.999, 40.0, 41.0)
      .toDF("v")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("v"), col("tier")).as[(Double, Int)].collect().toSet
    val banded = pairs(RangeJoin.bandedRange(fact, col("v"), intervals, "lo", "hi", 7.0))
    val bcast = pairs(RangeJoin.broadcastRange(fact, col("v"), intervals,
      col("lo"), col("hi")))
    assert(banded == bcast)
    assert(!banded.exists(_._1 == 40.0)) // hi exclusive
    assert(banded.contains((10.0, 1)))   // lo inclusive
  }

  test("overlapJoin: parity with the naive inequality join, one row per pair") {
    // widths straddle the bucket size (50): narrow, exact-width, and
    // multi-bucket intervals, negatives, boundary touches
    val l = Seq((1L, 0.0, 5.0), (2L, 10.0, 110.0), (3L, -75.0, -25.0),
      (4L, 49.0, 51.0), (5L, 100.0, 200.0)).toDF("lid", "llo", "lhi")
    val r = Seq((10L, 5.0, 10.0), (11L, 0.0, 300.0), (12L, -30.0, 0.0),
      (13L, 50.0, 50.5), (14L, 199.0, 250.0)).toDF("rid", "rlo", "rhi")
    val got = RangeJoin.overlapJoin(l, "llo", "lhi", r, "rlo", "rhi", 50.0)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val want = l.crossJoin(r)
      .filter(col("llo") < col("rhi") && col("rlo") < col("lhi"))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got == want)
    // no duplicate emission across shared buckets (multi-bucket pairs
    // like (2,11) and (5,11) share several 50-wide buckets)
    val n = RangeJoin.overlapJoin(l, "llo", "lhi", r, "rlo", "rhi", 50.0).count()
    assert(n == want.size.toLong)
    // half-open: [0,5) does not overlap [5,10)
    assert(!got.contains((1L, 10L)))
  }

  test("overlapJoin: empty/NULL intervals match nothing; name clash guarded") {
    val l = Seq((1L, Some(5.0), Some(5.0)), (2L, None, Some(9.0)),
      (3L, Some(1.0), Some(2.0))).toDF("lid", "llo", "lhi")
    val r = Seq((10L, 0.0, 10.0)).toDF("rid", "rlo", "rhi")
    val got = RangeJoin.overlapJoin(l, "llo", "lhi", r, "rlo", "rhi", 4.0)
      .select("lid").as[Long].collect().toSeq
    assert(got == Seq(3L)) // lo==hi empty and NULL-bound rows dropped
    intercept[IllegalArgumentException] {
      RangeJoin.overlapJoin(l, "llo", "lhi",
        r.withColumnRenamed("rid", "lid"), "rlo", "rhi", 4.0)
    }
  }

  test("overlapping intervals emit one row per matching interval") {
    val intervals = Seq((0, 0.0, 20.0), (1, 10.0, 30.0)).toDF("tier", "lo", "hi")
    val fact = Seq(15.0).toDF("v")
    val out = RangeJoin.bandedRange(fact, col("v"), intervals, "lo", "hi", 8.0)
      .select("tier").as[Int].collect().toSet
    assert(out == Set(0, 1))
  }
}
