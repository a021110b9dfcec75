package graft

import org.apache.spark.sql.functions._
import graft.functions.{Calendar, Funcs}

class CalendarFuncsSpec extends SparkSpec {
  import spark.implicits._

  private def days(ds: String*) = ds.toSeq.toDF("d").withColumn("d", to_date(col("d")))

  test("dowMon0 follows the pandas convention Mon=0..Sun=6") {
    // 2024-01-01 is a Monday
    val out = days("2024-01-01", "2024-01-06", "2024-01-07")
      .select(Funcs.dowMon0(col("d")).as("dow")).as[Int].collect()
    assert(out.toSeq == Seq(0, 5, 6))
  }

  test("is_sunday flag uses the normalized convention") {
    val flags = Calendar.calendarFlags(col("d")).toMap
    val out = days("2024-01-07", "2024-01-08")
      .select(flags("is_sunday").as("s")).as[Int].collect()
    assert(out.toSeq == Seq(1, 0))
  }

  test("week_of_month buckets by 7-day groups with floor semantics") {
    val flags = Calendar.calendarFlags(col("d")).toMap
    val out = days("2024-01-01", "2024-01-07", "2024-01-08", "2024-01-31")
      .select(flags("week_of_month").as("w")).as[Int].collect()
    assert(out.toSeq == Seq(1, 1, 2, 5))
  }

  test("holiday distance: zero on the holiday, symmetric around it") {
    val hol = Calendar.brazilianHolidays(spark, Seq(2024))
    val out = Calendar.withHolidayDistance(
      days("2024-04-21", "2024-04-30", "2024-05-01", "2024-05-03"), col("d"), hol)
      .select(col("d").cast("string"), col("is_holiday"),
        coalesce(col("days_to_holiday"), lit(-1)),
        coalesce(col("days_since_holiday"), lit(-1)))
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(out("2024-05-01") == (1, 0, 0))
    assert(out("2024-04-30") == (0, 1, 9))  // 1 day to May 1, 9 since Apr 21
    assert(out("2024-05-03")._3 == 2)       // 2 days since May 1
  }

  test("computus: Easter Sunday matches published dates; movable feasts derived") {
    // Published Gregorian Easter dates (Meeus/Jones/Butcher reference values).
    assert(Calendar.easterSunday(2000).toString == "2000-04-23")
    assert(Calendar.easterSunday(2008).toString == "2008-03-23") // earliest in range
    assert(Calendar.easterSunday(2011).toString == "2011-04-24") // latest in range
    assert(Calendar.easterSunday(2024).toString == "2024-03-31")
    val hol = Calendar.brazilianHolidays(spark, Seq(2000))
      .select(col("h_date").cast("string")).as[String].collect().toSet
    assert(hol.contains("2000-03-07"))  // Carnaval = Easter - 47d
    assert(hol.contains("2000-04-21"))  // Good Friday collides with Tiradentes
    assert(hol.contains("2000-06-22"))  // Corpus Christi = Easter + 60d
    // Collision must be deduplicated: 8 fixed + 3 movable - 1 overlap.
    assert(hol.size == 10)
  }

  test("spark.graft.exactPercentiles=false flips default percentiles to t-digest") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    def plan(d: org.apache.spark.sql.DataFrame) = d.queryExecution.optimizedPlan.toString
    assert(plan(df.agg(Funcs.pct(col("v"), 0.5))).contains("percentile("))
    spark.conf.set(Funcs.ExactPercentilesConf, "false")
    try assert(plan(df.agg(Funcs.pct(col("v"), 0.5))).contains("percentile_approx("))
    finally spark.conf.unset(Funcs.ExactPercentilesConf)
  }

  test("Jobs.configureForScale flips the percentile default and arms AQE skew handling") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    def plan(d: org.apache.spark.sql.DataFrame) = d.queryExecution.optimizedPlan.toString
    try {
      graft.app.Jobs.configureForScale(spark)
      assert(plan(df.agg(Funcs.pct(col("v"), 0.5))).contains("percentile_approx("))
      assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
    } finally {
      spark.conf.unset(Funcs.ExactPercentilesConf)
      spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    }
  }

  test("toDateCoerce nulls on failure, parses valid dates") {
    val out = Seq("2020-05-05", "garbage").toDF("s")
      .select(Calendar.toDateCoerce(col("s")).as("d")).collect()
    assert(out(0).getDate(0).toString == "2020-05-05")
    assert(out(1).isNullAt(0))
  }

  test("businessRound: half-up, floored at zero, long-typed") {
    val out = Seq(2.5, 2.4, -3.0).toDF("v")
      .select(Calendar.businessRound(col("v")).as("r")).as[Long].collect()
    assert(out.toSeq == Seq(3L, 2L, 0L))
  }

  test("clip and safeDiv behave at the edges") {
    val out = Seq((5.0, 0.0)).toDF("x", "y")
      .select(Funcs.clip(col("x"), lit(0.0), lit(3.0)).as("c"),
        Funcs.safeDiv(col("x"), col("y")).as("s")).head()
    assert(out.getDouble(0) == 3.0)
    assert(out.getDouble(1) == 5.0 / 1e-8)
  }

  test("hashBucket is deterministic and in range") {
    val b1 = Seq(1L, 2L, 3L).toDF("k").select(Funcs.hashBucket(col("k"), 16).as("b"))
      .as[Int].collect()
    val b2 = Seq(1L, 2L, 3L).toDF("k").select(Funcs.hashBucket(col("k"), 16).as("b"))
      .as[Int].collect()
    assert(b1.toSeq == b2.toSeq)
    assert(b1.forall(b => b >= 0 && b < 16))
  }
}
