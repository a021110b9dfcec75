package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Funcs.dowMon0

/** Calendar/date feature functions D1-D8, D14 (SURVEY §2.6) as pure
  * codegen'd column expressions, plus the holiday-distance join that
  * replaces the reference's O(30)-per-row scan with a broadcast date
  * dimension (reference: src/features/business_features_engine.py:385-453).
  */
object Calendar {

  /** D1 — date parts with the pandas dow convention (Mon=0..Sun=6)
    * (reference: temporal_features_engine.py:77-96; SURVEY D1 flags the
    * Spark Sun=1 convention gap). */
  def dateParts(d: Column): Seq[(String, Column)] = Seq(
    "year" -> year(d),
    "month" -> month(d),
    "dom" -> dayofmonth(d),
    "dow" -> dowMon0(d),
    "doy" -> dayofyear(d),
    "quarter" -> quarter(d),
    "week_of_year" -> weekofyear(d))

  /** D2 — calendar flags (reference: temporal_features_engine.py:86-96).
    * month_start/end use the reference's day ≤ 7 / ≥ 24 buckets. */
  def calendarFlags(d: Column): Seq[(String, Column)] = Seq(
    "is_weekend" -> (dowMon0(d) >= 5).cast("int"),
    "is_sunday" -> (dowMon0(d) === 6).cast("int"),
    "is_month_start" -> (dayofmonth(d) <= 7).cast("int"),
    "is_month_end" -> (dayofmonth(d) >= 24).cast("int"),
    "week_of_month" -> (floor((dayofmonth(d) - 1) / 7) + 1).cast("int"))

  /** D3 — days since a fixed epoch (reference epoch 2022-01-01,
    * temporal_features_engine.py:98-99). */
  def daysSinceEpoch(d: Column, epoch: String = "2022-01-01"): Column =
    datediff(d, lit(epoch))

  /** D4 — cyclical sin/cos encodings of month / dow / doy
    * (reference: temporal_features_engine.py:102-107). */
  def cyclicalEncodings(d: Column): Seq[(String, Column)] = Seq(
    "month_sin" -> sin(month(d) * lit(2 * math.Pi / 12)),
    "month_cos" -> cos(month(d) * lit(2 * math.Pi / 12)),
    "dow_sin" -> sin(dowMon0(d) * lit(2 * math.Pi / 7)),
    "dow_cos" -> cos(dowMon0(d) * lit(2 * math.Pi / 7)),
    "doy_sin" -> sin(dayofyear(d) * lit(2 * math.Pi / 365)),
    "doy_cos" -> cos(dayofyear(d) * lit(2 * math.Pi / 365)))

  /** D5 — season flags, southern-hemisphere retail calendar
    * (reference: business_features_engine.py:414-453). */
  def seasonFlags(d: Column): Seq[(String, Column)] = Seq(
    "is_summer" -> month(d).isin(12, 1, 2).cast("int"),
    "is_winter" -> month(d).isin(6, 7, 8).cast("int"),
    "is_school_period" -> (!month(d).isin(1, 7, 12)).cast("int"),
    "is_payday_window" -> (dayofmonth(d) <= 5 || dayofmonth(d) >= 28).cast("int"),
    "is_black_friday_season" -> (month(d) === 11).cast("int"),
    "is_christmas_season" -> (month(d) === 12).cast("int"))

  /** D6/D7 — holiday membership + distance to nearest holiday via a
    * broadcast holiday dimension, replacing the reference's per-row
    * 30-day scan (business_features_engine.py:388-410). `holidays` is a
    * small one-column ("h_date" DateType) table; the date spine gets
    * next/prev holiday via an unpartitioned window over the SMALL
    * distinct-dates frame (dim-sized, never the fact), then joins back.
    */
  def withHolidayDistance(df: DataFrame, date: Column, holidays: DataFrame): DataFrame = {
    val spine = df.select(to_date(date).as("__d")).distinct()
      .join(broadcast(holidays.select(to_date(col("h_date")).as("__h"))
        .withColumn("__is_h", lit(1))), col("__d") === col("__h"), "left")
    val byDate = Window.orderBy(col("__d"))
    val enriched = spine
      .withColumn("is_holiday", coalesce(col("__is_h"), lit(0)))
      .withColumn("__next_h",
        first(when(col("__is_h") === 1, col("__d")), ignoreNulls = true)
          .over(byDate.rowsBetween(0, Window.unboundedFollowing)))
      .withColumn("__prev_h",
        last(when(col("__is_h") === 1, col("__d")), ignoreNulls = true)
          .over(byDate.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("days_to_holiday", datediff(col("__next_h"), col("__d")))
      .withColumn("days_since_holiday", datediff(col("__d"), col("__prev_h")))
      .select(col("__d"), col("is_holiday"), col("days_to_holiday"), col("days_since_holiday"))
    df.join(broadcast(enriched), to_date(date) === col("__d"), "left").drop("__d")
  }

  /** Easter Sunday by the anonymous Gregorian computus
    * (Meeus/Jones/Butcher) — the standard published algorithm. */
  private[graft] def easterSunday(y: Int): java.time.LocalDate = {
    val a = y % 19
    val b = y / 100; val c = y % 100
    val d = b / 4; val e = b % 4
    val f = (b + 8) / 25
    val g = (b - f + 1) / 3
    val h = (19 * a + b - d - g + 15) % 30
    val i = c / 4; val k = c % 4
    val l = (32 + 2 * e + 2 * i - h - k) % 7
    val m = (a + 11 * h + 22 * l) / 451
    val month = (h + l - 7 * m + 114) / 31
    val day = ((h + l - 7 * m + 114) % 31) + 1
    java.time.LocalDate.of(y, month, day)
  }

  /** The Brazilian national-holiday dimension for a given year range:
    * the eight fixed-date holidays plus the computus-derived movable
    * feasts — Carnaval Tuesday (Easter − 47d), Good Friday (− 2d),
    * Corpus Christi (+ 60d) — matching the reference's
    * `holidays.Brazil` lookup (business_features_engine.py:56-60).
    * Deduplicated: Good Friday can land on fixed Tiradentes (2000-04-21),
    * and a duplicate date would fan out the holiday-distance join. */
  def brazilianHolidays(spark: SparkSession, years: Seq[Int]): DataFrame = {
    import spark.implicits._
    val fixed = Seq("01-01", "04-21", "05-01", "09-07", "10-12", "11-02", "11-15", "12-25")
    val dates = years.flatMap { y =>
      val easter = easterSunday(y)
      fixed.map(md => s"$y-$md") ++
        Seq(-47L, -2L, 60L).map(off => easter.plusDays(off).toString)
    }.distinct
    dates.toDF("h_date").withColumn("h_date", to_date(col("h_date")))
  }

  /** D8 — coercing date parse: null on failure (reference
    * `to_datetime(errors='coerce')`, preprocessors.py:93-96). */
  def toDateCoerce(c: Column, fmt: String = "yyyy-MM-dd"): Column =
    try_to_timestamp(c, lit(fmt)).cast("date")

  /** D14 — integer business rounding of forecasts: round half-up,
    * clamped to ≥ 0 (reference: business_rules.py:553-690). */
  def businessRound(c: Column): Column =
    greatest(graft.expr.RoundHalfUpExpr.column(c), lit(0.0)).cast("long")
}
