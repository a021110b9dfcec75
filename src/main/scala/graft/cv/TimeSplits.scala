package graft.cv

import java.time.LocalDate
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series cross-validation splitters M1-M4 (SURVEY §2.9;
  * reference: src/models/time_series_cv.py:42-300,
  * lightgbm_master.py:210-245) — upgraded from the reference's
  * row-position splits to DATE-based boundaries (SURVEY's sanctioned
  * semantic change): each fold is a pair of date-range filters pushed
  * down to the scan, so a fold never materializes anything.
  *
  * Boundary computation needs the dataset's min/max date — one tiny
  * 2-value aggregate collected to the driver (a deliberate, documented
  * driver action: two longs, once per CV setup, NOT per row).
  */
object TimeSplits {

  /** One fold's date boundaries (train ⊂ [trainStart, trainEnd);
    * test ⊂ [testStart, testEnd); gap = embargo between them). */
  final case class Fold(fold: Int, trainStart: LocalDate, trainEnd: LocalDate,
                        testStart: LocalDate, testEnd: LocalDate)

  /** M1 — walk-forward: initial train window, fixed horizon, fixed
    * step, optional embargo gap, expanding or sliding train window,
    * capped at maxSplits (reference defaults: 52w/4w/1w/1w/10). */
  def walkForward(minDate: LocalDate, maxDate: LocalDate,
                  initialTrainWeeks: Int = 52, horizonWeeks: Int = 4,
                  stepWeeks: Int = 1, gapWeeks: Int = 1,
                  expanding: Boolean = true, maxSplits: Int = 10): Seq[Fold] = {
    val folds = Iterator.from(0).map { i =>
      val trainEnd = minDate.plusWeeks(initialTrainWeeks + i.toLong * stepWeeks)
      val trainStart = if (expanding) minDate
                       else trainEnd.minusWeeks(initialTrainWeeks)
      val testStart = trainEnd.plusWeeks(gapWeeks)
      val testEnd = testStart.plusWeeks(horizonWeeks)
      Fold(i, trainStart, trainEnd, testStart, testEnd)
    }.takeWhile(f => !f.testEnd.isAfter(maxDate.plusDays(1))).take(maxSplits).toSeq
    folds
  }

  /** M2 — blocked CV: contiguous equal blocks, train on one block, test
    * on the next, with a purge gap (reference: time_series_cv.py:159-242). */
  def blocked(minDate: LocalDate, maxDate: LocalDate, nBlocks: Int = 5,
              gapWeeks: Int = 1): Seq[Fold] = {
    val totalDays = java.time.temporal.ChronoUnit.DAYS.between(minDate, maxDate) + 1
    val blockDays = totalDays / nBlocks
    (0 until nBlocks - 1).map { i =>
      val trainStart = minDate.plusDays(i * blockDays)
      val trainEnd = trainStart.plusDays(blockDays)
      val testStart = trainEnd.plusWeeks(gapWeeks)
      val testEnd = testStart.plusDays(blockDays)
      Fold(i, trainStart, trainEnd, testStart, testEnd)
    }.filter(f => !f.testEnd.isAfter(maxDate.plusDays(1)))
  }

  /** Materialize a fold as (train, test) filtered frames — both are
    * date-range filters the scan can prune on. */
  def split(df: DataFrame, dateCol: Column, f: Fold): (DataFrame, DataFrame) = {
    val d = to_date(dateCol)
    (df.filter(d >= lit(f.trainStart.toString) && d < lit(f.trainEnd.toString)),
     df.filter(d >= lit(f.testStart.toString) && d < lit(f.testEnd.toString)))
  }

  /** Fold table as a DataFrame (for inspection/registration). */
  def foldTable(spark: org.apache.spark.sql.SparkSession, folds: Seq[Fold]): DataFrame = {
    import spark.implicits._
    folds.map(f => (f.fold, f.trainStart.toString, f.trainEnd.toString,
      f.testStart.toString, f.testEnd.toString))
      .toDF("fold", "train_start", "train_end", "test_start", "test_end")
      .select(col("fold"), to_date(col("train_start")).as("train_start"),
        to_date(col("train_end")).as("train_end"),
        to_date(col("test_start")).as("test_start"),
        to_date(col("test_end")).as("test_end"))
  }

  /** Dataset date bounds — the one deliberate driver-side collect. */
  def dateBounds(df: DataFrame, dateCol: Column): (LocalDate, LocalDate) = {
    val r = df.agg(min(to_date(dateCol)), max(to_date(dateCol))).head()
    (r.getDate(0).toLocalDate, r.getDate(1).toLocalDate)
  }

  /** M3 — hierarchical per-segment folds: the same walk-forward spec
    * applied within each segment value (reference: time_series_cv.py:244-300).
    * Returns (segment, fold) → filters; segments come from a dim-sized
    * distinct collect. */
  def perSegment(df: DataFrame, segmentCol: Column, dateCol: Column,
                 mk: (LocalDate, LocalDate) => Seq[Fold]): Seq[(String, Seq[Fold])] = {
    val segs = df.select(segmentCol.cast("string").as("s")).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    segs.map { s =>
      val sub = df.filter(segmentCol.cast("string") === s)
      val (lo, hi) = dateBounds(sub, dateCol)
      s -> mk(lo, hi)
    }
  }

  /** [[perSegment]] flattened to one inspectable DataFrame
    * (segment, fold, train_start, train_end, test_start, test_end) —
    * the M3 registration surface (per-segment boundary arithmetic is
    * a deterministic date transform, so it carries a full oracle). */
  def perSegmentFoldTable(spark: org.apache.spark.sql.SparkSession,
                          df: DataFrame, segmentCol: Column, dateCol: Column,
                          mk: (LocalDate, LocalDate) => Seq[Fold]): DataFrame = {
    import spark.implicits._
    perSegment(df, segmentCol, dateCol, mk)
      .flatMap { case (s, fs) =>
        fs.map(f => (s, f.fold, f.trainStart.toString, f.trainEnd.toString,
          f.testStart.toString, f.testEnd.toString))
      }
      .toDF("segment", "fold", "train_start", "train_end",
        "test_start", "test_end")
      .select(col("segment"), col("fold"),
        to_date(col("train_start")).as("train_start"),
        to_date(col("train_end")).as("train_end"),
        to_date(col("test_start")).as("test_start"),
        to_date(col("test_end")).as("test_end"))
  }
}
