package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch stage decomposition for q272_validation: times the pipeline
  * prefixes (weekly aggregate / +lag pred / +q99 window / full check
  * suite) so the expensive segment is measured, not guessed.
  * Usage: runMain graft.tools.ValidationProbe <sfDir> */
object ValidationProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.Funcs.{pct, r}

    def li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def weekly = graft.etl.Enrichment.weeklyAggregate(li, col("l_shipdate"),
      Seq(col("l_suppkey")), col("l_quantity"))
    val w = Window.partitionBy(col("l_suppkey")).orderBy(col("week_start"))
    val wAll = Window.partitionBy(col("l_suppkey"))
    def withPred = weekly.withColumn("pred", r(lag(col("qty_sum"), 1).over(w)))
      .filter(col("pred").isNotNull)
    def time(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name ${ts.map(t => f"$t%.2f").mkString(" ")} min=${ts.min}%.2f")
    }
    time("1_weekly")(weekly)
    time("2_weekly_pred")(withPred)
    time("3_pred_lag_resid") {
      withPred.withColumn("__r", r(col("qty_sum") - col("pred")))
        .withColumn("__rprev", lag(col("__r"), 1).over(w))
    }
    time("4_plus_q99_window") {
      withPred.withColumn("__r", r(col("qty_sum") - col("pred")))
        .withColumn("__rprev", lag(col("__r"), 1).over(w))
        .withColumn("__q99", r(pct(col("qty_sum"), 0.99, None).over(wAll)))
    }
    time("5_full_q272") {
      graft.metrics.Validation.validateModel(withPred, Seq("l_suppkey"),
        col("qty_sum"), col("pred"), Seq(col("week_start")))
    }
    // isolate the wide aggregate: same prefix as probe 4, then the
    // micro-int sufficient-statistic groupBy WITHOUT the check explode
    import graft.functions.Funcs.{Eps, microSum, microSumSq}
    def microSumP(c: org.apache.spark.sql.Column, scale: Double) =
      sum(graft.expr.RoundHalfUpExpr.column(c * lit(scale)).cast("decimal(38,0)")).cast("double") / lit(scale)
    def lagged = withPred
      .select(col("l_suppkey"), r(col("qty_sum")).as("__a"), r(col("pred")).as("__p"),
        col("week_start").as("__o0"))
      .withColumn("__r", r(col("__a") - col("__p")))
      .withColumn("__rprev", lag(col("__r"), 1).over(
        Window.partitionBy(col("l_suppkey")).orderBy(col("__o0"))))
      .withColumn("__q99", r(pct(col("__a"), 0.99, None).over(wAll)))
    time("6_agg_only") {
      lagged.groupBy(col("l_suppkey")).agg(
        count(lit(1)).as("n"),
        microSum(abs(col("__a") - col("__p"))).as("__sad"),
        microSum(abs(col("__a"))).as("__saa"),
        microSum(r(abs(col("__a") - col("__p")) / (abs(col("__a")) + lit(Eps)))).as("__mapesum"),
        sum(when(col("__a") =!= 0, 1L).otherwise(0L)).as("__nb"),
        microSum(when(col("__a") =!= 0,
          r((col("__p") - col("__a")) / col("__a"))).otherwise(lit(null))).as("__biassum"),
        microSum(col("__r")).as("__s1"),
        microSumSq(col("__r")).as("__s2"),
        microSumP(col("__r") * col("__r") * col("__r"), 1e12).as("__s3"),
        microSumP(col("__r") * col("__r") * col("__r") * col("__r"), 1e12).as("__s4"),
        sum(when(col("__rprev").isNotNull, 1L).otherwise(0L)).as("__np"),
        microSum(when(col("__rprev").isNotNull, col("__r")).otherwise(lit(null))).as("__spx"),
        microSum(col("__rprev")).as("__spy"),
        (sum(when(col("__rprev").isNotNull,
          graft.expr.RoundHalfUpExpr.column(col("__r") * lit(1e4)).cast("decimal(38,0)") *
            graft.expr.RoundHalfUpExpr.column(col("__rprev") * lit(1e4)).cast("decimal(38,0)"))
          .otherwise(lit(null))).cast("double") / lit(1e8)).as("__spxy"),
        microSumSq(when(col("__rprev").isNotNull, col("__r")).otherwise(lit(null))).as("__spxx"),
        microSumSq(col("__rprev")).as("__spyy"),
        sum(when(col("__p") < 0, 1L).otherwise(0L)).as("__nneg"),
        sum(when(col("__p") > lit(3.0) * col("__q99"), 1L).otherwise(0L)).as("__next"),
        sum(when(col("__a").isNull, 1L).otherwise(0L)).as("__missa"),
        sum(when(col("__p").isNull, 1L).otherwise(0L)).as("__missp"),
        microSum(col("__p")).as("__sp"),
        microSumSq(col("__p")).as("__spp"))
    }
    time("7_agg_counts_only") {
      lagged.groupBy(col("l_suppkey")).agg(
        count(lit(1)).as("n"),
        sum(when(col("__a") =!= 0, 1L).otherwise(0L)).as("__nb"),
        sum(when(col("__rprev").isNotNull, 1L).otherwise(0L)).as("__np"),
        sum(when(col("__p") < 0, 1L).otherwise(0L)).as("__nneg"),
        sum(when(col("__p") > lit(3.0) * col("__q99"), 1L).otherwise(0L)).as("__next"))
    }
    // guarded-long prototype: sum(long) + n·max|v| < 2^62 exactness bound
    def lsum(c: org.apache.spark.sql.Column, scale: Double) = {
      val v = graft.expr.RoundHalfUpExpr.column(c * lit(scale))
      val l = when(isnan(v), lit(null)).otherwise(v).cast("long")
      struct(sum(l).as("s"), max(abs(l)).as("g"), count(l).as("n"))
    }
    def lval(st: org.apache.spark.sql.Column, scale: Double) =
      when(st("g").isNull, lit(null).cast("double"))
        .when(st("n").cast("double") * st("g").cast("double") < lit(4.0e18),
          st("s").cast("double") / lit(scale))
        .otherwise(lit(Double.NaN))
    time("8_agg_guarded_long") {
      val g = lagged.groupBy(col("l_suppkey")).agg(
        count(lit(1)).as("n"),
        lsum(abs(col("__a") - col("__p")), 1e4).as("__sad"),
        lsum(abs(col("__a")), 1e4).as("__saa"),
        lsum(r(abs(col("__a") - col("__p")) / (abs(col("__a")) + lit(Eps))), 1e4).as("__mapesum"),
        sum(when(col("__a") =!= 0, 1L).otherwise(0L)).as("__nb"),
        lsum(when(col("__a") =!= 0,
          r((col("__p") - col("__a")) / col("__a"))).otherwise(lit(null)), 1e4).as("__biassum"),
        lsum(col("__r"), 1e4).as("__s1"),
        lsum(col("__r") * col("__r"), 1e8).as("__s2"),
        lsum(col("__r") * col("__r") * col("__r"), 1e12).as("__s3"),
        lsum(col("__r") * col("__r") * col("__r") * col("__r"), 1e12).as("__s4"),
        sum(when(col("__rprev").isNotNull, 1L).otherwise(0L)).as("__np"),
        lsum(when(col("__rprev").isNotNull, col("__r")).otherwise(lit(null)), 1e4).as("__spx"),
        lsum(col("__rprev"), 1e4).as("__spy"),
        struct(sum(graft.expr.RoundHalfUpExpr.column(col("__r") * lit(1e4)).cast("long") *
          graft.expr.RoundHalfUpExpr.column(col("__rprev") * lit(1e4)).cast("long")).as("s"),
          max(abs(graft.expr.RoundHalfUpExpr.column(col("__r") * lit(1e4)).cast("long"))).as("g"),
          count(col("__rprev")).as("n")).as("__spxy"),
        lsum(when(col("__rprev").isNotNull, col("__r") * col("__r")).otherwise(lit(null)), 1e8).as("__spxx"),
        lsum(col("__rprev") * col("__rprev"), 1e8).as("__spyy"),
        sum(when(col("__p") < 0, 1L).otherwise(0L)).as("__nneg"),
        sum(when(col("__p") > lit(3.0) * col("__q99"), 1L).otherwise(0L)).as("__next"),
        sum(when(col("__a").isNull, 1L).otherwise(0L)).as("__missa"),
        sum(when(col("__p").isNull, 1L).otherwise(0L)).as("__missp"),
        lsum(col("__p"), 1e4).as("__sp"),
        lsum(col("__p") * col("__p"), 1e8).as("__spp"))
      g.select(col("l_suppkey"), col("n"),
        lval(col("__sad"), 1e4), lval(col("__saa"), 1e4), lval(col("__mapesum"), 1e4),
        col("__nb"), lval(col("__biassum"), 1e4), lval(col("__s1"), 1e4),
        lval(col("__s2"), 1e8), lval(col("__s3"), 1e12), lval(col("__s4"), 1e12),
        col("__np"), lval(col("__spx"), 1e4), lval(col("__spy"), 1e4),
        lval(col("__spxy"), 1e8), lval(col("__spxx"), 1e8), lval(col("__spyy"), 1e8),
        col("__nneg"), col("__next"), col("__missa"), col("__missp"),
        lval(col("__sp"), 1e4), lval(col("__spp"), 1e8))
    }
    spark.stop()
  }
}
