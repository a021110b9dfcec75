package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.Funcs.r

/** Scratch stage-level timer for q283 (portable explicit ALS): times the
  * ratings build, factor init, each alternating half-step and the
  * scoring tail SEPARATELY so optimization effort lands on the stage
  * that actually costs. Mirrors Recommend.alsPortable stage for stage.
  * Usage: runMain graft.tools.AlsProbe [sfDir] */
object AlsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"ALSPROBE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }

    // run twice: pass 1 pays JIT, pass 2 is the warm figure
    for (pass <- 1 to 2) {
      println(s"--- pass $pass ---")
      val lambda = 0.1
      val ratings = Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("user"), col("l_partkey").as("item"))
        .agg(count(lit(1)).cast("double").as("cnt"))
      val rt = t("ratings_build")(ratings.select(col("user").cast("long").as("u"),
        col("item").cast("long").as("i"), col("cnt").cast("double").as("rv"))
        .localCheckpoint(true))
      def s8(c: org.apache.spark.sql.Column) =
        sum(round(c * lit(1e8), 0).cast("decimal(38,0)")).cast("double") / lit(1e8)
      def s4(c: org.apache.spark.sql.Column) =
        sum(round(c * lit(1e4), 0).cast("decimal(38,0)")).cast("double") / lit(1e4)
      def solve(joined: DataFrame, key: String): DataFrame = {
        val g = joined.groupBy(col(key))
          .agg(s8(col("f1") * col("f1")).as("a11"),
            s8(col("f1") * col("f2")).as("a12"),
            s8(col("f2") * col("f2")).as("a22"),
            s4(col("rv") * col("f1")).as("b1"),
            s4(col("rv") * col("f2")).as("b2"))
        val det = (col("a11") + lit(lambda)) * (col("a22") + lit(lambda)) -
          col("a12") * col("a12")
        g.select(col(key),
          r(((col("a22") + lit(lambda)) * col("b1") - col("a12") * col("b2")) / det)
            .as("f1"),
          r(((col("a11") + lit(lambda)) * col("b2") - col("a12") * col("b1")) / det)
            .as("f2"))
      }
      var itemF = t("item_init")(rt.select(col("i")).distinct()
        .select(col("i"),
          r(lit(0.1) + (col("i") % 7) / lit(10.0)).as("f1"),
          r(lit(0.1) + (col("i") % 11) / lit(10.0)).as("f2"))
        .localCheckpoint(true))
      var userF: DataFrame = null
      for (it <- 1 to 2) {
        userF = t(s"half_user_$it")(
          solve(rt.join(broadcast(itemF), "i"), "u").localCheckpoint(true))
        itemF = t(s"half_item_$it")(
          solve(rt.join(broadcast(userF), "u"), "i").localCheckpoint(true))
      }
      val scoreUsers = userF.filter(pmod(col("u"), lit(20L)) === 0)
      val scored = scoreUsers.select(col("u"), col("f1").as("x1"), col("f2").as("x2"))
        .crossJoin(broadcast(
          itemF.select(col("i"), col("f1").as("y1"), col("f2").as("y2"))))
        .select(col("u"), col("i"),
          r(col("x1") * col("y1") + col("x2") * col("y2")).as("score"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("u")).orderBy(col("score").desc, col("i").asc)
      val topk = scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
      if (pass == 2) println(topk.queryExecution.executedPlan.toString.take(4000))
      t("score_topk") {
        topk.write.mode("overwrite").format("noop").save()
      }
      // variant A: generation-only (no window) — isolates the 15M-row
      // cross-product + rounded-dot cost from the top-k machinery
      t("score_gen_only") {
        scored.write.mode("overwrite").format("noop").save()
      }
      // variant B: unrounded score generation — isolates the per-row
      // BigDecimal cost of the 4dp rounding at 15M rows
      t("score_gen_unrounded") {
        scoreUsers.select(col("u"), col("f1").as("x1"), col("f2").as("x2"))
          .crossJoin(broadcast(
            itemF.select(col("i"), col("f1").as("y1"), col("f2").as("y2"))))
          .select(col("u"), col("i"),
            (col("x1") * col("y1") + col("x2") * col("y2")).as("score"))
          .write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
