package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level profile of q283 alsPortable (r15 verdict ask #3: the
  * most expensive bench row two rounds running). Reproduces the
  * operator's stages inline and times each materialization separately:
  * ratings build+checkpoint, each half-step solve+checkpoint, scoring
  * tail. Usage: runMain graft.tools.AlsProfile <sfDir>
  */
object AlsProfile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.core.Tables
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"ALSPROF $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm the JVM on a small pass first so stage times aren't JIT
    t("warmup_sf0.001")(graft.SparkEntry.queries("q283_als_portable")(
      spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save())

    val lambda = 0.1
    def r(c: Column) = graft.functions.Funcs.r(c)
    val ratings = Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("user"), col("l_partkey").as("item"))
      .agg(count(lit(1)).cast("double").as("cnt"))
    val rt = t("ratings_checkpoint")(ratings.select(col("user").as("u"),
      col("item").as("i"), col("cnt").as("rv")).localCheckpoint(true))
    println(s"ALSPROF ratings_rows ${rt.count()}")
    def s8(c: Column) =
      sum(round(c * lit(1e8), 0).cast("decimal(38,0)")).cast("double") / lit(1e8)
    def s4(c: Column) =
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
      userF = t(s"user_solve_$it")(
        solve(rt.join(broadcast(itemF), "i"), "u").localCheckpoint(true))
      itemF = t(s"item_solve_$it")(
        solve(rt.join(broadcast(userF), "u"), "i").localCheckpoint(true))
    }
    val scoreUsers = userF.filter(pmod(col("u"), lit(20L)) === 0)
    val scored = scoreUsers.select(col("u"), col("f1").as("x1"), col("f2").as("x2"))
      .crossJoin(broadcast(
        itemF.select(col("i"), col("f1").as("y1"), col("f2").as("y2"))))
      .select(col("u"), col("i"),
        r(col("x1") * col("y1") + col("x2") * col("y2")).as("score"))
    val top = scored.groupBy(col("u"))
      .agg(graft.expr.TopKPairsExpr.column(col("score"), col("i"), 5).as("__top"))
      .select(col("u"), posexplode(col("__top")))
    t("scoring_tail")(top.write.format("noop").mode("overwrite").save())
    // and the whole operator end-to-end for reference
    t("q283_end_to_end")(graft.SparkEntry.queries("q283_als_portable")(spark, d)
      .write.format("noop").mode("overwrite").save())

    // ---- variant A: long-sum solves (micro-ints fit a long at this
    // grain: per-key sums of f*f*1e8 stay < 1e15 for < 1e7 rows/key) ----
    def s8L(c: Column) = sum(round(c * lit(1e8), 0).cast("long")).cast("double") / lit(1e8)
    def s4L(c: Column) = sum(round(c * lit(1e4), 0).cast("long")).cast("double") / lit(1e4)
    def solveL(joined: DataFrame, key: String): DataFrame = {
      val g = joined.groupBy(col(key))
        .agg(s8L(col("f1") * col("f1")).as("a11"),
          s8L(col("f1") * col("f2")).as("a12"),
          s8L(col("f2") * col("f2")).as("a22"),
          s4L(col("rv") * col("f1")).as("b1"),
          s4L(col("rv") * col("f2")).as("b2"))
      val det = (col("a11") + lit(lambda)) * (col("a22") + lit(lambda)) -
        col("a12") * col("a12")
      g.select(col(key),
        r(((col("a22") + lit(lambda)) * col("b1") - col("a12") * col("b2")) / det)
          .as("f1"),
        r(((col("a11") + lit(lambda)) * col("b2") - col("a12") * col("b1")) / det)
          .as("f2"))
    }
    var itemF2 = rt.select(col("i")).distinct()
      .select(col("i"),
        r(lit(0.1) + (col("i") % 7) / lit(10.0)).as("f1"),
        r(lit(0.1) + (col("i") % 11) / lit(10.0)).as("f2"))
      .localCheckpoint(true)
    var userF2: DataFrame = null
    for (it <- 1 to 2) {
      userF2 = t(s"L_user_solve_$it")(
        solveL(rt.join(broadcast(itemF2), "i"), "u").localCheckpoint(true))
      itemF2 = t(s"L_item_solve_$it")(
        solveL(rt.join(broadcast(userF2), "u"), "i").localCheckpoint(true))
    }
    println("ALSPROF solve_parity_diff " +
      userF2.except(userF).count() + " " + itemF2.except(itemF).count())

    // ---- decompose the scoring tail: 15M-row production vs aggregate ----
    val su2 = userF2.filter(pmod(col("u"), lit(20L)) === 0)
    val scored2 = su2.select(col("u"), col("f1").as("x1"), col("f2").as("x2"))
      .crossJoin(broadcast(
        itemF2.select(col("i"), col("f1").as("y1"), col("f2").as("y2"))))
      .select(col("u"), col("i"),
        r(col("x1") * col("y1") + col("x2") * col("y2")).as("score"))
    t("C_produce_only")(scored2.write.format("noop").mode("overwrite").save())
    val unrounded = su2.select(col("u"), col("f1").as("x1"), col("f2").as("x2"))
      .crossJoin(broadcast(
        itemF2.select(col("i"), col("f1").as("y1"), col("f2").as("y2"))))
      .select(col("u"), col("i"),
        (col("x1") * col("y1") + col("x2") * col("y2")).as("score"))
    t("C_produce_noround")(unrounded.write.format("noop").mode("overwrite").save())
    val topOnly = scored2.groupBy(col("u"))
      .agg(graft.expr.TopKPairsExpr.column(col("score"), col("i"), 5).as("__top"))
    t("C_produce_plus_agg")(topOnly.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
