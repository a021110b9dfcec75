package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical 10× scale probe for the JOIN-HEAVY tail (VERDICT r11 #6):
  * q21 basket co-occurrence, q283 portable ALS, q293 Fellegi–Sunter
  * linkage and q138 corpus curation, timed at sf0.1 and at a 10×
  * key-shifted copy of their inputs.
  *
  * Scaling convention (same as [[ScaleProbe]]): entity counts scale
  * 10×, per-entity depth stays fixed — the shape real 10× data volume
  * has. Concretely: order/part/supp/cust keys shift per copy, so
  * baskets ×10 with unchanged basket size (q21 pair fan-out grows
  * linearly), users and items ×10 with unchanged per-user history
  * (q283 half-step join ×10), nation blocks ×10 with unchanged block
  * size (q293 pair count ×10 — NOT 100×; with a FIXED block key a 10×
  * row count is quadratic per block, and the mitigation at real scale
  * is always a finer block key, which is what this shift models), and
  * documents ×10 with distinct texts (q138 dedup/mix/pack ×10).
  *
  * q283's scoring tail holds the QUERY-USER COUNT constant (mod 20 at
  * 1× → mod 200 at 10×, the ANN fixed-query-set convention): the
  * scoring frame then grows 10× on the item side. Training always
  * sees the full 10× ratings fact.
  *
  * Performance probe only — correctness inputs stay the driver
  * parquet; derived copies live under target/.
  *
  * Usage: runMain graft.tools.ScaleProbeTail [srcSfDir] [workDir]
  */
object ScaleProbeTail {

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val work = if (args.length > 1) args(1) else "target/scaleprobe_tail"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def copies(df: DataFrame)(shift: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until 10).map(k => shift(df, k)).reduce(_ unionByName _)

    // derived 10x tables are deterministic — build once, reuse across
    // runs (isolated leg re-pins should measure the leg, not the setup)
    def build(name: String)(mk: => DataFrame): Unit =
      if (!new java.io.File(s"$work/$name").exists())
        mk.write.mode("overwrite").parquet(s"$work/$name")

    build("lineitem.parquet") {
      copies(spark.read.parquet(s"$src/lineitem.parquet")) { (d, k) =>
        d.withColumn("l_orderkey", col("l_orderkey") + lit(k * 1000000000L))
          .withColumn("l_partkey", col("l_partkey") + lit(k * 10000000L))
          .withColumn("l_suppkey", col("l_suppkey") + lit(k * 1000000L))
      }
    }
    build("orders.parquet") {
      copies(spark.read.parquet(s"$src/orders.parquet")) { (d, k) =>
        d.withColumn("o_orderkey", col("o_orderkey") + lit(k * 1000000000L))
          .withColumn("o_custkey", col("o_custkey") + lit(k * 10000000L))
      }
    }
    build("customer.parquet") {
      copies(spark.read.parquet(s"$src/customer.parquet")) { (d, k) =>
        d.withColumn("c_custkey", col("c_custkey") + lit(k * 10000000L))
          .withColumn("c_nationkey", col("c_nationkey") + lit(k * 25L))
      }
    }
    build("events.parquet") {
      copies(spark.read.parquet(s"$src/events.parquet")) { (d, k) => // users ×10, per-user history unchanged
        d.withColumn("event_id", col("event_id") + lit(k * 1000000000L))
          .withColumn("user_id", col("user_id") + lit(k * 10000000L))
      }
    }
    build("documents.parquet") {
      copies(spark.read.parquet(s"$src/documents.parquet")) { (d, k) =>
        d.withColumn("doc_id", col("doc_id") + lit(k * 1000000000L))
          .withColumn("text", concat(lit(s"c$k "), col("text")))
      }
    }

    def run(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def cooc(dir: String): DataFrame =
      graft.operators.AggFeatures.coOccurrence(
        spark.read.parquet(s"$dir/lineitem.parquet"), Seq("l_orderkey"),
        "l_partkey", 3)

    def als(dir: String, mod: Long): DataFrame = {
      val l = spark.read.parquet(s"$dir/lineitem.parquet")
      val o = spark.read.parquet(s"$dir/orders.parquet")
      val ratings = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("user"), col("l_partkey").as("item"))
        .agg(count(lit(1)).cast("double").as("cnt"))
      graft.model.Recommend.alsPortable(ratings, "user", "item", "cnt",
        scoreUserMod = Some(mod))
    }

    def linkage(dir: String): DataFrame = {
      val c = spark.read.parquet(s"$dir/customer.parquet")
      graft.etl.RecordLinkage.fellegiSunter(c,
        col("c_custkey"), col("c_nationkey"),
        Seq(
          (col("c_mktsegment"), 0.95),
          (floor(col("c_acctbal").cast("double") / 100), 0.9),
          (col("c_name").substr(length(col("c_name")) - 1, lit(2)), 0.8)))
    }

    def asof(dir: String, native: Boolean): DataFrame = {
      val ev = spark.read.parquet(s"$dir/events.parquet")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"),
          col("value").as("click_value"))
      val f = if (native) graft.operators.AsOfJoin.asOfNative _
      else graft.operators.AsOfJoin.asOf _
      f(purchases, clicks, Seq("user_id"), "ts", "ts",
        Seq("click_id", "click_value"), true, false, None)
    }

    def orderSearch(dir: String): DataFrame = {
      val weekly = graft.etl.Enrichment.weeklyAggregate(
        spark.read.parquet(s"$dir/lineitem.parquet"), col("l_shipdate"),
        Seq(col("l_suppkey")), col("l_quantity"))
      graft.seq.OrderSearch.extendedScoreboard(weekly, Seq("l_suppkey"),
        Seq(col("week_start")), "qty_sum")
    }

    def curate(dir: String): DataFrame =
      graft.app.Jobs.curateCorpus(spark, dir,
        Map("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2,
          "src3" -> 0.05, "src4" -> 0.05),
        targetFraction = 0.5, budget = 256)

    // warm pass at 1x (codegen/JIT), then one measured pass per scale
    def probe(name: String, q: String => DataFrame): (String, Double, Double) = {
      run(q(src))
      val t0 = System.nanoTime(); run(q(src))
      val s1 = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); run(q(work))
      val s10 = (System.nanoTime() - t1) / 1e9
      (name, s1, s10)
    }

    // optional third arg: comma-separated leg names — isolate one leg
    // in its own JVM for the three-measurement re-pin discipline
    val only: Set[String] =
      if (args.length > 2) args(2).split(",").toSet else Set.empty
    def wanted(n: String) = only.isEmpty || only(n)
    val rows = Seq(
      ("q304_asof_exec", () => probe("q304_asof_exec", d => asof(d, native = true))),
      ("q118_asof_union", () => probe("q118_asof_union", d => asof(d, native = false))),
      ("q299_order_search", () => probe("q299_order_search", orderSearch)), // 14 member fits, 10x series
      ("q21_cooccurrence", () => probe("q21_cooccurrence", cooc)),
      ("q293_record_linkage", () => probe("q293_record_linkage", linkage)),
      ("q138_curate", () => probe("q138_curate", curate)),
      ("q283_als_portable", () => ("q283_als_portable", {
        run(als(src, 20L))
        val t0 = System.nanoTime(); run(als(src, 20L))
        (System.nanoTime() - t0) / 1e9
      }, {
        val t1 = System.nanoTime(); run(als(work, 200L))
        (System.nanoTime() - t1) / 1e9
      }))).collect { case (n, f) if wanted(n) => f() }

    val loadavg =
      try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
        .trim.split(" ").take(3).mkString(" ")
      catch { case _: Throwable => "unavailable" }
    val body = rows.map { case (n, s1, s10) =>
      f""""$n":{"sec_1x":$s1%.3f,"sec_10x":$s10%.3f,"ratio":${s10 / s1}%.2f}"""
    }.mkString(",")
    println(s"""{"probe":"scale10x_tail",$body,"loadavg":"$loadavg"}""")
    spark.stop()
  }
}
