package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-shape audit CLI: prints exchange/broadcast/scan/sort counts of
  * the executed plan for the named queries (all queries when none are
  * named) — the quick feedback loop behind the PlanSpec pins.
  *
  * Usage: `runMain graft.tools.PlanAuditNew [sfDir] [query...]`
  */
object PlanAuditNew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    for (q <- names) {
      val df = graft.SparkEntry.queries(q)(spark, d)
      val plan = df.queryExecution.executedPlan.toString
      val nBc = "BroadcastExchange".r.findAllIn(plan).length
      val nEx = "Exchange".r.findAllIn(plan).length - nBc
      val nScan = "Scan parquet".r.findAllIn(plan).length
      val nSort = "Sort \\[".r.findAllIn(plan).length
      val n1p = "Exchange SinglePartition".r.findAllIn(plan).length
      println(s"AUDIT $q exchanges=$nEx broadcast=$nBc scans=$nScan " +
        s"sorts=$nSort single_partition=$n1p")
    }
    spark.stop()
  }
}
