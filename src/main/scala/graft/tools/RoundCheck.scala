package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch equivalence probe: RoundHalfUpExpr vs Spark round(x,0) on
  * adversarial + random doubles, compared at raw bit level. */
object RoundCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val rnd = new java.util.Random(7)
    val adversarial = Seq(
      0.0, -0.0, 0.5, -0.5, 1.5, -1.5, 2.5, -2.5, 0.49999999999999994,
      -0.49999999999999994, 4.503599627370495e15, -4.503599627370495e15,
      4.503599627370496e15, 9.007199254740992e15, -9.007199254740992e15,
      Double.MaxValue, Double.MinValue, Double.MinPositiveValue,
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      1e-300, -1e-300, 123456.99995, -123456.99995, 123456.99994999999,
      0.155 * 1e4, -0.155 * 1e4, 2.675 * 1e2)
    val boundary = (0 until 200000).flatMap { i =>
      val m = rnd.nextInt(1 << 30).toDouble
      Seq(m + 0.5, -(m + 0.5), Math.nextDown(m + 0.5), Math.nextUp(m + 0.5),
        -(Math.nextDown(m + 0.5)), -(Math.nextUp(m + 0.5)))
    }
    val randoms = (0 until 400000).map { _ =>
      java.lang.Double.longBitsToDouble(rnd.nextLong()) } ++
      (0 until 400000).map(_ => (rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(18)))
    val all = (adversarial ++ boundary ++ randoms).toDF("x")
    val cmp = all.select(col("x"), round(col("x"), 0).as("spark"),
        graft.expr.RoundHalfUpExpr.column(col("x")).as("fast"))
      .filter(
        // raw-bit compare, NaN == NaN
        !(col("spark") <=> col("fast")) ||
        (col("spark") === 0.0 && col("fast") === 0.0 &&
          expr("sign(1.0/spark) <> sign(1.0/fast)")))
    val bad = cmp.limit(10).collect()
    println("ROUNDCHECK mismatches: " + cmp.count())
    bad.foreach(r => println("  " + r))
    spark.stop()
  }
}
