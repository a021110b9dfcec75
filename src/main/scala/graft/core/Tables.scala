package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table access for the driver-provided star schema
  * (TESTDATA.md): region nation customer supplier part orders lineitem
  * events documents embeddings.
  *
  * Mirrors the reference's schema-probing parquet loaders
  * (reference: src/data/loaders.py:43-118) but leaves column pruning and
  * predicate pushdown to Catalyst — a `.select`/`.filter` on the returned
  * DataFrame reaches the parquet scan as ReadSchema/PushedFilters.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  /** Type-adaptive events loader. The driver has shipped events.parquet
    * in two layouts over time: `ts` as TIMESTAMP(NANOS) (which Spark's
    * parquet reader rejects without the legacy nanosAsLong flag) and as
    * plain timestamp[us] (which Spark reads as TIMESTAMP_NTZ when the
    * file is not adjusted-to-UTC). Probe the schema and branch:
    *
    *  - TimestampType: pass through.
    *  - TimestampNTZType: cast to TimestampType. The cast is
    *    session-timezone-dependent, so the loader pins
    *    spark.sql.session.timeZone=UTC first — under UTC the cast is a
    *    bit-identical reinterpretation of the stored microseconds, which
    *    is exactly how DuckDB (the oracle) reads the same file.
    *  - LongType (nanosAsLong already on in this session): integer
    *    `div 1000` to microseconds. `div`, not `/`: nanos exceed 2^53,
    *    so double division rounds the microsecond off by ±1 on ~6% of
    *    rows while parquet readers truncate.
    *  - Schema probe throws (raw NANOS, flag off): set the flag and take
    *    the long path.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val path = s"$dir/events.parquet"
    probeEventsTsType(spark, path) match {
      case TimestampNTZType =>
        // TZ-sensitive cast: pin UTC (the repo-wide session convention,
        // enforced here rather than silently depended on — NOTE this is
        // a deliberate session-level side effect) so the stored micros
        // pass through bit-identically, matching the DuckDB oracle
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.read.parquet(path).withColumn("ts", col("ts").cast(TimestampType))
      case LongType =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(path)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => spark.read.parquet(path) // TimestampType (or unexpected): pass through
    }
  }

  /** Probed `ts` physical type for an events-shaped path, shared by the
    * batch and streaming readers. Distinguishes the legacy
    * TIMESTAMP(NANOS) rejection (→ LongType, to be read under the
    * nanosAsLong flag and divided to micros) from every OTHER probe
    * failure — a missing or not-yet-populated path (the normal
    * file-stream-source pattern) defaults to the CURRENT timestamp[us]
    * layout instead of silently corrupting micros with the div-1000
    * legacy path. */
  def probeEventsTsType(spark: SparkSession, path: String): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types.{LongType, TimestampType}
    try spark.read.parquet(path).schema("ts").dataType
    catch {
      case e: Throwable =>
        val m = String.valueOf(e.getMessage)
        if (m.contains("NANOS") || m.contains("Illegal Parquet type")) LongType
        else TimestampType
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
