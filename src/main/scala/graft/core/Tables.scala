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
  /** The events table carries TIMESTAMP(NANOS) which Spark's parquet
    * reader rejects; read nanos as long (session flag) and convert to a
    * microsecond TimestampType column. Integer `div` (not `/`): the
    * nanos values exceed 2^53, so a double division rounds the
    * microsecond off by ±1 on ~6% of rows, while DuckDB (and parquet
    * readers generally) truncate — `div` matches them exactly. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
