package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Output sinks S6-S8 (SURVEY §2.1): parquet feature-store writes, the
  * `;`-separated UTF-8 submission CSV with read-back verification, and
  * CSV/JSON metadata sinks (reference: src/data/load_data.py:128-133,
  * generate_submission_with_trained_model.py:222-243,
  * src/features/feature_pipeline.py:470-585).
  */
object Sinks {

  /** S6 — parquet sink (snappy default). `partitionByCols` enables
    * partition pruning for downstream readers — the 100 TB layout lever. */
  def parquet(df: DataFrame, path: String, partitionByCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionByCols.nonEmpty) w.partitionBy(partitionByCols: _*) else w).parquet(path)
  }

  /** S7 — submission CSV: `;` separator, UTF-8, header, single file
    * (the submission contract wants ONE file — coalesce(1) is correct
    * here because the submission grid is dimension-sized, never
    * fact-sized). Returns the read-back DataFrame for validation. */
  def csvSubmission(spark: SparkSession, df: DataFrame, path: String): DataFrame = {
    df.coalesce(1).write.mode(SaveMode.Overwrite)
      .option("sep", ";").option("header", "true").option("encoding", "UTF-8")
      .csv(path)
    spark.read.option("sep", ";").option("header", "true").option("inferSchema", "true")
      .csv(path)
  }

  /** S8 — metadata sinks: a small stats DataFrame as CSV, and scalar
    * metadata as a single-row JSON. */
  def metadataCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def metadataJson(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite).json(path)
}
