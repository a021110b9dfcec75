package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video ride as opaque
  * `BinaryType` columns with typed metadata; decode / feature-extract /
  * resize / frame-sample are per-partition batched transforms.
  *
  * The actual codec calls are STUBBED (no image/audio libraries in this
  * environment) behind `decodeStub` — a deterministic fake derived from
  * the payload hash — but everything Spark-side is real and tested:
  * schemas, the mapPartitions batch shape (the Scala analogue of
  * `mapInPandas`: an iterator of row batches, model loaded once per
  * partition), partitioning-preserving signatures, and the explode-based
  * frame sampler.
  */
object Multimodal {

  /** Canonical media-table schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  /** Deterministic fake "decode": dimensions and a feature vector
    * derived from the payload hash. STUB — replace the expression with a
    * real codec in a mapPartitions batch (see featuresByPartition). */
  def decodeStub(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val h = xxhash64(col(payloadCol))
    df.withColumn("decoded", struct(
      (pmod(h, lit(1920L)) + 1).cast("int").as("width"),
      (pmod(h * 31L, lit(1080L)) + 1).cast("int").as("height"),
      lit(3).as("channels")))
  }

  /** Resize plumbing: recomputes metadata for a target box preserving
    * aspect ratio; payload passthrough (STUB — a real resize re-encodes
    * the payload in the partition batch). */
  def resizeMeta(df: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(lit(maxW) / col("decoded.width"), lit(maxH) / col("decoded.height"))
    val clamped = least(scale, lit(1.0))
    df.withColumn("resized", struct(
      (col("decoded.width") * clamped).cast("int").as("width"),
      (col("decoded.height") * clamped).cast("int").as("height")))
  }

  /** Frame sampling for video rows: emits one row per sampled frame
    * timestamp — `explode(sequence(...))`, fully distributed, no
    * driver involvement. */
  def frameSample(df: DataFrame, everyMs: Long, maxFrames: Int = 100): DataFrame =
    df.withColumn("frame_ts_ms", explode(slice(
      sequence(lit(0L), coalesce(col("meta.duration_ms"), lit(0L)), lit(everyMs)),
      1, maxFrames)))

  /** Per-partition batched feature extraction — the mapInPandas-shaped
    * seam. The "model" is loaded once per partition, rows are processed
    * in fixed-size batches (the batch is where a vectorized inference
    * call would run), and the output schema is explicit. The embedded
    * featurizer is a STUB (hash-derived floats). */
  def featuresByPartition(df: DataFrame, batchSize: Int = 64, dim: Int = 8): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      // model/codec initialization would happen HERE, once per partition
      rows.grouped(batchSize).flatMap { batch =>
        // vectorized inference over `batch` would happen HERE
        batch.map { row =>
          val payload = row.get(payloadIdx) match {
            case b: Array[Byte] => b
            case _ => Array.emptyByteArray
          }
          var h = payload.foldLeft(1125899906842597L)((acc, b) => acc * 31 + b)
          val feats = Array.tabulate(dim) { i =>
            h = h * 6364136223846793005L + 1442695040888963407L
            (h >>> 40).toFloat / (1 << 24).toFloat
          }
          Row.fromSeq(row.toSeq :+ feats.toSeq)
        }
      }
    }(enc)
  }

  /** Synthesize a deterministic media table from the documents table
    * (text bytes as payload) — exercises the binary-column path with
    * driver-provided data only. */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("application/octet-stream").as("mime"),
      struct(lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        (col("n_chars") * 40L).as("duration_ms")).as("meta"))
}
