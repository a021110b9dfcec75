package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video ride as opaque
  * `BinaryType` columns with typed metadata; decode / feature-extract /
  * resize / frame-sample are per-partition batched transforms.
  *
  * IMAGE decode is REAL: [[decodeImageFeatures]] runs the JDK
  * `javax.imageio` codec (PNG/JPEG/BMP/GIF, zero extra dependencies)
  * inside the per-partition batch seam, and [[plantImages]] generates
  * genuine PNG payloads from deterministic pixel formulas so the decode
  * path is oracle-checkable end-to-end. AUDIO decode is REAL too:
  * [[decodeAudioFeatures]] runs the JDK `javax.sound.sampled` codec
  * (WAV/AIFF/AU PCM) and [[plantAudio]] writes genuine RIFF/WAVE PCM-16
  * payloads from a deterministic sample formula. VIDEO decode is REAL
  * as of r17: [[decodeVideoFeatures]] walks a multi-frame animated-GIF
  * container through the JDK `ImageIO` GIF reader (frame count, dims,
  * per-frame luminance stats) and [[plantVideos]] writes genuine
  * animated GIFs (palette-indexed, hence lossless) from deterministic
  * per-frame pixel formulas — the same plant→JDK-decode→analytic-oracle
  * pattern as image/audio. The Spark-side plumbing is shared: the
  * mapPartitions batch shape (the Scala analogue of `mapInPandas`: an
  * iterator of row batches, codec initialized once per partition),
  * partitioning-preserving signatures, and the explode-based frame
  * sampler.
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

  /** Plant a deterministic REAL PNG payload per id: a width×height
    * TYPE_INT_RGB image whose pixel (x, y) channels are fixed integer
    * formulas of (id, x, y) —
    *   w = 8 + id % 9,  h = 8 + (7·id) % 9,
    *   r = (id + 3x + 5y) % 256, g = (2id + 7x + 11y) % 256,
    *   b = (3id + 13x + 17y) % 256
    * — encoded through `javax.imageio.ImageIO`. PNG is lossless, so the
    * DECODED stats are oracle-computable analytically from the formulas
    * without any SQL-side codec, even though the byte stream itself is
    * JDK-encoder-specific. Runs in the same per-partition batch shape as
    * [[featuresByPartition]]. */
  def plantImages(df: DataFrame, idCol: String = "media_id"): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("payload", BinaryType, nullable = false))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map { row =>
        val id = row.getLong(idIdx)
        val w = (8 + id % 9).toInt
        val h = (8 + (7 * id) % 9).toInt
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val r = ((id + 3 * x + 5 * y) % 256).toInt
            val g = ((2 * id + 7 * x + 11 * y) % 256).toInt
            val b = ((3 * id + 13 * x + 17 * y) % 256).toInt
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
            x += 1
          }
          y += 1
        }
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", baos)
        Row.fromSeq(row.toSeq :+ baos.toByteArray)
      }
    }(enc)
  }

  /** REAL image decode through the JDK codec (`javax.imageio` — PNG,
    * JPEG, BMP, GIF with zero extra dependencies): per-partition batched
    * exactly like [[featuresByPartition]], emitting decoded dimensions,
    * channel count, and per-channel pixel means. Undecodable payloads
    * (null, truncated, non-image bytes) degrade to `decode_ok = false`
    * with NULL stats — callers that need a value anyway can filter on
    * the flag or impute downstream (the hash-derived decodeStub this
    * doc once pointed at was deleted when the real decoder shipped).
    * Scale shape: pure per-row work behind one narrow
    * mapPartitions, no shuffle; the decoded image never leaves the task. */
  def decodeImageFeatures(df: DataFrame, payloadCol: String = "payload",
                          batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("channels", IntegerType, nullable = true),
      StructField("mean_r", DoubleType, nullable = true),
      StructField("mean_g", DoubleType, nullable = true),
      StructField("mean_b", DoubleType, nullable = true),
      StructField("decode_ok", BooleanType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    def r4(x: Double): Double = math.round(x * 1e4) / 1e4 + 0.0
    df.mapPartitions { rows =>
      // codec warm-up/initialization happens once per partition
      javax.imageio.ImageIO.setUseCache(false)
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val decoded = row.get(payloadIdx) match {
            case bytes: Array[Byte] if bytes.nonEmpty =>
              try Option(javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(bytes)))
              catch { case _: Exception => None }
            case _ => None
          }
          val extra: Seq[Any] = decoded match {
            case Some(img) =>
              val (w, h) = (img.getWidth, img.getHeight)
              val ch = img.getColorModel.getNumComponents
              var (sr, sg, sb) = (0L, 0L, 0L)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val v = img.getRGB(x, y)
                  sr += (v >> 16) & 0xff; sg += (v >> 8) & 0xff; sb += v & 0xff
                  x += 1
                }
                y += 1
              }
              val n = (w.toLong * h).toDouble
              Seq(w, h, ch, r4(sr / n), r4(sg / n), r4(sb / n), true)
            case None => Seq(null, null, null, null, null, null, false)
          }
          Row.fromSeq(row.toSeq ++ extra)
        }
      }
    }(enc)
  }

  /** Plant a deterministic REAL WAV payload per id: mono 16-bit PCM at
    * 8 kHz whose sample t is a fixed integer formula of (id, t) —
    *   n = 64 + id % 65,
    *   s(t) = ((37·id + 13·t² + 7·t) mod 4096 − 2048) · 16
    * — wrapped in a hand-written RIFF/WAVE header (the container format
    * is a public spec; writing it directly keeps the byte stream fully
    * deterministic, while DECODE below goes through the real JDK codec).
    * PCM is lossless, so the decoded stats are oracle-computable
    * analytically from the formula, exactly like [[plantImages]]. */
  def plantAudio(df: DataFrame, idCol: String = "media_id",
                 sampleRate: Int = 8000): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("payload", BinaryType, nullable = false))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map { row =>
        val id = row.getLong(idIdx)
        val n = (64 + id % 65).toInt
        val bb = java.nio.ByteBuffer.allocate(44 + 2 * n)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n)
          .put("WAVE".getBytes("US-ASCII"))
          .put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1).putShort(1)                  // PCM, mono
          .putInt(sampleRate).putInt(sampleRate * 2) // byte rate
          .putShort(2).putShort(16)                 // block align, bits
          .put("data".getBytes("US-ASCII")).putInt(2 * n)
        var t = 0
        while (t < n) {
          val s = (((37 * id + 13L * t * t + 7L * t) % 4096) - 2048) * 16
          bb.putShort(s.toShort)
          t += 1
        }
        Row.fromSeq(row.toSeq :+ bb.array())
      }
    }(enc)
  }

  /** REAL audio decode through the JDK codec (`javax.sound.sampled.
    * AudioSystem` — WAV/AIFF/AU PCM with zero extra dependencies):
    * per-partition batched like [[decodeImageFeatures]], emitting the
    * decoded format (rate, channels, bits), sample count, duration, and
    * amplitude stats (mean, RMS, zero-crossings). Undecodable payloads
    * degrade to `decode_ok = false` with NULL stats. Scale shape: pure
    * per-row work behind one narrow mapPartitions, no shuffle; decoded
    * samples never leave the task. */
  def decodeAudioFeatures(df: DataFrame, payloadCol: String = "payload",
                          batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_channels", IntegerType, nullable = true),
      StructField("bits", IntegerType, nullable = true),
      StructField("n_samples", LongType, nullable = true),
      StructField("duration_ms", DoubleType, nullable = true),
      StructField("mean_amp", DoubleType, nullable = true),
      StructField("rms_amp", DoubleType, nullable = true),
      StructField("zero_cross", LongType, nullable = true),
      StructField("decode_ok", BooleanType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    def r4(x: Double): Double = math.round(x * 1e4) / 1e4 + 0.0
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val extra: Seq[Any] = (row.get(payloadIdx) match {
            case bytes: Array[Byte] if bytes.nonEmpty =>
              try {
                val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
                  new java.io.ByteArrayInputStream(bytes))
                try {
                  val fmt = in.getFormat
                  val signed = fmt.getEncoding ==
                    javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
                  val raw0 = if (signed && fmt.getSampleSizeInBits == 16)
                    in.readAllBytes() else Array.emptyByteArray
                  if (raw0.length < 2 * fmt.getChannels) None // no frames -> undecodable
                  else {
                    val raw = raw0
                    val bb = java.nio.ByteBuffer.wrap(raw).order(
                      if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
                      else java.nio.ByteOrder.LITTLE_ENDIAN)
                    val ch = fmt.getChannels
                    val nFrames = raw.length / (2 * ch)
                    var (sum, sumSq, zc) = (0L, 0L, 0L)
                    var prev = 0L
                    var i = 0
                    while (i < nFrames) {
                      // frame value = first channel (planted audio is mono)
                      val s = bb.getShort(i * 2 * ch).toLong
                      sum += s; sumSq += s * s
                      if (i > 0 && prev * s < 0) zc += 1
                      prev = s
                      i += 1
                    }
                    val n = nFrames.toDouble
                    Some(Seq(fmt.getSampleRate.toInt, ch, 16, nFrames.toLong,
                      r4(nFrames * 1000.0 / fmt.getSampleRate),
                      r4(sum / n), r4(math.sqrt(sumSq / n)), zc, true))
                  }
                } finally in.close()
              } catch { case _: Exception => None }
            case _ => None
          }).getOrElse(Seq(null, null, null, null, null, null, null, null, false))
          Row.fromSeq(row.toSeq ++ extra)
        }
      }
    }(enc)
  }

  /** Plant a deterministic REAL multi-frame video per id: an ANIMATED
    * GIF (the one video container the JDK can both write and read with
    * zero extra dependencies) with
    *   w = 8 + id % 9,  h = 8 + (7·id) % 9,  frames F = 2 + id % 4,
    *   pixel (x, y) of frame f = gray level (id + 3x + 5y + 11f) % 256
    * — frames are TYPE_BYTE_INDEXED over an explicit 256-gray identity
    * palette, so the GIF encoding is LOSSLESS by construction (palette
    * formats quantize only when the source exceeds 256 colors) and the
    * decoded stats are oracle-computable analytically from the
    * formulas, exactly like [[plantImages]]/[[plantAudio]]. Written
    * through the real `ImageIO` GIF sequence writer per partition. */
  def plantVideos(df: DataFrame, idCol: String = "media_id"): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("payload", BinaryType, nullable = false))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      // identity gray palette: color i = (i, i, i). TYPE_BYTE_GRAY is
      // NOT used on purpose — its linear colorspace makes getRGB apply
      // a nonlinear gray→sRGB mapping; an explicit IndexColorModel
      // keeps the value→color map the identity on both sides
      val levels = Array.tabulate(256)(_.toByte)
      val icm = new java.awt.image.IndexColorModel(8, 256, levels, levels, levels)
      rows.map { row =>
        val id = row.getLong(idIdx)
        val w = (8 + id % 9).toInt
        val h = (8 + (7 * id) % 9).toInt
        val nf = (2 + id % 4).toInt
        val baos = new java.io.ByteArrayOutputStream()
        val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
        val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var f = 0
        while (f < nf) {
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              raster.setSample(x, y, 0, ((id + 3 * x + 5 * y + 11 * f) % 256).toInt)
              x += 1
            }
            y += 1
          }
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
          f += 1
        }
        writer.endWriteSequence()
        ios.close()
        writer.dispose()
        Row.fromSeq(row.toSeq :+ baos.toByteArray)
      }
    }(enc)
  }

  /** REAL video decode through the JDK GIF reader: per-partition
    * batched like [[decodeImageFeatures]], walking every frame of the
    * animated-GIF container and emitting frame count, dimensions, and
    * luminance stats (mean gray over ALL frames' pixels, plus the
    * first and last frames' means — the "did the content change"
    * signal a curation pipeline thresholds on). Undecodable payloads
    * degrade to `decode_ok = false` with NULL stats. Scale shape: pure
    * per-row work behind one narrow mapPartitions, no shuffle; decoded
    * frames never leave the task. At 100 TB the same seam hosts an
    * ffmpeg/JNI codec — only the bytes→frames closure changes. */
  def decodeVideoFeatures(df: DataFrame, payloadCol: String = "payload",
                          batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("n_frames", IntegerType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("mean_lum", DoubleType, nullable = true),
      StructField("first_lum", DoubleType, nullable = true),
      StructField("last_lum", DoubleType, nullable = true),
      StructField("decode_ok", BooleanType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    def r4(x: Double): Double = math.round(x * 1e4) / 1e4 + 0.0
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val extra: Seq[Any] = (row.get(payloadIdx) match {
            case bytes: Array[Byte] if bytes.nonEmpty =>
              val reader =
                javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
              try {
                val iis = javax.imageio.ImageIO.createImageInputStream(
                  new java.io.ByteArrayInputStream(bytes))
                reader.setInput(iis, false)
                val nf = reader.getNumImages(true)
                if (nf <= 0) None
                else {
                  var (total, w0, h0) = (0L, 0, 0)
                  var (firstSum, lastSum) = (0L, 0L)
                  var pixelsPerFrame = 0L
                  var f = 0
                  while (f < nf) {
                    val img = reader.read(f)
                    if (f == 0) { w0 = img.getWidth; h0 = img.getHeight }
                    var frameSum = 0L
                    var y = 0
                    while (y < img.getHeight) {
                      var x = 0
                      while (x < img.getWidth) {
                        frameSum += (img.getRGB(x, y) >> 16) & 0xff
                        x += 1
                      }
                      y += 1
                    }
                    if (f == 0) { firstSum = frameSum
                      pixelsPerFrame = img.getWidth.toLong * img.getHeight }
                    if (f == nf - 1) lastSum = frameSum
                    total += frameSum
                    f += 1
                  }
                  val ppf = pixelsPerFrame.toDouble
                  Some(Seq(nf, w0, h0, r4(total / (ppf * nf)),
                    r4(firstSum / ppf), r4(lastSum / ppf), true))
                }
              } catch { case _: Exception => None }
              finally reader.dispose()
            case _ => None
          }).getOrElse(Seq(null, null, null, null, null, null, false))
          Row.fromSeq(row.toSeq ++ extra)
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
