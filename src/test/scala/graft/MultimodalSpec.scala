package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = {
    val docs = Seq((1L, "hello world", "en", "s", 11L), (2L, "abc", "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    Multimodal.mediaFromDocuments(spark, docs)
  }

  test("media table conforms to the canonical schema") {
    val m = media
    assert(m.schema.fieldNames.toSeq == Seq("media_id", "payload", "mime", "meta"))
    assert(m.schema("payload").dataType.typeName == "binary")
  }

  // the r16-era hash-derived decode stub, DEMOTED to a test fixture in
  // r17 (the real video path is Multimodal.decodeVideoFeatures): it
  // survives here only to exercise resizeMeta's struct plumbing with
  // arbitrary dimensions
  private def decodeStubFixture(df: org.apache.spark.sql.DataFrame) = {
    val h = xxhash64(col("payload"))
    df.withColumn("decoded", struct(
      (pmod(h, lit(1920L)) + 1).cast("int").as("width"),
      (pmod(h * 31L, lit(1080L)) + 1).cast("int").as("height"),
      lit(3).as("channels")))
  }

  test("decode stub fixture is deterministic and in-range") {
    val d1 = decodeStubFixture(media).select("media_id", "decoded.width", "decoded.height")
      .as[(Long, Int, Int)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    val d2 = decodeStubFixture(media).select("media_id", "decoded.width", "decoded.height")
      .as[(Long, Int, Int)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(d1 == d2)
    decodeStubFixture(media).select("decoded.width", "decoded.height")
      .as[(Int, Int)].collect().foreach { case (w, h) =>
        assert(w >= 1 && w <= 1920 && h >= 1 && h <= 1080)
      }
  }

  test("planted animated GIF round-trips losslessly through the JDK codec") {
    val ids = Seq(0L, 1L, 5L, 17L, 254L, 1023L).toDF("media_id")
    val out = Multimodal.decodeVideoFeatures(Multimodal.plantVideos(ids))
      .select("media_id", "n_frames", "width", "height", "mean_lum",
        "first_lum", "last_lum", "decode_ok")
      .as[(Long, Int, Int, Int, Double, Double, Double, Boolean)]
      .collect().map(t => t._1 -> t).toMap
    def r4(x: Double) = math.round(x * 1e4) / 1e4 + 0.0
    out.foreach { case (id, (_, nf, w, h, mean, first, last, ok)) =>
      assert(ok, s"id=$id must decode")
      assert(nf == (2 + id % 4).toInt && w == (8 + id % 9).toInt &&
        h == (8 + (7 * id) % 9).toInt, s"id=$id dims/frames")
      // analytic replay of the planted gray formula
      var (tot, fs, ls) = (0L, 0L, 0L)
      for (f <- 0 until nf; y <- 0 until h; x <- 0 until w) {
        val v = (id + 3 * x + 5 * y + 11 * f) % 256
        tot += v
        if (f == 0) fs += v
        if (f == nf - 1) ls += v
      }
      val ppf = (w.toLong * h).toDouble
      assert(mean == r4(tot / (ppf * nf)), s"id=$id mean_lum")
      assert(first == r4(fs / ppf) && last == r4(ls / ppf), s"id=$id frame lums")
    }
    // truncated payload degrades, never throws
    val bad = Multimodal.decodeVideoFeatures(
      Seq((9L, Array[Byte](71, 73, 70, 56))).toDF("media_id", "payload"))
      .select("decode_ok").as[Boolean].collect()
    assert(bad.toSeq == Seq(false))
  }

  test("resize preserves aspect ratio and never upscales") {
    val out = Multimodal.resizeMeta(decodeStubFixture(media), 100, 100)
      .select("decoded.width", "decoded.height", "resized.width", "resized.height")
      .as[(Int, Int, Int, Int)].collect()
    out.foreach { case (w, h, rw, rh) =>
      assert(rw <= 100 && rh <= 100 && rw <= w && rh <= h)
      if (w > 100 || h > 100)
        assert(math.abs(rw.toDouble / rh - w.toDouble / h) / (w.toDouble / h) < 0.15)
    }
  }

  test("frame sampling emits floor(duration/step)+1 frames capped at max") {
    val counts = Multimodal.frameSample(media, 100L, maxFrames = 3)
      .groupBy("media_id").count().as[(Long, Long)].collect().toMap
    // doc 2: duration = 3*40 = 120ms -> frames at 0,100 = 2
    assert(counts(2L) == 2L)
    // doc 1: duration = 11*40 = 440ms -> 0,100,200,300,400 = 5 capped at 3
    assert(counts(1L) == 3L)
  }

  test("planted PNGs decode through the real JDK codec to the planted stats") {
    val ids = Seq(0L, 5L, 17L).toDF("media_id")
    val out = Multimodal.decodeImageFeatures(Multimodal.plantImages(ids))
      .select("media_id", "width", "height", "channels",
        "mean_r", "mean_g", "mean_b", "decode_ok")
      .as[(Long, Int, Int, Int, Double, Double, Double, Boolean)]
      .collect().map(t => t._1 -> t).toMap
    ids.as[Long].collect().foreach { id =>
      val (w, h) = ((8 + id % 9).toInt, (8 + (7 * id) % 9).toInt)
      // analytic expectation straight from the pixel formulas
      def mean(f: (Long, Long) => Long): Double = {
        val s = (for (x <- 0L until w; y <- 0L until h) yield f(x, y)).sum
        math.round(s.toDouble / (w * h) * 1e4) / 1e4
      }
      val (_, gw, gh, ch, mr, mg, mb, ok) = out(id)
      assert(ok && gw == w && gh == h && ch == 3)
      assert(mr == mean((x, y) => (id + 3 * x + 5 * y) % 256))
      assert(mg == mean((x, y) => (2 * id + 7 * x + 11 * y) % 256))
      assert(mb == mean((x, y) => (3 * id + 13 * x + 17 * y) % 256))
    }
  }

  test("planted WAVs decode through the real JDK codec to the planted stats") {
    val ids = Seq(0L, 5L, 17L, 64L).toDF("media_id")
    val out = Multimodal.decodeAudioFeatures(Multimodal.plantAudio(ids))
      .select("media_id", "sample_rate", "n_channels", "bits", "n_samples",
        "duration_ms", "mean_amp", "rms_amp", "zero_cross", "decode_ok")
      .as[(Long, Int, Int, Int, Long, Double, Double, Double, Long, Boolean)]
      .collect().map(t => t._1 -> t).toMap
    ids.as[Long].collect().foreach { id =>
      val n = (64 + id % 65).toInt
      // analytic expectation straight from the sample formula
      val s = (0 until n).map(t =>
        (((37 * id + 13L * t * t + 7L * t) % 4096) - 2048) * 16)
      def r4(x: Double) = math.round(x * 1e4) / 1e4 + 0.0
      val zc = (1 until n).count(t => s(t - 1) * s(t) < 0).toLong
      val (_, rate, ch, bits, gn, dur, mean, rms, gzc, ok) = out(id)
      assert(ok && rate == 8000 && ch == 1 && bits == 16 && gn == n)
      assert(dur == r4(n * 1000.0 / 8000))
      assert(mean == r4(s.sum.toDouble / n))
      assert(rms == r4(math.sqrt(s.map(v => v * v).sum.toDouble / n)))
      assert(gzc == zc)
    }
  }

  test("undecodable audio degrades to decode_ok = false with NULL stats") {
    val junk = Seq((1L, "not a wav".getBytes("UTF-8")), (2L, Array.emptyByteArray))
      .toDF("media_id", "payload")
    val out = Multimodal.decodeAudioFeatures(junk)
      .select("media_id", "n_samples", "decode_ok")
      .collect().map(r => (r.getLong(0), r.isNullAt(1), r.getBoolean(2)))
    assert(out.toSet == Set((1L, true, false), (2L, true, false)))
  }

  test("undecodable payloads degrade to decode_ok = false with NULL stats") {
    val junk = Seq((1L, "not an image".getBytes("UTF-8")), (2L, Array.emptyByteArray))
      .toDF("media_id", "payload")
    val out = Multimodal.decodeImageFeatures(junk)
      .select("media_id", "width", "decode_ok")
      .collect().map(r => (r.getLong(0), r.isNullAt(1), r.getBoolean(2)))
    assert(out.toSet == Set((1L, true, false), (2L, true, false)))
  }

  test("per-partition feature extraction appends fixed-dim deterministic vectors") {
    val f1 = Multimodal.featuresByPartition(media, batchSize = 1, dim = 8)
      .select("media_id", "features").as[(Long, Seq[Float])].collect().toMap
    val f2 = Multimodal.featuresByPartition(media, batchSize = 64, dim = 8)
      .select("media_id", "features").as[(Long, Seq[Float])].collect().toMap
    assert(f1.values.forall(_.length == 8))
    assert(f1 == f2) // batch size must not change results
  }
}
