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

  test("decode stub is deterministic and in-range") {
    val d1 = Multimodal.decodeStub(media).select("media_id", "decoded.width", "decoded.height")
      .as[(Long, Int, Int)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    val d2 = Multimodal.decodeStub(media).select("media_id", "decoded.width", "decoded.height")
      .as[(Long, Int, Int)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(d1 == d2)
    Multimodal.decodeStub(media).select("decoded.width", "decoded.height")
      .as[(Int, Int)].collect().foreach { case (w, h) =>
        assert(w >= 1 && w <= 1920 && h >= 1 && h <= 1080)
      }
  }

  test("resize preserves aspect ratio and never upscales") {
    val out = Multimodal.resizeMeta(Multimodal.decodeStub(media), 100, 100)
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

  test("per-partition feature extraction appends fixed-dim deterministic vectors") {
    val f1 = Multimodal.featuresByPartition(media, batchSize = 1, dim = 8)
      .select("media_id", "features").as[(Long, Seq[Float])].collect().toMap
    val f2 = Multimodal.featuresByPartition(media, batchSize = 64, dim = 8)
      .select("media_id", "features").as[(Long, Seq[Float])].collect().toMap
    assert(f1.values.forall(_.length == 8))
    assert(f1 == f2) // batch size must not change results
  }
}
