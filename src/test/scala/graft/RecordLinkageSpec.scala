package graft

import org.apache.spark.sql.functions._
import graft.etl.RecordLinkage

class RecordLinkageSpec extends SparkSpec {
  import spark.implicits._

  // (id, block, segment, bucket) — ids 1/2 are a planted full-agreement
  // duplicate; 3 agrees with them on segment only; 4 shares nothing;
  // 5/6 would fully agree but sit in ANOTHER block (must never pair)
  private def recs = Seq(
    (1L, 0, "AUTO", 12), (2L, 0, "AUTO", 12), (3L, 0, "AUTO", 99),
    (4L, 0, "BIKE", 55), (7L, 0, "SHIP", 77), (8L, 0, "FOOD", 31),
    (5L, 1, "AUTO", 12), (6L, 2, "AUTO", 12)) ++
    // filler spread over segments/buckets so u stays well below 1
    (100L until 140L).map(i =>
      (i, 0, Seq("S1", "S2", "S3", "S4")((i % 4).toInt), (i % 17).toInt))

  private def run(tauPossible: Double = 1.5) =
    RecordLinkage.fellegiSunter(recs.toDF("id", "blk", "seg", "bkt"),
      col("id"), col("blk"),
      Seq((col("seg"), 0.95), (col("bkt"), 0.9)), tauPossible = tauPossible,
      tauMatch = 100.0)
      .select("id_a", "id_b", "score", "cls")
      .as[(Long, Long, Double, String)].collect()

  test("full-agreement pair classifies as match, partial as lower score") {
    val out = run()
    val byPair = out.map(t => (t._1, t._2) -> t).toMap
    assert(byPair((1L, 2L))._4 == "match")
    val full = byPair((1L, 2L))._3
    // seg-only agreement (1,3) scores strictly below full agreement
    byPair.get((1L, 3L)).foreach(p => assert(p._3 < full))
  }

  test("pairs never cross blocks") {
    val out = run(tauPossible = 0.0)
    assert(!out.exists(t => Set(t._1, t._2) == Set(5L, 6L)))
    assert(!out.exists(t => Set(t._1, t._2) == Set(1L, 5L)))
  }

  test("scores are deterministic and positive") {
    val a = run().sortBy(t => (t._1, t._2))
    val b = run().sortBy(t => (t._1, t._2))
    assert(a.sameElements(b))
    assert(a.forall(_._3 > 0))
  }
}
