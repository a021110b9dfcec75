package graft

import org.apache.spark.sql.functions._

/** Round-6 operators: int8 embedding quantization and k-core peeling. */
class R6OpsSpec extends SparkSpec {
  import spark.implicits._

  test("int8 quantization: codes in [-127,127], max element hits ±127, bounded round-trip error") {
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(10.0f, 2.0f, -3.0f, 4.0f))).toDF("vec_id", "embedding")
    val q = graft.sim.Quantize.int8(df).cache()
    try {
      val rows = q.select("vec_id", "dim", "q", "scale")
        .as[(Long, Long, Int, Double)].collect()
      assert(rows.length == 8)
      assert(rows.forall { case (_, _, c, _) => c >= -127 && c <= 127 })
      // the max-abs element of each vector maps to ±127
      assert(rows.find(r => r._1 == 1L && r._2 == 1L).get._3 == -127)
      assert(rows.find(r => r._1 == 2L && r._2 == 0L).get._3 == 127)
      // dequantization error ≤ scale/2 per element
      val orig = Map((1L, 0L) -> 0.5, (1L, 1L) -> -1.0, (1L, 2L) -> 0.25, (1L, 3L) -> 0.0,
        (2L, 0L) -> 10.0, (2L, 1L) -> 2.0, (2L, 2L) -> -3.0, (2L, 3L) -> 4.0)
      rows.foreach { case (id, dim, c, s) =>
        assert(math.abs(c * s - orig((id, dim))) <= s / 2 + 1e-4,
          s"vec $id dim $dim: ${c * s} vs ${orig((id, dim))}")
      }
    } finally q.unpersist()
  }

  test("int8 quantization: zero vector gives all-zero codes and scale 0") {
    val df = Seq((1L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val rows = graft.sim.Quantize.int8(df)
      .select("q", "scale").as[(Int, Double)].collect()
    assert(rows.forall { case (c, s) => c == 0 && s == 0.0 })
  }

  test("k-core: a 4-clique survives k=3 peeling, pendant path does not") {
    // 4-clique {1,2,3,4} plus path 4-5-6 hanging off it
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L)).toDF("u", "v")
    val core = graft.graph.KCore.kCore(edges, "u", "v", k = 3, iters = 3)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(core == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)), core.toString)
  }

  test("k-core: k=1 keeps every non-isolated node with its full degree") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    val core = graft.graph.KCore.kCore(edges, "u", "v", k = 1, iters = 2)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(core == Seq((1L, 1L), (2L, 2L), (3L, 1L)), core.toString)
  }
}
