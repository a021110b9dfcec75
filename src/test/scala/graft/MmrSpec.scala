package graft

import org.apache.spark.sql.functions._
import graft.functions.Funcs.r
import graft.sim.{Mmr, Similarity}

class MmrSpec extends SparkSpec {
  import spark.implicits._

  // three tight clusters along distinct axes; relevance decreasing in id
  // so pure top-k would take the whole first cluster before any other
  private def cands = {
    def v(axis: Int, jitter: Double) = Array.tabulate(8) { i =>
      (if (i == axis) 1.0 else 0.0) + (if (i == (axis + 1) % 8) jitter else 0.0)
    }
    val rows = (0 until 12).map { i =>
      val axis = i / 4           // ids 0-3 cluster 0, 4-7 cluster 1, 8-11 cluster 2
      val rel = 1.0 - i * 0.01   // strictly decreasing relevance
      (i.toLong, v(axis, 0.05 * (i % 4)).toSeq, rel)
    }
    rows.toDF("vec_id", "vec", "rel")
      .select(col("vec_id"), col("vec").cast("array<double>").as("vec"),
        r(col("rel")).as("rel"))
  }

  test("MMR spreads picks across clusters where pure top-k would not") {
    val picks = Mmr.mmrSelect(cands, "vec_id", "vec", "rel", k = 3)
      .select("rank", "vec_id").as[(Int, Long)].collect().sortBy(_._1)
    val clusters = picks.map(_._2 / 4).toSet
    // pure top-3 by relevance = ids 0,1,2 -> all cluster 0
    assert(clusters.size == 3, s"picks ${picks.mkString(",")} not diverse")
    assert(picks.head._2 == 0L) // first pick is the pure-relevance argmax
  }

  test("ranks are 1..k, scores non-increasing only within re-ranked rounds") {
    val out = Mmr.mmrSelect(cands, "vec_id", "vec", "rel", k = 5)
      .select("rank", "mmr_score").as[(Int, Double)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == (1 to 5))
  }

  test("k larger than the candidate pool selects everything, no crash") {
    val out = Mmr.mmrSelect(cands.limit(3), "vec_id", "vec", "rel", k = 10)
      .collect()
    assert(out.length == 3)
  }

  test("k=64 smoke: the periodic checkpoint keeps large-k selection tractable") {
    // 128 candidates on 8 axes; crosses the every-8-rounds localCheckpoint
    // boundary 8 times — pins the lineage-cut path added after r11
    val big = (0 until 128).map { i =>
      val axis = i % 8
      (i.toLong,
        Array.tabulate(8)(j => if (j == axis) 1.0 else 0.001 * ((i + j) % 5)).toSeq,
        1.0 - i * 0.001)
    }.toDF("vec_id", "vec", "rel")
      .select(col("vec_id"), col("vec").cast("array<double>").as("vec"),
        r(col("rel")).as("rel"))
    val out = Mmr.mmrSelect(big, "vec_id", "vec", "rel", k = 64)
      .select("rank", "vec_id").as[(Int, Long)].collect().sortBy(_._1)
    assert(out.length == 64)
    assert(out.map(_._1).toSeq == (1 to 64))
    assert(out.map(_._2).distinct.length == 64)
    // the first 8 picks should sweep all 8 axes (diversity pressure)
    assert(out.take(8).map(_._2 % 8).toSet.size == 8)
  }
}
