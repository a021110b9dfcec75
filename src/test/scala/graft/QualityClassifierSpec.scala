package graft

import org.apache.spark.sql.functions._
import graft.text.QualityClassifier

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  // two vocabularies with overlap: "positive" docs draw from pos words,
  // negatives from neg words — linearly separable in hash-bucket space
  private def corpus = {
    val pos = Vector("alpha", "beta", "gamma", "delta", "epsilon")
    val neg = Vector("zulu", "yankee", "xray", "whiskey", "victor")
    (0L until 60L).map { i =>
      val words = (0 until 12).map { j =>
        val src = if (i % 2 == 0) pos else neg
        src(((i * 7 + j * 3) % 5).toInt)
      }
      (i, words.mkString(" "), i % 2 == 0)
    }.toDF("doc_id", "text", "y")
  }

  private def fit(df: org.apache.spark.sql.DataFrame) =
    QualityClassifier.trainScore(df, col("doc_id"), col("text"), col("y"))

  test("training beats the zero-weight baseline (Brier score drops)") {
    val out = fit(corpus).select("label", "prob").as[(Int, Double)].collect()
    val brier = out.map { case (y, p) => (p - y) * (p - y) }.sum / out.length
    // zero weights give p = 0.5 for every doc -> Brier 0.25
    assert(brier < 0.20, s"Brier $brier did not improve on 0.25")
  }

  test("separable corpus is classified accurately") {
    val out = fit(corpus).select("label", "pred").as[(Int, Int)].collect()
    val acc = out.count { case (y, p) => y == p }.toDouble / out.length
    assert(acc >= 0.9, s"accuracy $acc on a separable corpus")
  }

  test("fit is deterministic and probabilities sit on the 1e-6 grid") {
    val a = fit(corpus).select("doc_id", "score", "prob", "pred")
      .as[(Long, Double, Double, Int)].collect().sortBy(_._1)
    val b = fit(corpus).select("doc_id", "score", "prob", "pred")
      .as[(Long, Double, Double, Int)].collect().sortBy(_._1)
    assert(a.sameElements(b))
    a.foreach { case (_, s, p, _) =>
      assert(p == math.round(p * 1e6) / 1e6.toDouble)
      assert(s == math.round(s * 1e6) / 1e6.toDouble)
      assert(p >= 0.0 && p <= 1.0)
    }
  }

  test("token-less docs ride the bias-only path, no crash") {
    val df = Seq((1L, "alpha beta", true), (2L, "   ", false),
      (3L, "", true)).toDF("doc_id", "text", "y")
    val out = fit(df).select("doc_id", "prob").as[(Long, Double)].collect()
    assert(out.length == 3 && out.forall(t => !t._2.isNaN))
  }
}
