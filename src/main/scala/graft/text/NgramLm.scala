package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Funcs

/** Bigram language-model scoring — the classic corpus-quality signal
  * (KenLM-style perplexity filtering, as used by CCNet/Gopher-class
  * pipelines): documents whose token transitions are improbable under a
  * model trained on the corpus itself (boilerplate, gibberish, wrong
  * language) score low and can be culled by threshold.
  *
  * Model: add-k smoothed bigram MLE,
  *   P(w2|w1) = (c(w1,w2) + k) / (c(w1) + k·V)
  * scored as the per-document mean natural-log probability over its
  * bigrams (higher = more typical text). exp(−mean) is the perplexity.
  *
  * Scale shape (100 TB): bigram extraction is NARROW (tokens array →
  * zip with its own tail — no posexplode self-join); both count tables
  * are vocabulary-bounded, not corpus-bounded, after one map-side-combined
  * groupBy each, so the scoring joins broadcast under AQE. The only
  * corpus-sized shuffle is the final per-doc aggregation.
  *
  * Oracle parity: each bigram log-prob is rounded to 6 decimals and
  * carried as an INTEGER micro-log (round(lp·1e6) as long, the
  * Dsir.scala pattern) so the per-doc sum is exact in any
  * partial-aggregation order — summing the rounded DOUBLES instead
  * would be partition-order dependent. The long sum is divided back
  * once at the end; the mean is rounded to 4.
  */
object NgramLm {

  private def toks(text: String) = split(trim(lower(col(text))), "\\s+")

  /** (w1, w2, cnt) bigram counts over the corpus — vocabulary²-bounded. */
  def bigramCounts(df: DataFrame, text: String): DataFrame =
    df.select(toks(text).as("__t"))
      .select(explode(arrays_zip(
        slice(col("__t"), lit(1), size(col("__t")) - 1).as("w1"),
        slice(col("__t"), lit(2), size(col("__t")) - 1).as("w2"))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))

  /** (w, cnt) unigram counts (all positions). */
  def unigramCounts(df: DataFrame, text: String): DataFrame =
    df.select(explode(toks(text)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** Per-document bigram stream (idCol, w1, w2) — shared by both
    * scorers so a tokenization fix propagates to each. */
  private def docBigrams(df: DataFrame, idCol: String, text: String): DataFrame =
    df.select(col(idCol), toks(text).as("__t"))
      .select(col(idCol), explode(arrays_zip(
        slice(col("__t"), lit(1), size(col("__t")) - 1).as("w1"),
        slice(col("__t"), lit(2), size(col("__t")) - 1).as("w2"))).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))

  /** Per-document mean bigram log-probability + perplexity under the
    * corpus-trained add-k model. Documents with < 2 tokens drop (no
    * bigrams to score). */
  def score(df: DataFrame, idCol: String, text: String,
            k: Double = 0.5): DataFrame = {
    val bi = bigramCounts(df, text)
    val uni = unigramCounts(df, text)
    val v = uni.agg(count(lit(1)).as("__v"))

    val docBigrams = NgramLm.docBigrams(df, idCol, text)

    // Scoring the training corpus ⇒ every (w1,w2) and w1 exists in the
    // count tables; joins stay inner. Both right sides are vocab-bounded
    // (AQE broadcasts them); the hint makes the intent explicit.
    val lp = docBigrams
      .join(broadcast(bi), Seq("w1", "w2"))
      .join(broadcast(uni.withColumnRenamed("cnt", "c1").withColumnRenamed("w", "w1")), Seq("w1"))
      .crossJoin(broadcast(v))
      .withColumn("__lpm", graft.expr.RoundHalfUpExpr.column(
        log((col("cnt") + lit(k)) / (col("c1") + lit(k) * col("__v"))) * 1e6).cast("long"))

    lp.groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        Funcs.r(sum(col("__lpm")) / lit(1e6) / count(lit(1))).as("avg_logprob"))
      .withColumn("perplexity", Funcs.r(exp(-col("avg_logprob"))))
  }

  /** Interpolated Kneser-Ney bigram scoring — the standard upgrade
    * over add-k for LM-based quality filtering (Kneser & Ney 1995;
    * the smoothing KenLM defaults to):
    *
    *   P(w2|w1) = max(c(w1,w2) − D, 0)/c(w1·) + λ(w1)·P_cont(w2)
    *   λ(w1)    = D·N1+(w1,·)/c(w1·)
    *   P_cont   = N1+(·,w2) / |distinct bigram types|
    *
    * with the literal discount D (0.75, the textbook value) and
    * c(w1·) = Σ_w2 c(w1,w2). Scoring the training corpus keeps every
    * count ≥ 1, so the max() never clips and P > 0 everywhere. The
    * continuation distribution Σ_w2 P(w2|w1) sums to exactly 1 — the
    * mass discounted from seen bigrams is redistributed by how many
    * distinct contexts each w2 completes, which is what makes KN beat
    * raw-frequency smoothing on bursty tokens.
    *
    * Scale shape: identical to [[score]] — all four model tables are
    * vocabulary-bounded one-pass aggregates broadcast to the
    * corpus-sized bigram stream; micro-log integer sums keep the
    * per-doc mean partial-aggregation-order exact.
    */
  def scoreKneserNey(df: DataFrame, idCol: String, text: String,
                     d: Double = 0.75): DataFrame = {
    val bi = bigramCounts(df, text)
    val fwd = bi.groupBy("w1")
      .agg(count(lit(1)).as("__n1f"), sum(col("cnt")).as("__c1"))
    val bwd = bi.groupBy("w2").agg(count(lit(1)).as("__n1b"))
    val t = bi.agg(count(lit(1)).as("__t"))

    val docBigrams = NgramLm.docBigrams(df, idCol, text)

    val lp = docBigrams
      .join(broadcast(bi), Seq("w1", "w2"))
      .join(broadcast(fwd), Seq("w1"))
      .join(broadcast(bwd), Seq("w2"))
      .crossJoin(broadcast(t))
      .withColumn("__lpm", graft.expr.RoundHalfUpExpr.column(log(
        (col("cnt") - lit(d)) / col("__c1") +
          lit(d) * col("__n1f") / col("__c1") * (col("__n1b") / col("__t"))) * 1e6).cast("long"))

    lp.groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        Funcs.r(sum(col("__lpm")) / lit(1e6) / count(lit(1))).as("kn_avg_logprob"))
      .withColumn("kn_perplexity", Funcs.r(exp(-col("kn_avg_logprob"))))
  }
}
