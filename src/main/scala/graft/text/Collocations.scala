package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Funcs.r

/** Bigram collocation extraction by pointwise mutual information — the
  * corpus-analysis companion to the bigram LM ([[NgramLm]]): pairs that
  * co-occur far more than their marginals predict ("new york",
  * "machine learning") surface as vocabulary candidates / quality
  * signals for the reference-style text pipeline.
  *
  * `pmi(w1,w2) = ln( c12·N / (c1·c2) )` over bigram POSITIONS, with
  * the contingency-consistent marginals (c1 = w1 as a bigram left,
  * c2 = w2 as a bigram right — both sum to N), gated by a minimum pair
  * count so rare-pair noise (PMI's known bias) drops out.
  *
  * Scale shape: same narrow bigram extraction as [[NgramLm]] (array
  * zip, no self-join), ONE map-side-combined groupBy to the
  * vocabulary²-bounded pair grain (pinned — the marginals, the mass
  * and the output all read it), marginals via windows partitioned by a
  * single token (vocabulary-bounded partitions), N via a broadcast
  * 1-row join. All counts integer-exact; the single `ln` rounds
  * through [[r]] on both engines.
  */
object Collocations {

  /** @return (w1, w2, cnt, pmi) for pairs with cnt ≥ minCount. */
  def pmi(df: DataFrame, text: String, minCount: Long): DataFrame = {
    val w1w = org.apache.spark.sql.expressions.Window.partitionBy(col("w1"))
    val w2w = org.apache.spark.sql.expressions.Window.partitionBy(col("w2"))
    val bc = NgramLm.bigramCounts(df, text).localCheckpoint(true)
    val n = bc.agg(sum(col("cnt")).as("__n"))
    bc
      .withColumn("__c1", sum(col("cnt")).over(w1w))
      .withColumn("__c2", sum(col("cnt")).over(w2w))
      .crossJoin(broadcast(n))
      .filter(col("cnt") >= minCount)
      .select(col("w1"), col("w2"), col("cnt"),
        r(log((col("cnt") * col("__n")) /
          (lit(1.0) * col("__c1") * col("__c2")))).as("pmi"))
  }
}
