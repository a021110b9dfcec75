package graft.model

import org.apache.spark.ml.recommendation.{ALS, ALSModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Collaborative-filtering recommendation over implicit co-purchase
  * counts (customer × part), and sequential-pattern mining over event
  * streams — the recommendation/mining face of the basket-analysis
  * family (A28/A29 co-occurrence gives item↔item lift; ALS gives
  * personalized user→item scores; PrefixSpan gives ordered patterns).
  *
  * Scale shape: ALS is MLlib's blocked alternating least squares —
  * factor matrices are block-partitioned, never driver-resident;
  * recommendForAllUsers is a blocked cross-product with per-block
  * top-k. PrefixSpan is the distributed projected-database algorithm.
  * Both are seeded for reproducibility; like the GBT/KMeans paths,
  * their outputs are model artifacts (spec-tested, not oracle-hashed).
  */
object Recommend {

  /** Implicit-feedback ALS on (user, item, strength) triples. */
  def fitAls(ratings: DataFrame, userCol: String, itemCol: String,
             ratingCol: String, rank: Int = 8, regParam: Double = 0.1,
             maxIter: Int = 10, seed: Long = 42L): ALSModel =
    new ALS()
      .setUserCol(userCol).setItemCol(itemCol).setRatingCol(ratingCol)
      .setImplicitPrefs(true).setRank(rank).setRegParam(regParam)
      .setMaxIter(maxIter).setSeed(seed)
      .setColdStartStrategy("drop")
      .fit(ratings)

  /** Top-k item recommendations per user as flat rows
    * (user, item, score, rank). */
  def recommendTopK(model: ALSModel, k: Int, userCol: String,
                    itemCol: String): DataFrame =
    model.recommendForAllUsers(k)
      .select(col(userCol), posexplode(col("recommendations")))
      .select(col(userCol), col("col")(itemCol).as(itemCol),
        col("col")("rating").cast("double").as("score"),
        (col("pos") + 1).cast("long").as("rank"))

  /** Frequent sequential patterns (MLlib PrefixSpan) over per-key
    * ordered item sequences. Input: one row per (key, ordered seq of
    * items); each item becomes a single-element itemset. Returns
    * (pattern string joined with '>', freq). */
  def sequentialPatterns(sequences: DataFrame, seqCol: String,
                         minSupport: Double, maxLength: Int = 4): DataFrame = {
    import org.apache.spark.ml.fpm.PrefixSpan
    val wrapped = sequences
      .select(transform(col(seqCol), x => array(x)).as("sequence"))
    new PrefixSpan()
      .setMinSupport(minSupport).setMaxPatternLength(maxLength)
      .setSequenceCol("sequence")
      .findFrequentSequentialPatterns(wrapped)
      .select(array_join(flatten(col("sequence")), ">").as("pattern"),
        col("freq"))
  }
}
