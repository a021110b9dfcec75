package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Funcs

/** Fellegi-Sunter record-linkage scoring: candidate pairs from a
  * blocking key, scored by summing per-field agreement weights
  * log₂(m/u) (agree) or log₂((1−m)/(1−u)) (disagree), where m/u are
  * the field's match/unmatch agreement probabilities. The entity-
  * resolution counterpart of the text-dedup family (same
  * block-then-verify shape as MinHash→Levenshtein: candidates come
  * from an equi-join on the block key, never all-pairs).
  */
object RecordLinkage {

  /** A comparison field: (agreementPredicate over a-side/b-side
    * columns, m, u). */
  final case class FieldCmp(agree: Column, m: Double, u: Double) {
    def weight: Column =
      when(agree, lit(math.log(m / u) / math.log(2.0)))
        .otherwise(lit(math.log((1 - m) / (1 - u)) / math.log(2.0)))
  }

  /** Block on `blockCols`, pair each record with every later record in
    * its block (idCol ordering), score with the field weights, keep
    * pairs with score ≥ threshold. Column names on the b-side get a
    * `b_` prefix for the field predicates. */
  def linkPairs(df: DataFrame, idCol: String, blockCols: Seq[String],
                fields: Seq[FieldCmp], threshold: Double): DataFrame = {
    val score = fields.map(_.weight).reduce(_ + _)
    val a = df
    val b = df.columns.foldLeft(df)((d, c) =>
      if (blockCols.contains(c)) d else d.withColumnRenamed(c, s"b_$c"))
    a.join(b, blockCols)
      .filter(col(idCol) < col(s"b_$idCol"))
      .withColumn("match_score", Funcs.r(score))
      .filter(col("match_score") >= threshold)
      .select(col(idCol).as("id_a"), col(s"b_$idCol").as("id_b"),
        col("match_score"))
  }
}
