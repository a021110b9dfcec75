package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Funcs

/** Edit-distance verification of near-duplicate candidate pairs: the
  * verify stage of fuzzy dedup. Candidates come from a blocked
  * generator (MinHash/SimHash band join — NEVER all-pairs); this stage
  * computes exact Levenshtein distance only on those pairs and keeps
  * the ones within a normalized edit-ratio budget.
  *
  * Levenshtein is the one classic string metric both Spark and DuckDB
  * implement identically (unit-cost insert/delete/substitute on code
  * points), so unlike hash-based candidate sets this verify output is
  * fully oracle-checkable cross-engine.
  *
  * Scale shape: two co-partitioned equi-joins attach the pair texts
  * (candidate and document sides both id-partitioned; nothing
  * corpus-sized is broadcast), then a per-row O(|a|·|b|) verify. The
  * quadratic cost is bounded by the blocking stage's candidate count —
  * the same budget every fuzzy-dedup pipeline (e.g. BigQuery/Dataflow
  * dedup recipes) runs at scale.
  */
object FuzzyVerify {

  /** Attach texts to candidate pairs (`id_a` < `id_b`) and keep pairs
    * with levenshtein(a,b) / max(|a|,|b|) ≤ `maxRatio`. */
  def editDistanceVerify(docs: DataFrame, candidates: DataFrame,
                         id: String, text: String,
                         maxRatio: Double = 0.3): DataFrame = {
    val ta = docs.select(col(id).as("id_a"), col(text).as("__ta"))
    val tb = docs.select(col(id).as("id_b"), col(text).as("__tb"))
    candidates.join(ta, Seq("id_a")).join(tb, Seq("id_b"))
      .withColumn("lev", levenshtein(col("__ta"), col("__tb")).cast("long"))
      .withColumn("edit_ratio", Funcs.r(col("lev") /
        greatest(length(col("__ta")), length(col("__tb"))).cast("double")))
      .filter(col("edit_ratio") <= maxRatio)
      .select(col("id_a"), col("id_b"), col("lev"), col("edit_ratio"))
  }
}
