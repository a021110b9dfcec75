package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Funcs.r

/** Fellegi–Sunter probabilistic record linkage (JASA 1969): score
  * blocked candidate pairs by per-field agreement evidence and
  * classify match / possible / non-match — the entity-resolution
  * operator that complements the text dedup family (those compare
  * CONTENT; this weighs structured FIELD agreement).
  *
  * The classical formulation sums log2(m/u) weights; logs are libm
  * calls that differ in last ulps across engines, so this
  * implementation works in LIKELIHOOD-RATIO form instead — the score
  * is the product of per-field ratios, which is order-isomorphic to
  * the log-weight sum and needs only · and /:
  *
  *   agree_f    = m_f · N(N−1) / Σ_v n_v(n_v−1)        (= m/u, one division)
  *   disagree_f = (1−m_f) · N(N−1) / (N(N−1) − Σ_v n_v(n_v−1))
  *
  * u_f (chance-agreement probability) is estimated exactly from the
  * field's value counts as integer sums; each ratio is rounded to the
  * 1e-6 grid, and the pair score re-rounds after every multiply, so
  * the whole scorer is engine-exact (q293 replays it in DuckDB).
  *
  * Scale shape: one tiny aggregate per field (value-frequency sums →
  * a 1-row stats frame, broadcast onto the pairs), then ONE equi-join
  * on the blocking key. Pair fan-out is O(Σ_b n_b²) — the caller's
  * blocking key choice bounds it, exactly like every other candidate
  * generator in this repo; nothing is ever all-pairs across blocks.
  */
object RecordLinkage {

  /** Score and classify blocked pairs. `fields`: (expression, m-prob)
    * per compared field — m is the P(agree | true match) prior, u is
    * estimated from the data. Every compared field must take at least
    * one repeated value (u > 0) and must not be constant (u < 1);
    * otherwise its likelihood ratio is ±∞ by construction — pick a
    * coarser/finer comparator instead. Emits only pairs with score ≥
    * `tauPossible` (the non-match mass is the overwhelming majority
    * and carries no information): (id_a < id_b, score, cls). */
  def fellegiSunter(df: DataFrame, idCol: Column, blockCol: Column,
                    fields: Seq[(Column, Double)],
                    tauPossible: Double = 10.0,
                    tauMatch: Double = 500.0): DataFrame = {
    val named = fields.zipWithIndex.map { case ((c, m), i) => (s"__f$i", c, m) }
    // the projected entity table has FIVE consumers (one frequency
    // aggregate per field + both sides of the pair join) — materialize
    // once so the source scan and comparator expressions don't re-run
    // per consumer (entity tables are dimension-grain)
    val base = df.select(Seq(idCol.as("__id"), blockCol.as("__blk")) ++
      named.map { case (n, c, _) => c.as(n) }: _*)
      .localCheckpoint(true)

    // one-row ratio frame: for each field, the rounded agree/disagree
    // likelihood ratios from exact integer frequency sums
    val nn = base.agg((count(lit(1)) * (count(lit(1)) - 1)).as("__nn"))
    val ratios = named.foldLeft(nn) { case (acc, (n, _, m)) =>
      val uSum = base.groupBy(col(n)).agg(count(lit(1)).as("__c"))
        .agg(sum(col("__c") * (col("__c") - 1)).as(s"__u$n"))
      acc.crossJoin(uSum)
        .withColumn(s"__ar$n",
          r(lit(m) * col("__nn") / col(s"__u$n"), 6))
        .withColumn(s"__dr$n",
          r(lit(1.0 - m) * col("__nn") / (col("__nn") - col(s"__u$n")), 6))
    }

    val a = base.alias("a")
    val b = base.alias("b")
    val pairs = a.join(b,
        col("a.__blk") === col("b.__blk") && col("a.__id") < col("b.__id"))
      .crossJoin(broadcast(ratios))
    val score = named.foldLeft(lit(1.0)) { case (acc, (n, _, _)) =>
      r(acc * when(col(s"a.$n") === col(s"b.$n"), col(s"__ar$n"))
        .otherwise(col(s"__dr$n")), 6)
    }
    pairs.select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        score.as("score"))
      .filter(col("score") >= tauPossible)
      .withColumn("cls",
        when(col("score") >= tauMatch, "match").otherwise("possible"))
  }
}
