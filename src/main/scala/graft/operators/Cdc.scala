package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture apply: fold a change stream (insert / update /
  * delete ops with a monotone sequence) into a base snapshot — the
  * lakehouse MERGE that keeps a 100 TB table current from an incremental
  * feed (Delta/Iceberg merge-on-read compaction semantics).
  *
  * Scale shape: the change stream first collapses to ONE winner per key
  * with a partial-aggregated `max_by` (map-side combine; skew-safe — no
  * window over a hot key), then a single key-partitioned full-outer join
  * against the base applies it. Two exchanges total, both on the key.
  */
object Cdc {

  /** Apply `changes` to `base`. `changes` carries the base's payload
    * columns plus `seqCol` (monotone version; latest wins, ties broken by
    * larger seq only — callers supply a unique sequence) and `opCol`
    * ('I'/'U' upsert, 'D' delete). Keys never seen in `changes` keep
    * their base row; 'D' winners drop the key; 'I'/'U' winners replace
    * (or insert) the payload. */
  def applyChanges(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
                   seqCol: String, opCol: String): DataFrame = {
    val payload = base.columns.filterNot(keyCols.contains)
    val key = keyCols.map(col)

    // one winner per key: partial-agg max_by on the sequence
    val winner = changes.groupBy(key: _*)
      .agg(max_by(struct((payload.map(col) :+ col(opCol)): _*), col(seqCol))
        .as("__w"))
      .select(key ++ Seq(col("__w.*")): _*)

    val b = base.select((keyCols.map(c => col(c).as(s"__bk_$c")) ++
      payload.map(c => col(c).as(s"__b_$c"))): _*)
    val w = winner.select((keyCols.map(c => col(c).as(s"__wk_$c")) ++
      payload.map(c => col(c).as(s"__w_$c")) :+ col(opCol).as("__op")): _*)

    val joined = b.join(w,
      keyCols.map(c => col(s"__bk_$c") <=> col(s"__wk_$c")).reduce(_ && _),
      "full_outer")

    val out = joined
      // deletes win; unmatched winners with op D produce nothing
      .filter(col("__op").isNull || col("__op") =!= "D")
      .select(keyCols.map(c =>
        coalesce(col(s"__wk_$c"), col(s"__bk_$c")).as(c)) ++
        payload.map(c =>
          when(col("__op").isNotNull, col(s"__w_$c"))
            .otherwise(col(s"__b_$c")).as(c)): _*)
    out
  }
}
