package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, attach the payload of the right row
  * with the greatest time ≤ (inclusive) or < (strict) the left row's
  * time, per key. The operator Spark's DataFrame API lacks (pandas
  * `merge_asof`, DuckDB `ASOF JOIN`).
  *
  * Implementation is the union-and-carry trick, NOT a range self-join:
  * tag both sides, union, and per key take a running `last` of the
  * right payload over the merged time order. One hash exchange on the
  * key + one sort — the same cost as a single window pass, no
  * candidate blow-up, no skew amplification (a key's cost is linear in
  * its rows). At 100 TB this beats any join-based formulation: the
  * range condition never materializes pairs.
  *
  * The right payload travels as ONE struct so every attached column
  * comes from the SAME right row (per-column `last(ignoreNulls)` would
  * mix rows when a payload field is itself null).
  */
object AsOfJoin {

  /** @param payload right-side columns to attach (become `asof_<name>`;
    *                the matched right time is `asof_t`)
    * @param inclusive `true`: right rows at exactly the left time match
    *                  (DuckDB `>=`); `false`: strictly earlier only
    * @param forward  `false` (default): nearest earlier right row
    *                 (pandas direction='backward'); `true`: nearest
    *                 LATER right row (direction='forward') — the same
    *                 single carry pass with the merge order reversed
    * @param tolerance max allowed |leftTime − matchedTime| as a Column
    *                 in the time columns' cast-to-double units (seconds
    *                 for timestamps); matches farther away are nulled
    *                 out (pandas `tolerance`) */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String, payload: Seq[String],
           inclusive: Boolean = true, forward: Boolean = false,
           tolerance: Option[Column] = None): DataFrame = {
    // same reserved-name discipline as asOfNative: the carry machinery
    // overwrites __t/__r/__p/__match via withColumn and the output
    // attaches asof_t/asof_<payload>, so a left frame already carrying
    // any of them would be silently corrupted or ambiguous
    val reserved = Seq("__t", "__r", "__p", "__match", "asof_t") ++
      payload.map(c => s"asof_$c")
    val clash = left.columns.toSeq.intersect(reserved)
    require(clash.isEmpty,
      s"left frame already has reserved as-of column(s) $clash — rename " +
        "them before asOf")
    val rStruct = struct(
      col(rightTime).as("asof_t") +: payload.map(c => col(c).as(s"asof_$c")): _*)
    val rTag = right.select(keys.map(col) :+ col(rightTime).as("__t")
      :+ rStruct.as("__p"): _*).withColumn("__r", lit(1))
    val lTag = left.withColumn("__t", col(leftTime)).withColumn("__r", lit(0))
    val unioned = lTag.unionByName(rTag, allowMissingColumns = true)
    // at equal __t: inclusive puts the right row BEFORE the left row in
    // the running order (so `last` sees it); strict puts it after
    val rOrder = if (inclusive) col("__r").desc else col("__r").asc
    val tOrder = if (forward) col("__t").desc else col("__t").asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tOrder, rOrder)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__match", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__r") === 0)
    // Tolerance bound on integer microseconds: events carry micros-grain
    // timestamps, and |t − asof_t| in cast-to-double SECONDS is ~1 ulp
    // (~2e-7 s) inexact — a match exactly at the bound could flip vs an
    // integer-exact epoch_us comparison. `tol` stays in (possibly
    // fractional) seconds at the API; the arithmetic is exact longs, and
    // the seconds→micros conversion ROUNDS to the nearest microsecond —
    // a bare long cast would truncate, silently tightening e.g.
    // 1.5e-6 s to 1 µs.
    val bounded = tolerance match {
      case None => matched
      case Some(tol) => matched.withColumn("__match",
        when(abs(unix_micros(col("__t").cast("timestamp"))
          - unix_micros(col("__match.asof_t").cast("timestamp")))
          <= round(tol * lit(1000000L)).cast("long"), col("__match")))
    }
    bounded.select(left.columns.map(col) :+ col("__match.*"): _*)
  }

  /** The same as-of join through graft's native physical operator
    * ([[graft.plans.AsOfJoinPlan]] → [[graft.plans.AsOfJoinExec]]):
    * each side is hash-exchanged on the key and sorted on its OWN
    * narrow schema, then a streaming O(1)-state merge pass attaches
    * the match — vs [[asOf]]'s single sort of |L|+|R| union-padded
    * rows plus a window operator. Same signature, same output columns
    * (`asof_t`, `asof_<payload>`), same tolerance semantics.
    *
    * Semantics difference, documented: NULL keys and NULL times never
    * match here (SQL equality, DuckDB `ASOF JOIN` behavior), whereas
    * [[asOf]]'s window partitioning groups NULL keys together.
    *
    * Idempotently registers [[graft.plans.AsOfJoinStrategy]] on the
    * session (cluster deployments can instead set
    * `spark.sql.extensions=graft.GraftExtensions`). */
  def asOfNative(left: DataFrame, right: DataFrame, keys: Seq[String],
                 leftTime: String, rightTime: String, payload: Seq[String],
                 inclusive: Boolean = true, forward: Boolean = false,
                 tolerance: Option[Column] = None): DataFrame = {
    val spark = left.sparkSession
    GraftSqlBridge.addStrategy(spark, graft.plans.AsOfJoinStrategy)
    // Reserved output/internal names must be collision-free up front:
    // a left frame already carrying asof_t/asof_<payload> would make
    // the output (and the tolerance re-select, which resolves asof_t
    // by name) ambiguous, and duplicate generated right-side aliases
    // (e.g. payload "t" colliding with the asof_t time alias, or a
    // payload literally named "_rk_<key>") would silently bind the
    // wrong column. Same error style as the missing-column attr()
    // check below.
    val attached = "asof_t" +: payload.map(c => s"asof_$c")
    val leftClash = left.columns.toSeq.intersect(attached)
    require(leftClash.isEmpty,
      s"left frame already has reserved as-of output column(s) $leftClash — " +
        "rename them before asOfNative (they would make the attached " +
        "payload ambiguous)")
    val generated = keys.map(k => s"__rk_$k") ++ attached
    val genDups = generated.diff(generated.distinct).distinct
    require(genDups.isEmpty,
      s"as-of internal alias collision on $genDups — key/payload names " +
        "that render to the same __rk_/asof_ alias are not supported")
    // every right-side column re-aliased → fresh exprIds, so a
    // self-as-of (left and right reading the same source) can't
    // collide attributes across the two sides of the custom node
    val rSel = right.select(
      keys.map(k => col(k).as(s"__rk_$k")) ++
        (col(rightTime).as("asof_t") +:
          payload.map(c => col(c).as(s"asof_$c"))): _*)
    val (lPlan, rPlan) = (left.queryExecution.analyzed, rSel.queryExecution.analyzed)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column '$n' in ${p.output.map(_.name)}"))
    val node = graft.plans.AsOfJoinPlan(lPlan, rPlan,
      keys.map(attr(lPlan, _)), keys.map(k => attr(rPlan, s"__rk_$k")),
      attr(lPlan, leftTime), attr(rPlan, "asof_t"),
      attr(rPlan, "asof_t") +: payload.map(c => attr(rPlan, s"asof_$c")),
      inclusive, forward)
    val res = GraftSqlBridge.ofRows(spark, node)
    tolerance match {
      case None => res
      case Some(tol) => // identical micros-exact bound as [[asOf]]
        val ok = abs(unix_micros(col(leftTime).cast("timestamp"))
          - unix_micros(col("asof_t").cast("timestamp"))) <=
          round(tol * lit(1000000L)).cast("long")
        res.select(left.columns.map(col) ++
          ("asof_t" +: payload.map("asof_" + _)).map(c => when(ok, col(c)).as(c)): _*)
    }
  }
}
