package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Funcs

/** Ordered funnel analysis over an event stream: how many users reach
  * step 1, then step 2 AFTER step 1, then step 3 AFTER step 2 — the
  * standard product-analytics conversion query (and, for a training-data
  * pipeline, the shape of "sessions that viewed → clicked → purchased"
  * positive mining).
  *
  * Semantics: a user converts step k at the EARLIEST event of type
  * `steps(k)` at-or-after their step-(k−1) conversion time (ties allowed:
  * simultaneous events count, matching the usual inclusive definition).
  *
  * Scale shape: each step is a key-partitioned partial-aggregated min —
  * no windows, no per-user event lists; k steps cost k small
  * hash-aggregate + join rounds on the SAME user key (Catalyst reuses
  * the partitioning), each input pre-filtered to one event type.
  */
object Funnel {

  /** Per-user conversion times: one row per user that completed step 0,
    * with nullable `t0..t{k-1}` epoch-micros columns. */
  def userFunnel(events: DataFrame, userCol: String, typeCol: String,
                 tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty)
    var cur = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol))
      .agg(min(unix_micros(col(tsCol))).as("t0"))
    steps.zipWithIndex.drop(1).foreach { case (st, k) =>
      val nxt = events.filter(col(typeCol) === st)
        .select(col(userCol), unix_micros(col(tsCol)).as("__ts"))
      // conditional min (not a filter): a user whose step-k events all
      // precede t_{k-1} must keep their row with t_k = NULL
      cur = cur.join(nxt, Seq(userCol), "left")
        .groupBy((col(userCol) +: (0 until k).map(i => col(s"t$i"))): _*)
        .agg(min(when(col("__ts") >= col(s"t${k - 1}"), col("__ts"))).as(s"t$k"))
    }
    cur
  }

  /** Windowed funnel (ClickHouse `windowFunnel` semantics): step k
    * converts at the earliest step-k event at-or-after step k−1 AND
    * within `windowSec` of the user's step-0 time — late completions
    * fall out of the funnel. Same k-round aggregate/join shape as
    * [[userFunnel]], one extra broadcast-free predicate per round. */
  def userWindowFunnel(events: DataFrame, userCol: String, typeCol: String,
                       tsCol: String, steps: Seq[String], windowSec: Long): DataFrame = {
    require(steps.nonEmpty)
    var cur = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol))
      .agg(min(unix_micros(col(tsCol))).as("t0"))
    steps.zipWithIndex.drop(1).foreach { case (st, k) =>
      val nxt = events.filter(col(typeCol) === st)
        .select(col(userCol), unix_micros(col(tsCol)).as("__ts"))
      cur = cur.join(nxt, Seq(userCol), "left")
        .groupBy((col(userCol) +: (0 until k).map(i => col(s"t$i"))): _*)
        .agg(min(when(col("__ts") >= col(s"t${k - 1}") &&
          col("__ts") <= col("t0") + lit(windowSec * 1000000L), col("__ts")))
          .as(s"t$k"))
    }
    cur
  }

  /** Windowed-funnel summary: per step, users completing it in-window. */
  def windowFunnel(events: DataFrame, userCol: String, typeCol: String,
                   tsCol: String, steps: Seq[String], windowSec: Long): DataFrame = {
    val uf = userWindowFunnel(events, userCol, typeCol, tsCol, steps, windowSec)
    val rows = steps.zipWithIndex.map { case (st, k) =>
      uf.filter(col(s"t$k").isNotNull)
        .agg(count(lit(1)).as("n_users"))
        .select(lit(k.toLong).as("step"), lit(st).as("step_name"), col("n_users"))
    }
    rows.reduce(_ unionByName _)
  }

  /** Funnel summary: per step, users reaching it, conversion rate from
    * the previous step, and mean seconds from the previous step. */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String]): DataFrame = {
    val uf = userFunnel(events, userCol, typeCol, tsCol, steps).cache()
    val rows = steps.zipWithIndex.map { case (st, k) =>
      val reached = uf.filter(col(s"t$k").isNotNull)
      val agg = if (k == 0)
        reached.agg(count(lit(1)).as("n_users"),
          lit(null).cast("double").as("avg_sec_from_prev"))
      else
        reached.agg(count(lit(1)).as("n_users"),
          Funcs.r(avg((col(s"t$k") - col(s"t${k - 1}")) / lit(1000000.0)))
            .as("avg_sec_from_prev"))
      agg.select(lit(k.toLong).as("step"), lit(st).as("step_name"),
        col("n_users"), col("avg_sec_from_prev"))
    }
    rows.reduce(_ unionByName _)
  }
}
