package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Funcs

/** Difference-in-differences uplift: the causal-flavored promo/price
  * effect estimate the reference's discount-lift query (A25) stops
  * short of — comparing the treated group's pre→post change against
  * the control group's, which nets out shared time trends:
  *   DiD = (mean_T,post − mean_T,pre) − (mean_C,post − mean_C,pre).
  *
  * Scale shape: a single hash aggregate with four conditional
  * sum/count pairs — one pass over the fact, no joins, no windows.
  */
object Uplift {

  /** @param treated boolean column marking the treatment group.
    * @param post    boolean column marking the post period.
    * @return one row: the four cell means, the two deltas, and DiD. */
  def diffInDiff(df: DataFrame, treated: Column, post: Column,
                 value: Column): DataFrame = {
    def cell(t: Boolean, p: Boolean): Column = {
      val in = (treated === t) && (post === p)
      sum(when(in, value)) / sum(when(in, 1L))
    }
    val (mtPre, mtPost, mcPre, mcPost) =
      (cell(t = true, p = false), cell(t = true, p = true),
        cell(t = false, p = false), cell(t = false, p = true))
    df.agg(
      Funcs.r(mtPre).as("mean_t_pre"), Funcs.r(mtPost).as("mean_t_post"),
      Funcs.r(mcPre).as("mean_c_pre"), Funcs.r(mcPost).as("mean_c_post"),
      Funcs.r(mtPost - mtPre).as("delta_t"), Funcs.r(mcPost - mcPre).as("delta_c"),
      Funcs.r((mtPost - mtPre) - (mcPost - mcPre)).as("did"))
  }
}
