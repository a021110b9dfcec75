package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{Funcs, PortableHash}

/** Bootstrap uncertainty estimation — the engine-side equivalent of the
  * reference's `BootstrapUncertainty` (model_calibration.py:401-460:
  * `n_bootstrap` resamples with a fixed random_state, one model fit per
  * resample, prediction spread across the fitted ensemble).
  *
  * The with-replacement multinomial needs mutable RNG state; the
  * engine-portable form is a keyed half-sample bootstrap: replicate b
  * keeps the rows whose `lehmer(rowKey·B + b)` falls under `frac` of
  * the modulus (the q114 detSample convention — same row, same
  * replicate, same decision in every engine, every run, any partition
  * order). Subsample bootstraps estimate the same sampling variability
  * as the with-replacement form up to a known scale factor, and make
  * the whole ensemble ONE dataframe:
  *
  *   explode b=1..B  →  hash filter  →  (key, b) aggregate  →  key agg
  *
  * Each replicate fits the per-series sample-mean model (the
  * reference's base_model under clone(); the mean is the
  * engine-expressible member — a richer member would slot into the
  * same (key, b) grain). The B replicate means then collapse per key
  * to the bootstrap mean, the replicate standard deviation (explicit
  * micro-int sufficient sums — no engine-private Welford), and the
  * exact-percentile band, mirroring `predict_with_uncertainty`'s
  * mean/std/percentile outputs.
  *
  * Scale shape: the explode multiplies rows by B before the shuffle —
  * B is a small literal (default 20), so the fan-out is a bounded
  * narrow map; both aggregates are hash-aggregates on (key, b) then
  * key. No window, no driver loop, no per-group materialization.
  * Replicates that lose every row of a key are simply absent (the
  * emitted n_reps records the surviving count), deterministically in
  * both engines.
  */
object Bootstrap {

  /** One row per key: boot_mean, boot_sd, boot_lo/boot_hi (the
    * (1±alpha)/2 exact percentiles across replicate means), n_reps.
    * `rowKey` must be a non-negative integral column unique per row
    * within a key (it seeds the per-replicate membership). */
  def meanBand(df: DataFrame, keyCols: Seq[String], rowKey: Column,
               valueCol: Column, b: Int = 20, frac: Double = 0.8,
               alpha: Double = 0.9): DataFrame = {
    require(b >= 2, "need at least two replicates")
    require(frac > 0 && frac < 1, "frac must lie in (0, 1)")
    val keys = keyCols.map(col)
    val lo = (1 - alpha) / 2
    val hi = 1 - lo
    val thr = (PortableHash.M31 * frac).toLong
    val reps = df.select(keys ++ Seq(rowKey.cast("long").as("__rk"),
        valueCol.cast("double").as("__v")): _*)
      .withColumn("__b", explode(array((1 to b).map(i => lit(i.toLong)): _*)))
      .filter(PortableHash.lehmer(col("__rk") * lit(b.toLong) + col("__b")) < lit(thr))
      .groupBy(keys :+ col("__b"): _*)
      .agg(Funcs.r(Funcs.microMean(col("__v"))).as("__m"))
    // replicate means are 4dp-grid; accumulate their sufficient sums
    // exactly (micro-ints in decimal) so the sd is partial-agg-order
    // independent — the house Theta/q221 convention
    val dec = "decimal(38,0)"
    val mMicro = graft.expr.RoundHalfUpExpr.column(col("__m") * lit(1e4))
    val s = sum(mMicro.cast(dec)).cast("double") / lit(1e4)
    val ss = sum(mMicro.cast(dec) * mMicro.cast("long")).cast("double") / lit(1e8)
    val n = count(lit(1)).cast("double")
    reps.groupBy(keys: _*)
      .agg(count(lit(1)).as("n_reps"),
        Funcs.r(Funcs.microMean(col("__m"))).as("boot_mean"),
        Funcs.r(when(n > 1, sqrt(greatest((n * ss - s * s) / (n * (n - 1)),
          lit(0.0))))).as("boot_sd"),
        Funcs.r(expr(s"percentile(__m, $lo)")).as("boot_lo"),
        Funcs.r(expr(s"percentile(__m, $hi)")).as("boot_hi"))
  }
}
