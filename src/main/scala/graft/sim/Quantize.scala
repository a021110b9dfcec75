package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 quantization for embedding columns — the standard 4×
  * memory/IO reduction for ANN indexes and embedding transport at
  * corpus scale (a 100 TB float corpus stores its vectors int8 and
  * rescales on read; recall loss is the quantization noise, bounded by
  * the per-vector max-abs scale).
  *
  * Symmetric per-vector scheme: q_d = round(v_d · 127 / maxabs(v)),
  * dequantized as q_d · maxabs(v)/127. Everything is per-element
  * arithmetic on exact inputs (no summation), so the codes are
  * bit-identical cross-engine; the only rounding convention needed is
  * round-half-away-from-zero, which Spark's `round` and the common SQL
  * engines share.
  *
  * Scale shape: one narrow projection — no shuffle, no aggregation;
  * the per-vector max rides inside the row.
  */
object Quantize {

  /** Quantize to (id, dim, q, scale) grain: `q` the int8 code, `scale`
    * the per-vector dequantization factor (maxabs/127, rounded for
    * cross-engine output parity). Zero vectors quantize to all-zero
    * codes with scale 0. */
  def int8(df: DataFrame, idCol: String = "vec_id",
           vecCol: String = "embedding"): DataFrame = {
    val vd = col(vecCol).cast("array<double>")
    df.select(col(idCol), vd.as("__v"))
      .withColumn("__maxabs", array_max(transform(col("__v"), x => abs(x))))
      .select(col(idCol), col("__maxabs"),
        posexplode(col("__v")).as(Seq("dim", "__x")))
      .select(col(idCol), col("dim").cast("long").as("dim"),
        when(col("__maxabs") === 0, lit(0))
          .otherwise(round(col("__x") * lit(127) / col("__maxabs")).cast("int"))
          .as("q"),
        // UNROUNDED on purpose: maxabs/127 is a single correctly-rounded
        // division of exact inputs (no summation), identical in every
        // engine — and an exact scale keeps the dequantization error
        // bound at scale/2 instead of scale/2 + 127·roundoff.
        (col("__maxabs") / lit(127)).as("scale"))
  }

  /** Reconstruct an approximate value from a code row. */
  def dequantize(q: Column, scale: Column): Column = q * scale
}
