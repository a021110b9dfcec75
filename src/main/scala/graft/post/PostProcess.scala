package graft.post

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Calendar.businessRound
import graft.operators.{SeriesWindow, WindowFeatures}

/** Forecast post-processing chain M13 and business-rules orchestrator
  * M14 (reference: src/submissions/post_processor.py:66-330,
  * src/models/business_rules.py:71-1060): composable
  * `DataFrame => DataFrame` constraint steps applied in a configured
  * order. Stats-dependent caps (mean+kσ, quantile) compute a tiny agg
  * and broadcast it back — no per-row driver logic anywhere in the
  * chain, so the whole pipeline is one narrow pass at 100 TB.
  */
object PostProcess {

  type Step = DataFrame => DataFrame

  /** Non-negativity clip (post_processor.py:66-90). */
  def nonNegative(c: String): Step =
    df => df.withColumn(c, greatest(col(c), lit(0.0)))

  /** Hard cap (post_processor.py:92-110). */
  def hardCap(c: String, cap: Double): Step =
    df => df.withColumn(c, least(col(c), lit(cap)))

  /** Global mean+kσ cap (post_processor.py:112-133). */
  def sigmaCap(c: String, k: Double = 5.0): Step = { df =>
    val stats = df.agg(avg(col(c)).as("__mu"),
      graft.functions.Funcs.nanToNull(stddev(col(c))).as("__sd"))
    df.join(broadcast(stats))
      .withColumn(c, when(col("__sd").isNotNull,
        least(col(c), col("__mu") + lit(k) * col("__sd"))).otherwise(col(c)))
      .drop("__mu", "__sd")
  }

  /** Quantile cap at the q-th exact percentile (post_processor.py:200-240). */
  def quantileCap(c: String, q: Double = 0.99): Step = { df =>
    val stats = df.agg(percentile(col(c), lit(q)).as("__q"))
    df.join(broadcast(stats))
      .withColumn(c, least(col(c), col("__q")))
      .drop("__q")
  }

  /** W23 growth cap per series (post_processor.py:135-163). */
  def growthCap(c: String, sw: SeriesWindow, capMult: Double = 2.0): Step =
    df => df.withColumn(c, WindowFeatures.growthCap(col(c), capMult, sw))

  /** Seasonal adjustment: multiply by a per-bucket factor joined from a
    * small factor table (bucket, factor) (post_processor.py:242-330). */
  def seasonalAdjust(c: String, bucket: Column, factors: DataFrame): Step = { df =>
    df.withColumn("__bucket", bucket)
      .join(broadcast(factors.toDF("__bucket", "__factor")), Seq("__bucket"), "left")
      .withColumn(c, col(c) * coalesce(col("__factor"), lit(1.0)))
      .drop("__bucket", "__factor")
  }

  /** M14 MOQ rounding: quantities below the minimum order quantity
    * round to 0 or MOQ by nearest (business_rules.py:553-640). */
  def moqRound(c: String, moq: Double): Step =
    df => df.withColumn(c,
      when(col(c) <= 0, lit(0.0))
        .when(col(c) < moq, when(col(c) >= moq / 2, lit(moq)).otherwise(lit(0.0)))
        .otherwise(col(c)))

  /** M14 promo uplift: multiply flagged rows (business_rules.py:300-380). */
  def promoUplift(c: String, isPromo: Column, uplift: Double): Step =
    df => df.withColumn(c, when(isPromo, col(c) * lit(uplift)).otherwise(col(c)))

  /** M14 lifecycle dampening: scale down discontinued/declining series
    * (business_rules.py:400-470). */
  def lifecycleDampen(c: String, stage: Column, factors: Map[String, Double]): Step = {
    df =>
      val expr = factors.foldLeft(lit(1.0)) { case (acc, (s, f)) =>
        when(stage === s, lit(f)).otherwise(acc)
      }
      df.withColumn(c, col(c) * expr)
  }

  /** M14 capacity constraint: per-group (store) proportional scale-down
    * when the group's predicted total exceeds that group's capacity
    * limit (business_rules.py:163-215 — `limit / total_predicted`
    * scaling). `limits` is a small (group..., limit) dimension,
    * broadcast; the group total is an unbounded group frame — one
    * exchange on the group key, no driver loop over stores. */
  def capacityCap(c: String, groupCols: Seq[String], limits: DataFrame): Step = { df =>
    val w = org.apache.spark.sql.expressions.Window.partitionBy(groupCols.map(col): _*)
    df.join(broadcast(limits.toDF(groupCols :+ "__limit": _*)), groupCols, "left")
      .withColumn("__total", sum(col(c)).over(w))
      .withColumn(c,
        when(col("__limit").isNotNull && col("__total") > col("__limit"),
          col(c) * col("__limit") / col("__total")).otherwise(col(c)))
      .drop("__limit", "__total")
  }

  /** M14 market-share constraint: when the global predicted total
    * implies a market share above target, scale every row by
    * target/current (business_rules.py:727-775). One 1-row aggregate
    * broadcast back — never an eager driver-side sum. */
  def marketShareCap(c: String, totalMarketSize: Double, targetShare: Double): Step = { df =>
    val stats = df.agg(sum(col(c)).as("__tot"))
    df.join(broadcast(stats))
      .withColumn(c,
        when(col("__tot") / lit(totalMarketSize) > lit(targetShare),
          col(c) * lit(targetShare * totalMarketSize) / col("__tot")).otherwise(col(c)))
      .drop("__tot")
  }

  /** D14 integer business rounding, final step (business_rules.py:553-690). */
  def integerize(c: String): Step =
    df => df.withColumn(c, businessRound(col(c)).cast("double"))

  /** Apply a configured chain in order (the M13/M14 orchestrator). */
  def chain(steps: Seq[Step]): Step = df => steps.foldLeft(df)((d, s) => s(d))
}
