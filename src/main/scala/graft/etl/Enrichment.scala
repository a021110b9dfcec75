package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dimension-enrichment joins J1/J2 and the weekly-grain aggregate A16 —
  * the spine the reference pipeline runs on
  * (reference: src/utils/data_loader.py:320-447 for the joins,
  * analyze_real_data.py:126-139 for the weekly grain).
  *
  * Scale shape: the fact side is never shuffled for an enrichment join —
  * dimensions are broadcast (products/stores ≪ fact at any scale); the
  * weekly aggregate is one shuffle on (week, keys) with map-side partial
  * aggregation, and shrinks the fact ~7× before feature engineering
  * (SURVEY §4: the canonical feature-store grain).
  */
object Enrichment {

  /** J1/J2 — LEFT enrichment join preserving ALL fact rows; missing
    * string attributes become "Unknown" (reference: data_loader.py:320-447
    * implements this as a hash-map lookup = broadcast-hash-join
    * semantics). `prefix` namespaces the dimension payload columns
    * (reference J2 prefixes `pdv_`).
    */
  def enrich(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
             prefix: String = "", unknown: String = "Unknown"): DataFrame = {
    val payload = dim.columns.filter(_ != dimKey)
    val renamed = dim.select(col(dimKey) +: payload.map(c => col(c).as(s"$prefix$c")): _*)
    val joined = fact.join(broadcast(renamed), fact(factKey) === renamed(dimKey), "left")
      .drop(renamed(dimKey))
    // Unknown-fill only string attribute columns, mirroring the
    // reference's fillna("Unknown") on categorical payloads (:354-360).
    val stringCols = renamed.schema.fields
      .filter(f => f.name != dimKey && f.dataType.typeName == "string").map(_.name)
    stringCols.foldLeft(joined)((d, c) => d.withColumn(c, coalesce(col(c), lit(unknown))))
  }

  /** Join-loss audit (reference "never lose rows" discipline,
    * data_loader.py:423-439): row count and measure volume before vs
    * after, as a 1-row report DataFrame. Caller asserts equality.
    */
  def lossCheck(before: DataFrame, after: DataFrame, measure: String): DataFrame = {
    val b = before.agg(count(lit(1)).as("rows_before"), sum(col(measure)).as("vol_before"))
    val a = after.agg(count(lit(1)).as("rows_after"), sum(col(measure)).as("vol_after"))
    b.crossJoin(a).withColumn("rows_lost", col("rows_before") - col("rows_after"))
      .withColumn("vol_lost", col("vol_before") - col("vol_after"))
  }

  /** A16 — the core weekly-grain aggregate: groupBy(week-start, keys)
    * sum/count of the measure (reference: analyze_real_data.py:126-139;
    * `desafio_hackathon.md:5` — the grain the whole forecast runs on).
    * `date_trunc('week')` = Monday-start, matching pandas Period('W-SUN')
    * start-of-week bucketing closely enough for engine semantics (the
    * reference uses ISO weeks downstream).
    */
  def weeklyAggregate(df: DataFrame, date: Column, keys: Seq[Column], measure: Column,
                      extraAggs: Seq[Column] = Nil): DataFrame =
    df.groupBy(to_date(date_trunc("week", date)).as("week_start") +: keys: _*)
      .agg(sum(measure).as("qty_sum"),
        (count(lit(1)).as("n_rows") +: extraAggs): _*)

  /** A20 — customer-proxy daily rollup: per (store, date) revenue, qty,
    * distinct products, avg transaction value
    * (reference: business_features_engine.py:500-512). */
  def dailyStoreRollup(df: DataFrame, store: Column, date: Column,
                       revenue: Column, qty: Column, product: Column): DataFrame =
    df.groupBy(store, to_date(date).as("day"))
      .agg(
        sum(revenue).as("revenue_sum"),
        sum(qty).as("qty_sum"),
        countDistinct(product).as("n_products"),
        avg(revenue).as("avg_tx_value"),
        count(lit(1)).as("n_tx"))
}
