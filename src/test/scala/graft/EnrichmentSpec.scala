package graft

import org.apache.spark.sql.functions._
import graft.etl.{Cleaning, Enrichment}

class EnrichmentSpec extends SparkSpec {
  import spark.implicits._

  private val fact = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (3L, 5.0)).toDF("pk", "qty")
  private val dim = Seq((1L, "A"), (2L, "B")).toDF("dk", "brand")

  test("enrich preserves all fact rows and Unknown-fills missing attributes") {
    val out = Enrichment.enrich(fact, dim, "pk", "dk")
    assert(out.count() == 4)
    val brands = out.select("brand").as[String].collect().sorted
    assert(brands.toSeq == Seq("A", "B", "Unknown", "Unknown"))
  }

  test("enrich with prefix namespaces the dimension payload columns (J2)") {
    val out = Enrichment.enrich(fact, dim, "pk", "dk", prefix = "pdv_")
    assert(out.columns.contains("pdv_brand"))
    assert(!out.columns.contains("brand"))
    val brands = out.select("pdv_brand").as[String].collect().sorted
    assert(brands.toSeq == Seq("A", "B", "Unknown", "Unknown"))
  }

  test("lossCheck reports zero loss for a left join against a unique dim") {
    val after = Enrichment.enrich(fact, dim, "pk", "dk")
    val r = Enrichment.lossCheck(fact, after, "qty").head()
    assert(r.getAs[Long]("rows_lost") == 0L)
    assert(r.getAs[Double]("vol_lost") == 0.0)
  }

  test("weekly aggregate buckets to Monday week starts") {
    val df = Seq(("2024-01-03", 5.0), ("2024-01-04", 7.0), ("2024-01-10", 1.0))
      .toDF("d", "qty").withColumn("d", to_date(col("d")))
    val out = Enrichment.weeklyAggregate(df, col("d"), Nil, col("qty"))
      .orderBy("week_start").collect()
    assert(out.length == 2)
    assert(out(0).getDate(0).toString == "2024-01-01") // Monday
    assert(out(0).getAs[Double]("qty_sum") == 12.0)
    assert(out(1).getDate(0).toString == "2024-01-08")
  }

  test("dedup keep-first is deterministic under the tiebreaker") {
    val df = Seq((1L, 2, "b"), (1L, 1, "a"), (2L, 9, "z")).toDF("k", "tb", "v")
    val kept = Cleaning.dedupKeepFirst(Seq("k"), Seq(col("tb")))(df)
      .orderBy("k").select("v").as[String].collect()
    assert(kept.toSeq == Seq("a", "z"))
  }

  test("quality report counts nulls, distincts and zeros in one pass") {
    val df = Seq(
      (Some(1.0), "x"), (None, "y"), (Some(0.0), "x")
    ).toDF("m", "s")
    val r = Cleaning.qualityReport(df, Seq("m")).head()
    assert(r.getAs[Long]("m_nulls") == 1L)
    assert(r.getAs[Long]("m_distinct") == 2L)
    assert(r.getAs[Long]("m_zeros") == 1L)
    assert(r.getAs[Long]("total_rows") == 3L)
  }
}
