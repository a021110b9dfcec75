package graft

import org.apache.spark.sql.functions._
import graft.functions.PortableHash

class PortableHashSpec extends SparkSpec {
  import spark.implicits._

  test("polyHash matches a reference JVM fold (no trailing-empty-token drift)") {
    val rows = Seq("a", "ab", "graft", "the quick brown fox").toDF("s")
    val got = rows.select(col("s"), PortableHash.polyHash(col("s")).as("h"))
      .as[(String, Long)].collect().toMap
    def ref(s: String): Long = s.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % PortableHash.MPoly)
    got.foreach { case (s, h) => assert(h == ref(s), s"polyHash('$s')") }
  }

  test("polyHash of empty string is 0") {
    val h = Seq("").toDF("s").select(PortableHash.polyHash(col("s"))).as[Long].head()
    assert(h == 0L)
  }

  test("lehmer is deterministic and spreads a contiguous key range") {
    val keys = spark.range(1, 10001).toDF("k")
    val frac = keys.select(PortableHash.lehmer(col("k")).as("h"))
      .filter(col("h") < lit((PortableHash.M31 / 10))).count() / 10000.0
    // 3 rounds break the one-round linearity (one round gives ~30% on
    // contiguous keys); expect ≈10% within a loose tolerance
    assert(frac > 0.07 && frac < 0.13, s"frac=$frac")
  }

  test("detSample keeps all-or-none of the rows sharing a key") {
    val df = spark.range(0, 2000).select((col("id") % 500).as("k"), col("id").as("v"))
    val sampled = PortableHash.detSample(df, col("k"), 0.2)
    val perKey = sampled.groupBy("k").count().select("count").as[Long].collect()
    assert(perKey.forall(_ == 4L)) // every surviving key keeps its 4 rows
  }

  test("stratifiedSample applies per-stratum fractions; unknown strata use default") {
    val df = spark.range(0, 30000)
      .select(col("id").as("k"),
        when(col("id") % 3 === 0, "big").when(col("id") % 3 === 1, "small")
          .otherwise("unknown").as("s"))
    val out = PortableHash.stratifiedSample(df, col("k"), col("s"),
      Map("big" -> 0.5, "small" -> 0.05))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(out.getOrElse("unknown", 0L) == 0L)            // default 0.0
    assert(out("big") > 4000 && out("big") < 6000)        // ≈ 5000
    assert(out("small") > 250 && out("small") < 750)      // ≈ 500
  }

  test("same key gets the same decision in every stratum it appears in") {
    val df = Seq((7L, "a"), (7L, "b"), (8L, "a"), (8L, "b")).toDF("k", "s")
    val kept = PortableHash.stratifiedSample(df, col("k"), col("s"),
      Map("a" -> 0.5, "b" -> 0.5)).select("k").as[Long].collect()
    // equal fractions → per-key all-or-nothing across strata
    assert(kept.groupBy(identity).values.forall(g => g.length == 2))
  }

  test("polyFingerprint equals min over shingle polyHashes (JVM reference)") {
    val texts = Seq("abcdefghijk", "the quick brown fox jumps")
    def ref(s: String): Long =
      s.sliding(8).map(g => g.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % PortableHash.MPoly)).min
    val got = texts.toDF("text")
      .select(col("text"), PortableHash.polyFingerprint(col("text")).as("fp"))
      .as[(String, Long)].collect().toMap
    texts.foreach(t => assert(got(t) == ref(t), s"fp('$t')"))
  }

  test("codegen'd Karp-Rabin fingerprint is value-identical to the HOF reference") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(200)
    val diff = docs.select(
      PortableHash.polyFingerprint(col("text")).as("fast"),
      PortableHash.polyFingerprintHof(col("text")).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(diff == 0L)
    // edge cases: shorter than / equal to the shingle width, empty
    val edges = Seq("", "ab", "abcdefgh", "abcdefghi").toDF("text")
    val rows = edges.select(
      PortableHash.polyFingerprint(col("text")).as("fast"),
      PortableHash.polyFingerprintHof(col("text")).as("ref"))
      .as[(Long, Long)].collect()
    rows.foreach { case (f, r) => assert(f == r) }
  }

  test("polyBucket lands in [0, n)") {
    val b = Seq("x", "yy", "zzz").toDF("s")
      .select(PortableHash.polyBucket(col("s"), 16).as("b")).as[Long].collect()
    assert(b.forall(x => x >= 0 && x < 16))
  }

  test("MinHashSigExpr equals the HOF reference formulation per element") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(length(col("text")) >= 4).limit(100)
    // the interpreted reference the expression replaced (kept here as
    // the semantics pin): distinct shingle polyHashes, then per-
    // permutation array_min
    val hs = array_distinct(transform(
      sequence(lit(1), length(col("text")) - 3),
      i => PortableHash.polyHash(col("text").substr(i, lit(4)))))
    val ref = array((0 until 32).map(i =>
      array_min(transform(hs,
        h => (lit(PortableHash.lehmerLong(i + 1L)) * h +
          lit(PortableHash.lehmerLong(10000L + i))) % lit(PortableHash.M31)))): _*)
    val diff = docs.select(
      graft.expr.MinHashSigExpr.column(col("text"), 4, 32).as("fast"),
      ref.as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(diff == 0L)
    // short-text edge: empty array below the gram width
    val short = Seq("abc").toDF("text")
      .select(size(graft.expr.MinHashSigExpr.column(col("text"), 4, 32)))
      .as[Int].head()
    assert(short == 0)
  }
}
