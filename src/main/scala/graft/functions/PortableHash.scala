package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Engine-portable deterministic hashing, built from pure 64-bit integer
  * arithmetic so any SQL engine (the DuckDB oracle included) computes
  * bit-identical values. Complements the engine-native family in
  * [[Funcs.hashBucket]] / `xxhash64` fingerprints: those are faster but
  * their values are Spark-specific (murmur3/xxhash), so they can serve
  * as blocking keys yet never as portable row identities.
  *
  * All builders are plain `Column` expressions — no UDFs — so they stay
  * inside whole-stage codegen and scale as a narrow map stage: no
  * shuffle, no state, embarrassingly parallel at 100 TB.
  *
  * Reference semantics: deterministic sampling / hash-partitioning of
  * `src/utils/data_loader.py:355-370` (pandas `.sample(random_state)` and
  * `hash(x) % n`), re-expressed with portable arithmetic instead of
  * engine-private hash functions.
  */
object PortableHash {

  /** Lehmer / Park–Miller modulus 2^31−1 (a prime; the multiplier 48271
    * is the MINSTD constant). */
  val M31 = 2147483647L

  /** Polynomial-hash modulus (1e9+7, prime) — keeps `acc*31 + c` far
    * below 2^63, so the fold never overflows a BIGINT in any engine. */
  val MPoly = 1000000007L

  /** Iterated Lehmer permutation of a non-negative integer key in
    * [0, 2^31−1). One round is a permutation but nearly linear over a
    * contiguous key range (small keys map to `48271·k`, biasing any
    * threshold test); three rounds break the linearity — measured ≈10.1%
    * of contiguous TPC-H orderkeys fall under a 10% threshold at sf0.01
    * AND sf0.1. Every intermediate stays < 2^31·48271 ≈ 1.0e14 < 2^63.
    */
  def lehmer(key: Column, rounds: Int = 3): Column =
    (0 until rounds).foldLeft(key.cast("long") % lit(M31)) {
      (h, _) => h * lit(48271L) % lit(M31)
    }

  /** Driver-side twin of [[lehmer]] for generating deterministic
    * constant streams (permutation coefficients, salt literals). */
  def lehmerLong(key: Long, rounds: Int = 3): Long =
    (0 until rounds).foldLeft(key % M31)((h, _) => h * 48271L % M31)

  /** Deterministic keyed sample: keeps rows whose `lehmer(key)` falls
    * under `frac` of the modulus. Same key → same decision in every
    * engine and every run (cluster-stable: all rows of one key are kept
    * or dropped together — sampling joins/groups stays consistent).
    * A pure filter: pushes down, no shuffle, no RNG state. */
  def detSample(df: DataFrame, key: Column, frac: Double): DataFrame =
    df.filter(lehmer(key) < lit((M31 * frac).toLong))

  /** Deterministic STRATIFIED sample: a per-stratum fraction (e.g.
    * downsample the dominant class, keep all of a rare one — the
    * class-rebalancing primitive of training-data pipelines). The
    * fraction ladder compiles to a codegen'd `when` chain (strata maps
    * are small by definition); rows in strata absent from the map get
    * `default`. Same key → same decision, so a key sampled in one
    * stratum is sampled consistently everywhere it appears. */
  def stratifiedSample(df: DataFrame, key: Column, strata: Column,
                       fracs: Map[String, Double],
                       default: Double = 0.0): DataFrame = {
    val thr = fracs.foldLeft(lit((M31 * default).toLong)) {
      case (acc, (s, f)) => when(strata === lit(s), lit((M31 * f).toLong)).otherwise(acc)
    }
    df.filter(lehmer(key) < thr)
  }

  /** Polynomial rolling hash of a string: fold `acc·31 + codepoint`
    * mod 1e9+7 over the characters. Portable across engines
    * (DuckDB: `list_reduce` over `ord` codepoints). Characters come from
    * explicit 1-based `substr` indexing, NOT `split(s, "")` — Java's
    * zero-width split keeps a trailing empty token whose `ascii` is 0,
    * which would silently fold one extra step vs other engines.
    * Empty strings hash to 0. */
  def polyHash(s: Column): Column =
    when(length(s) === 0, lit(0L)).otherwise(
      aggregate(
        transform(sequence(lit(1), length(s)), j => ascii(s.substr(j, lit(1)))),
        lit(0L),
        (acc, c) => (acc * lit(31L) + c) % lit(MPoly)))

  /** Portable hash bucket in [0, n) from a string key. */
  def polyBucket(s: Column, n: Int): Column = polyHash(s) % lit(n.toLong)

  /** Portable document fingerprint: minimum polynomial hash over
    * character `shingle`-grams (winnowing-lite). Unlike
    * `TextAnalysis.fingerprint` (xxhash64 — engine-private, faster),
    * this value is reproducible by any engine, so it can serve as a
    * cross-system document identity, not just a blocking key.
    * Documents shorter than `shingle` hash their whole text once.
    * Backed by the codegen'd Karp–Rabin expression
    * (graft.expr.PolyFingerprintExpr): O(len) rolling arithmetic inside
    * whole-stage codegen, vs the O(len·shingle) interpreted HOF form. */
  def polyFingerprint(text: Column, shingle: Int = 8): Column =
    graft.expr.PolyFingerprintExpr.column(text, shingle)

  /** The higher-order-function formulation of [[polyFingerprint]] —
    * the readable reference the codegen'd expression is pinned against
    * (PortableHashSpec) and the shape of the DuckDB oracle SQL. */
  def polyFingerprintHof(text: Column, shingle: Int = 8): Column = {
    val n = length(text) - lit(shingle - 1)
    array_min(transform(sequence(lit(1), greatest(n, lit(1))),
      i => polyHash(text.substr(i, lit(shingle)))))
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    * each row draws a deterministic uniform u ∈ (0,1) from `lehmer(key)`
    * and ranks by u^(1/w) — the top-k by that sort key are a weighted
    * sample (heavier rows win proportionally more often). The mixture-
    * sampling primitive of training-data pipelines ("sample documents
    * proportional to quality score"), with the repo's portability rules:
    * the sort key is rounded to 6 decimals and ties break on `key`, so
    * every engine picks the identical sample. Weights must be > 0. */
  def weightedSampleKey(key: Column, weight: Column): Column = {
    val u = (lehmer(key).cast("double") + lit(0.5)) / lit(M31.toDouble)
    Funcs.r(pow(u, lit(1.0) / weight), 6)
  }

  /** Per-group weighted top-k sample. With `groupCols` empty this is a
    * global TakeOrdered (scale-safe); otherwise one window per group
    * partition. Output keeps input columns + `sample_key` + `rank`. */
  def weightedSample(df: DataFrame, key: Column, weight: Column, k: Int,
                     groupCols: Seq[Column] = Seq.empty): DataFrame = {
    val keyed = df.withColumn("sample_key", weightedSampleKey(key, weight))
    if (groupCols.isEmpty)
      keyed.orderBy(col("sample_key").desc, key.asc).limit(k)
        .withColumn("rank", lit(null).cast("long"))
    else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(groupCols: _*)
        .orderBy(col("sample_key").desc, key.asc)
      keyed.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= k)
    }
  }
}
