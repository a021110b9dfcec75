package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`):
  * brute-force cosine top-k as the correctness baseline, and a
  * random-hyperplane LSH-bucketed variant as the 100 TB scale path
  * (candidates from a signature equi-join, exact cosine only on
  * candidates — never all-pairs).
  */
object Similarity {

  /** Dot product via the native codegen'd Catalyst expression
    * (graft.expr.DotProduct): a primitive double loop inside
    * whole-stage codegen. Spark's higher-order functions
    * (zip_with+aggregate) evaluate interpreted with per-row lambda
    * allocation — measurably slower on the dim·candidates ANN hot
    * path. Accumulation order is identical (left fold), so results are
    * bit-equal to the HOF formulation. */
  def dot(a: Column, b: Column): Column = graft.expr.VectorExpressions.dot(a, b)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; arrays are cast to double first so accumulation
    * order is the only (sub-ulp) divergence across engines. */
  def cosine(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    dot(ad, bd) / (l2Norm(ad) * l2Norm(bd))
  }

  /** Brute-force cosine top-k: every query vector against the whole
    * corpus. The query set rides a broadcast nested-loop join (queries
    * ≪ corpus — the corpus is NEVER replicated), then a per-query
    * window keeps the top k. Ranking runs on cosine rounded to 4
    * decimals with an id tiebreak so result order is stable across
    * engines and float-accumulation orders.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     corpusId: String = "vec_id", corpusVec: String = "embedding",
                     queryId: String = "query_id", queryVec: String = "query_vec"): DataFrame = {
    val joined = corpus.crossJoin(broadcast(queries))
      .filter(col(corpusId) =!= col(queryId))
      .withColumn("cos_sim", graft.functions.Funcs.r(cosine(col(corpusVec), col(queryVec))))
    val w = Window.partitionBy(col(queryId)).orderBy(col("cos_sim").desc, col(corpusId).asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryId), col(corpusId).as("neighbor_id"), col("cos_sim"),
        col("rank").cast("long").as("rank"))
  }

  /** Recall@k of an approximate top-k result against the exact one —
    * the standard ANN quality metric (what FAISS benchmarks report).
    * Both inputs are (query_id, neighbor_id, rank) frames (the
    * [[bruteForceTopK]]/[[lshTopK]]/Pq shapes); per query the fraction
    * of the exact top-k the approximate path recovered. A left join on
    * the query-grain result tables (both k-bounded tiny relative to
    * the corpus), then one aggregate — the metric costs nothing next
    * to the searches it evaluates. */
  def recallAtK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    val ex = exact.filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"))
    val ap = approx.filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("__hit"))
    ex.join(ap, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("__hit"), lit(0))).cast("long").as("n_hit"))
      .withColumn("recall",
        graft.functions.Funcs.r(col("n_hit").cast("double") / col("n_exact")))
  }

  /** Deterministic pseudo-random hyperplanes: plane p, dimension d ↦
    * a value in [−0.5, 0.5) derived from a 64-bit mix of (seed, p, d).
    * Generated driver-side as literals — tiny (planes × dim doubles).
    * Public so an oracle can embed the IDENTICAL plane constants. */
  def hyperplane(p: Int, dim: Int, seed: Long): Array[Double] =
    Array.tabulate(dim) { d =>
      var h = seed + p.toLong * 0x9E3779B97F4A7C15L + d.toLong * 0xC2B2AE3D27D4EB4FL
      h = (h ^ (h >>> 33)) * 0xFF51AFD7ED558CCDL
      h = (h ^ (h >>> 33)) * 0xC4CEB9FE1A85EC53L
      h = h ^ (h >>> 33)
      (h.toDouble / Long.MaxValue.toDouble) / 2.0
    }

  /** Random-hyperplane signature: bit p = sign(v · h_p). Returned as an
    * int (numPlanes ≤ 31 bits). The dot is ROUNDED (Funcs.r) before the
    * sign test, per the project's determinism convention: a dot within
    * 5e-5 of zero quantizes to exactly 0.0 in every engine, so a
    * sub-ulp summation-order difference can never flip a signature bit
    * (which would silently change the candidate set cross-engine). */
  def rhpSignature(vec: Column, dim: Int, numPlanes: Int = 16,
                   seed: Long = 42L): Column = {
    val vd = vec.cast("array<double>")
    (0 until numPlanes).map { p =>
      val plane = array(hyperplane(p, dim, seed).map(lit): _*)
      when(graft.functions.Funcs.r(dot(vd, plane)) > 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)
  }

  /** Long-packed random-hyperplane signature — bit p = sign(v · h_p),
    * same planes and the same rounded-dot sign rule as
    * [[rhpSignature]], but packed in a LONG so numPlanes may reach 62.
    * This is what lets the banded paths size their per-band width with
    * N ([[sizeLshWidth]]): at 16-plane Int packing the bucket space is
    * frozen and candidate pairs go quadratic (the r14 100× probe
    * measured 40.5B fan-out at 200k vectors); with width ≈ log₂(N) the
    * same probe measured 2.53M — linear. Bucket VALUES for any
    * numPlanes ≤ 31 are identical to the Int form (same bits, wider
    * register), so existing oracles are unaffected. */
  def rhpSignatureLong(vec: Column, dim: Int, numPlanes: Int,
                       seed: Long = 42L): Column = {
    require(numPlanes >= 1 && numPlanes <= 62,
      s"numPlanes must be in [1, 62], got $numPlanes")
    val vd = vec.cast("array<double>")
    (0 until numPlanes).map { p =>
      val plane = array(hyperplane(p, dim, seed).map(lit): _*)
      when(graft.functions.Funcs.r(dot(vd, plane)) > 0, lit(1L << p))
        .otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** N-aware per-band LSH width (the r14 100× probe's measured fix,
    * promoted to API): a FIXED width freezes the bucket space
    * (bands × 2^width), so per-bucket occupancy — and with it the
    * candidate-pair fan-out Σ_buckets C(n_b, 2) — grows linearly /
    * quadratically with corpus size (measured: 40.5B candidate pairs
    * at 200k vectors under the fixed 16-plane default). Sizing
    * width = ⌈log₂ n⌉ holds expected occupancy at O(1), which keeps
    * fan-out ~linear (measured: 2.53M pairs, 2.0× wall for 100×
    * vectors). Floor 8 preserves small-corpus recall (narrower bands
    * collide more); cap 30 keeps bands × width ≤ 62 long-signature
    * bits at the default two bands — past ~10⁹ vectors per job, shard
    * the corpus or move to the IVF path (nlist ≈ √N, q204/q106). */
  def sizeLshWidth(n: Long, floorWidth: Int = 8, capWidth: Int = 30): Int = {
    require(n > 0, s"corpus size must be positive, got $n")
    require(floorWidth >= 1 && capWidth >= floorWidth,
      s"need 1 <= floorWidth <= capWidth, got ($floorWidth, $capWidth)")
    val ceilLog2 = 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n - 1))
    math.min(capWidth, math.max(floorWidth, ceilLog2))
  }

  /** Candidate-pair fan-out of a banded RHP-LSH configuration,
    * WITHOUT running the join: Σ over (band, bucket) of C(n_b, 2) —
    * one signature pass + one aggregate, so it is safe to evaluate at
    * a scale where the join itself would be the wall. The detection
    * side of [[sizeLshWidth]]: size, measure, then run. */
  def lshBucketFanout(df: DataFrame, dim: Int, numPlanes: Int, bands: Int,
                      seed: Long = 42L, vecCol: String = "embedding"): Long = {
    val width = numPlanes / bands
    val mask = (1L << width) - 1
    df.withColumn("__sig", rhpSignatureLong(col(vecCol), dim, numPlanes, seed))
      .select(posexplode(array((0 until bands).map(b =>
        shiftright(col("__sig"), b * width).bitwiseAND(lit(mask))): _*)))
      .toDF("band", "bucket")
      .groupBy("band", "bucket").agg(count(lit(1)).as("n"))
      .agg(coalesce(sum((col("n") * (col("n") - 1) / lit(2)).cast("long")),
        lit(0L)))
      .head().getLong(0)
  }

  /** Embedding-cosine near-duplicate pairs: vectors with cosine ≥
    * threshold, candidates from random-hyperplane LSH bands (equi-join
    * on (band, bucket) — high-cosine pairs agree on many sign bits, so
    * band collisions catch them), exact cosine verify on candidates
    * only. Recall < 1 by construction (raise bands/lower width to push
    * it up); the all-pairs exact computation is the test oracle.
    *
    * The fixed 16-plane default keeps the historical (q107/q218)
    * candidate sets but does NOT scale: size `numPlanes`/`bands` with
    * the corpus via [[cosineNearDupesSized]] (or [[sizeLshWidth]]
    * directly) — the fixed bucket space goes quadratic in N. */
  def cosineNearDupes(df: DataFrame, dim: Int, threshold: Double = 0.95,
                      numPlanes: Int = 16, bands: Int = 8, seed: Long = 42L,
                      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val width = numPlanes / bands
    val mask = (1L << width) - 1
    val signed = df.withColumn("__sig", rhpSignatureLong(col(vecCol), dim, numPlanes, seed))
      .select(col(idCol), col(vecCol), posexplode(
        array((0 until bands).map(b =>
          shiftright(col("__sig"), b * width).bitwiseAND(lit(mask))): _*)))
      .toDF(idCol, vecCol, "band", "bucket")
    val a = signed.toDF("id_a", "__va", "band", "bucket")
    val b = signed.toDF("id_b", "__vb", "band", "bucket")
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("__va"), col("__vb")).distinct()
      .withColumn("cos_sim", graft.functions.Funcs.r(cosine(col("__va"), col("__vb"))))
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos_sim"))
  }

  /** IVF (inverted-file) approximate top-k: KMeans coarse quantization
    * partitions the corpus into `nlist` cells; each query probes its
    * `nprobe` nearest cells and exact cosine runs only within them —
    * candidates come from an equi-join on the cell id, never all-pairs.
    * The centroid table is tiny (nlist × dim) and broadcast; the corpus
    * assignment is one MLlib transform. Recall grows with nprobe;
    * brute force is the oracle.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4, seed: Long = 42L,
              corpusId: String = "vec_id", corpusVec: String = "embedding",
              queryId: String = "query_id", queryVec: String = "query_vec"): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    val assembled = corpus.withColumn("__v",
      array_to_vector(col(corpusVec).cast("array<double>")))
    val model = new KMeans().setK(nlist).setSeed(seed)
      .setFeaturesCol("__v").setPredictionCol("cell")
      .fit(assembled)
    val assigned = model.transform(assembled).drop("__v")
      .select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cvec"), col("cell"))
    // centroid table as literal rows -> broadcast equi-join for probing
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }.toSeq
      .toDF("cell", "centroid")
    val w = Window.partitionBy(col(queryId)).orderBy(col("__cdist").asc, col("cell").asc)
    val probed = queries.crossJoin(broadcast(centroids))
      .withColumn("__cdist",
        lit(1.0) - cosine(col(queryVec), col("centroid")))
      .withColumn("__crank", row_number().over(w))
      .filter(col("__crank") <= nprobe)
      .select(col(queryId).as("query_id"), col(queryVec).as("__qvec"), col("cell"))
    val cand = assigned.join(probed, Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos_sim", graft.functions.Funcs.r(cosine(col("__cvec"), col("__qvec"))))
    val rw = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    cand.withColumn("rank", row_number().over(rw))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"),
        col("rank").cast("long").as("rank"))
  }

  /** Portable fixed-iteration Lloyd centroids — the deterministic twin
    * of the MLlib-KMeans coarse quantizer (ivfTopK): seeds are the
    * `nlist` lowest-id vectors (TakeOrdered — bounded at any scale),
    * each round assigns by ROUNDED squared distance with a cell-id
    * tie-break and recomputes per-dim means ROUNDED to 4 decimals, so
    * every comparison input is bit-identical cross-engine and the whole
    * recursion admits an unrolled-CTE oracle (q204). Production IVF at
    * 100 TB seeds from a bounded sample the same way; iteration cost
    * per round is one broadcast of nlist×dim doubles + one fact pass.
    */
  def lloydCentroids(corpus: DataFrame, dim: Int, nlist: Int, iters: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.functions.Funcs.r
    val base = corpus.select(col(idCol).as("__id"),
      col(vecCol).cast("array<double>").as("__v"))
    val seeds = base.orderBy(col("__id").asc).limit(nlist)
    var cent = seeds
      .withColumn("cell",
        row_number().over(Window.orderBy(col("__id").asc)).cast("long") - 1)
      .select(col("cell"), transform(col("__v"), x => r(x)).as("__c"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      cent = assignCells(base, cent)
        .groupBy(col("cell"))
        .agg(array((0 until dim).map(d => r(avg(col("__v").getItem(d)))): _*).as("__c"))
        .localCheckpoint(true)
    }
    cent.select(col("cell"), col("__c").as("centroid"))
  }

  /** Nearest-cell assignment by rounded squared distance, cell-id
    * tie-break. One broadcast of the centroid table per call.
    * Package-visible: the portable SemDeDup ([[SemDedup.semDedupPortable]])
    * reuses the exact same assignment so its cells admit the q204 oracle. */
  private[sim] def assignCells(base: DataFrame, cent: DataFrame): DataFrame = {
    import graft.functions.Funcs.r
    val dist = r(dot(col("__v"), col("__v")) - lit(2.0) * dot(col("__v"), col("__c"))
      + dot(col("__c"), col("__c")))
    val w = Window.partitionBy(col("__id")).orderBy(col("__dist").asc, col("cell").asc)
    base.crossJoin(broadcast(cent))
      .withColumn("__dist", dist)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("__id"), col("__v"), col("cell"))
  }

  /** IVF top-k over the portable Lloyd cells: corpus assigned once,
    * queries probe their `nprobe` nearest cells, exact rounded cosine
    * + top-k on candidates only. Fully oracle-comparable, unlike the
    * MLlib-KMeans `ivfTopK` (engine-specific centers). */
  def ivfPortableTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
                      nlist: Int = 8, nprobe: Int = 2, iters: Int = 2,
                      corpusId: String = "vec_id", corpusVec: String = "embedding",
                      queryId: String = "query_id", queryVec: String = "query_vec"): DataFrame = {
    import graft.functions.Funcs.r
    val cent = lloydCentroids(corpus, dim, nlist, iters, corpusId, corpusVec)
      .select(col("cell"), col("centroid").as("__c"))
    val assigned = assignCells(
      corpus.select(col(corpusId).as("__id"),
        col(corpusVec).cast("array<double>").as("__v")), cent)
      .select(col("__id").as("neighbor_id"), col("__v").as("__cvec"), col("cell"))
    val qdist = r(dot(col("__qv"), col("__qv")) - lit(2.0) * dot(col("__qv"), col("__c"))
      + dot(col("__c"), col("__c")))
    val pw = Window.partitionBy(col("query_id")).orderBy(col("__dist").asc, col("cell").asc)
    val probed = queries
      .select(col(queryId).as("query_id"), col(queryVec).cast("array<double>").as("__qv"))
      .crossJoin(broadcast(cent))
      .withColumn("__dist", qdist)
      .withColumn("__rn", row_number().over(pw))
      .filter(col("__rn") <= nprobe)
      .select(col("query_id"), col("__qv"), col("cell"))
    val cand = assigned.join(probed, Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("__cvec"), col("__qv")).distinct()
      .withColumn("cos_sim", r(cosine(col("__cvec"), col("__qv"))))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"),
        col("rank").cast("long").as("rank"))
  }

  /** LSH-bucketed approximate top-k: corpus and queries are signed with
    * `numPlanes` hyperplane bits grouped into `bands`; vectors sharing
    * any band bucket become candidates (equi-join on (band, bucket)),
    * and exact cosine + top-k runs on candidates only. Recall < 1 by
    * construction — the scale path; brute force is the oracle.
    *
    * The fixed 16-plane default keeps the historical (q69) candidate
    * sets but does NOT scale: size the width with the corpus via
    * [[lshTopKSized]] (or [[sizeLshWidth]] directly) — a fixed bucket
    * space sends candidate fan-out quadratic in N. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
              numPlanes: Int = 16, bands: Int = 4, seed: Long = 42L,
              corpusId: String = "vec_id", corpusVec: String = "embedding",
              queryId: String = "query_id", queryVec: String = "query_vec"): DataFrame = {
    val width = numPlanes / bands
    val mask = (1L << width) - 1
    def banded(df: DataFrame, id: String, vec: String, outId: String, outVec: String) =
      df.withColumn("__sig", rhpSignatureLong(col(vec), dim, numPlanes, seed))
        .select(col(id).as(outId), col(vec).as(outVec),
          posexplode(array((0 until bands).map(b =>
            shiftright(col("__sig"), b * width).bitwiseAND(lit(mask))): _*)))
        .toDF(outId, outVec, "band", "bucket")
    val c = banded(corpus, corpusId, corpusVec, "neighbor_id", "__cvec")
    val q = banded(queries, queryId, queryVec, "query_id", "__qvec")
    val cand = c.join(q, Seq("band", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("__cvec"), col("__qvec"))
      .distinct()
      .withColumn("cos_sim", graft.functions.Funcs.r(cosine(col("__cvec"), col("__qvec"))))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"),
        col("rank").cast("long").as("rank"))
  }

  /** Sized width with the signature-capacity clamp: the scaladoc on
    * the sized entry points invites raising `bands` for recall, but
    * bands × width must stay ≤ 62 ([[rhpSignatureLong]]'s long
    * packing) — at the uncapped width of 30, bands ≥ 3 would throw the
    * signature-width assertion at runtime (r15 ADVICE). Clamp the cap
    * (and, for very large band counts, the floor) to ⌊62/bands⌋ so the
    * documented raise-bands-for-recall path always constructs a legal
    * signature; narrower bands collide more, which only ADDS recall. */
  private[graft] def sizedWidthFor(n: Long, bands: Int): Int = {
    require(bands >= 1 && bands <= 62, s"bands must be in [1, 62], got $bands")
    val cap = math.max(1, 62 / bands)
    sizeLshWidth(n, floorWidth = math.min(8, cap), capWidth = math.min(30, cap))
  }

  /** [[cosineNearDupes]] with the per-band width sized to the corpus
    * ([[sizeLshWidth]] — the r14 probe's measured linear-fan-out
    * recipe as the default instead of BENCH_NOTES prose). Pass `n`
    * when the caller already knows the corpus size; otherwise one
    * metadata-cheap `count()` fetches it (parquet row-group stats — no
    * data scan). Two bands (the probe's configuration) balance recall
    * against fan-out at scale; raise `bands` to push recall, each band
    * adds one signature slice and ~n/2^width·n candidates. */
  def cosineNearDupesSized(df: DataFrame, dim: Int, threshold: Double = 0.95,
                           n: Long = -1L, bands: Int = 2, seed: Long = 42L,
                           idCol: String = "vec_id",
                           vecCol: String = "embedding"): DataFrame = {
    val count = if (n > 0) n else df.count()
    val width = sizedWidthFor(count, bands)
    cosineNearDupes(df, dim, threshold, numPlanes = bands * width,
      bands = bands, seed = seed, idCol = idCol, vecCol = vecCol)
  }

  /** [[lshTopK]] with the per-band width sized to the CORPUS side
    * (candidate fan-out per query is Σ_bands corpus-bucket occupancy,
    * so the corpus count is the one that must set the width). Same
    * sizing contract as [[cosineNearDupesSized]]. */
  def lshTopKSized(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
                   n: Long = -1L, bands: Int = 2, seed: Long = 42L,
                   corpusId: String = "vec_id", corpusVec: String = "embedding",
                   queryId: String = "query_id",
                   queryVec: String = "query_vec"): DataFrame = {
    val count = if (n > 0) n else corpus.count()
    val width = sizedWidthFor(count, bands)
    lshTopK(corpus, queries, k, dim, numPlanes = bands * width,
      bands = bands, seed = seed, corpusId = corpusId, corpusVec = corpusVec,
      queryId = queryId, queryVec = queryVec)
  }
}
