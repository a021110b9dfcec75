package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Funcs.r
import graft.sim.Similarity.dot

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search") — the billion-scale ANN compression the
  * IVF family composes with: each `dim`-float vector splits into `m`
  * subvectors, each subvector is vector-quantized against a per-subspace
  * codebook of `ksub` centroids, and the vector stores only its `m`
  * small codes. At 100 TB of fp32 embeddings this is the difference
  * between an index that fits in cluster memory and one that doesn't:
  * 64 floats (256 B) compress to m=8 one-byte codes (32×), and
  * asymmetric-distance (ADC) scoring needs only a per-query lookup
  * table of m·ksub floats — no corpus float is touched at query time.
  *
  * Portability discipline (the q204 recipe): codebooks are trained with
  * the fixed-iteration Lloyd of `Similarity.lloydCentroids`, per
  * subspace — seeds are the `ksub` lowest-id vectors' subvectors,
  * assignment is by ROUNDED expanded squared distance with a cell-id
  * tie-break, centroid means round to 4 decimals each round — so the
  * whole train→encode→score chain is bit-identical cross-engine and
  * admits an unrolled-CTE oracle (q263/q264).
  *
  * Scale shape: training touches the corpus once per Lloyd round
  * (m·ksub centroid rows broadcast, one fact pass, map-side-combinable
  * means); encoding is one broadcast join; ADC scoring joins the code
  * table to a (query × m·ksub) lookup table on the (sub, code) pair —
  * an equi-join whose probe side is the compressed codes, never the
  * raw floats. Production composes `adcTopK` with an IVF coarse
  * quantizer (`ivfPqTopK`) so the code scan covers only probed cells.
  */
object Pq {

  /** Long-form subvectors: one row per (id, sub) with the `dim/m`-float
    * slice. `dim` must be divisible by `m` (PQ's usual constraint). */
  def subvectors(df: DataFrame, dim: Int, m: Int,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(dim % m == 0, s"dim=$dim not divisible by m=$m")
    val d = dim / m
    df.select(col(idCol).as("__id"), col(vecCol).cast("array<double>").as("__v"))
      .select(col("__id"), explode(transform(sequence(lit(0), lit(m - 1)),
        s => struct(s.cast("int").as("sub"),
          slice(col("__v"), s * d + 1, lit(d)).as("subvec")))).as("__s"))
      .select(col("__id"), col("__s.sub").as("sub"), col("__s.subvec").as("subvec"))
  }

  /** Rounded expanded squared distance — the exact `assignCells` form
    * (v·v − 2·v·c + c·c), kept expanded so the oracle can reproduce it
    * term-for-term (the factored Σ(x−c)² form diverges under
    * cancellation near 0 and can flip an assignment at the rounding
    * boundary). */
  private def sqDist(v: Column, c: Column): Column =
    r(dot(v, v) - lit(2.0) * dot(v, c) + dot(c, c))

  /** Nearest-codebook-entry assignment per (id, sub): broadcast the
    * m·ksub codebook rows, rank by (rounded dist, cell). */
  private def assign(sub: DataFrame, codebooks: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("__id"), col("sub"))
      .orderBy(col("__dist").asc, col("cell").asc)
    sub.join(broadcast(codebooks), Seq("sub"))
      .withColumn("__dist", sqDist(col("subvec"), col("centroid")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("__id"), col("sub"), col("subvec"), col("cell"), col("__dist"))
  }

  /** Train per-subspace codebooks: (sub, cell, centroid). Seeds per
    * subspace are the `ksub` lowest-id vectors' subvectors (bounded
    * TakeOrdered at any corpus size); `iters` fixed Lloyd rounds with
    * rounded state. All m subspaces train in ONE frame — the per-round
    * cost is one fact pass + a broadcast of m·ksub·(dim/m) doubles. */
  def trainCodebooks(corpus: DataFrame, dim: Int, m: Int, ksub: Int, iters: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val d = dim / m
    val sub = subvectors(corpus, dim, m, idCol, vecCol)
    val seedIds = corpus.select(col(idCol).as("__id"))
      .orderBy(col("__id").asc).limit(ksub)
      .withColumn("cell", row_number().over(Window.orderBy(col("__id").asc)).cast("long") - 1)
    var cb = sub.join(seedIds, Seq("__id"))
      .select(col("sub"), col("cell"),
        transform(col("subvec"), x => r(x)).as("centroid"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      cb = assign(sub, cb)
        .groupBy(col("sub"), col("cell"))
        .agg(array((0 until d).map(j => r(avg(col("subvec").getItem(j)))): _*).as("centroid"))
        .localCheckpoint(true)
    }
    cb.select(col("sub"), col("cell"), col("centroid"))
  }

  /** Encode the corpus against trained codebooks: one row per (id, sub)
    * with the winning `code` and its rounded quantization error (the
    * expanded squared distance the pick minimized). The long (id, sub)
    * grain IS the scale-friendly layout — ADC joins on (sub, code)
    * without unpacking arrays. */
  def encode(corpus: DataFrame, codebooks: DataFrame, dim: Int, m: Int,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    assign(subvectors(corpus, dim, m, idCol, vecCol), codebooks)
      .select(col("__id").as(idCol), col("sub"), col("cell").as("code"),
        col("__dist").as("quant_err"))

  /** Per-query lookup table: (query_id, sub, code, rounded subspace
    * dot) for every codebook entry — m·ksub rows per query. */
  private def buildLut(queries: DataFrame, codebooks: DataFrame, dim: Int, m: Int,
                       queryId: String, queryVec: String): DataFrame =
    subvectors(queries, dim, m, queryId, queryVec)
      .select(col("__id").as("query_id"), col("sub"), col("subvec"))
      .join(broadcast(codebooks), Seq("sub"))
      .select(col("query_id"), col("sub"), col("cell").as("code"),
        r(dot(col("subvec"), col("centroid"))).as("__sim"))

  /** Shared ADC scoring tail: join candidates to the LUT, sum the
    * rounded subspace similarities exactly once per (query, neighbor),
    * rank per query. `cand` columns: [query_id,] neighbor_id, sub,
    * code; `joinKeys` selects the all-queries shape (sub, code) or the
    * per-query pre-pruned shape (query_id, sub, code). Queries and
    * corpus must share one id space — a neighbor whose id equals the
    * query id is treated as the query itself and excluded. */
  private def scoreCandidates(cand: DataFrame, lut: DataFrame,
                              joinKeys: Seq[String], k: Int): DataFrame = {
    val scored = cand.join(broadcast(lut), joinKeys)
      .filter(col("neighbor_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(r(sum(col("__sim"))).as("adc_score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("adc_score"),
        col("rank").cast("long").as("rank"))
  }

  /** ADC top-k: score every (query, corpus-id) pair by the sum of
    * per-subspace lookup-table similarities sim(q_sub, centroid[code]),
    * rank per query. `codes` is an `encode` output; the LUT is
    * (queries × m·ksub) rows, broadcast. The corpus side of the scoring
    * join carries ONLY (id, sub, code) — the compressed representation —
    * which is the point of PQ: at 100 TB the float vectors never move.
    * PRECONDITION (house ANN convention, as in Similarity.*TopK):
    * query ids live in the corpus id space — self-matches are excluded
    * by id equality, so external queries must carry ids disjoint from
    * the corpus (e.g. negative) or they silently lose the
    * same-numbered corpus vector. */
  def adcTopK(codes: DataFrame, codebooks: DataFrame, queries: DataFrame, k: Int,
              dim: Int, m: Int, corpusId: String = "vec_id",
              queryId: String = "query_id", queryVec: String = "query_vec"): DataFrame = {
    val lut = buildLut(queries, codebooks, dim, m, queryId, queryVec)
    val cand = codes.select(col(corpusId).as("neighbor_id"), col("sub"), col("code"))
    scoreCandidates(cand, lut, Seq("sub", "code"), k)
  }

  /** IVF-PQ: the FAISS-default composition. A coarse quantizer
    * (portable Lloyd over FULL vectors, `Similarity.lloydCentroids`)
    * buckets the corpus into `nlist` cells; queries probe their
    * `nprobe` nearest cells; ADC then scores only the codes inside
    * probed cells. Candidate generation is an equi-join on the cell id
    * — never an all-code scan — so query cost is
    * (corpus/nlist)·nprobe·m lookups. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
                m: Int = 4, ksub: Int = 4, iters: Int = 2,
                nlist: Int = 8, nprobe: Int = 2,
                corpusId: String = "vec_id", corpusVec: String = "embedding",
                queryId: String = "query_id", queryVec: String = "query_vec"): DataFrame = {
    val coarse = Similarity.lloydCentroids(corpus, dim, nlist, iters, corpusId, corpusVec)
      .select(col("cell"), col("centroid").as("__c"))
    // corpus cell assignment (same rounded-distance discipline)
    val cw = Window.partitionBy(col("__id")).orderBy(col("__dist").asc, col("cell").asc)
    val assigned = corpus
      .select(col(corpusId).as("__id"), col(corpusVec).cast("array<double>").as("__v"))
      .crossJoin(broadcast(coarse))
      .withColumn("__dist", sqDist(col("__v"), col("__c")))
      .withColumn("__rn", row_number().over(cw))
      .filter(col("__rn") === 1)
      .select(col("__id").as(corpusId), col("cell"))
    val codebooks = trainCodebooks(corpus, dim, m, ksub, iters, corpusId, corpusVec)
    val codes = encode(corpus, codebooks, dim, m, corpusId, corpusVec)
      .join(assigned, Seq(corpusId))
    val pw = Window.partitionBy(col("query_id")).orderBy(col("__dist").asc, col("cell").asc)
    val probed = queries
      .select(col(queryId).as("query_id"), col(queryVec).cast("array<double>").as("__qv"))
      .crossJoin(broadcast(coarse))
      .withColumn("__dist", sqDist(col("__qv"), col("__c")))
      .withColumn("__rn", row_number().over(pw))
      .filter(col("__rn") <= nprobe)
      .select(col("query_id"), col("cell"))
    // candidates: codes inside probed cells only. A corpus id lives in
    // exactly one cell and (query, cell) rows are unique, so the join
    // yields unique (query, id, sub, code) rows — no distinct needed.
    val cand = codes.join(probed, Seq("cell"))
      .select(col("query_id"), col(corpusId).as("neighbor_id"),
        col("sub"), col("code"))
    val lut = buildLut(queries, codebooks, dim, m, queryId, queryVec)
    scoreCandidates(cand, lut, Seq("query_id", "sub", "code"), k)
  }
}
