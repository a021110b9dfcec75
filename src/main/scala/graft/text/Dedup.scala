package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Deduplication operators for training-data pipelines: exact, word
  * n-gram Jaccard, MinHash+LSH and SimHash near-dup detection.
  *
  * Scale discipline (the whole point at 100 TB): candidate pairs are
  * ALWAYS produced by an equi-join on a blocking key (shingle, LSH
  * band signature, SimHash chunk) — never an all-pairs cross join. The
  * verify step then runs only on candidates.
  */
object Dedup {

  /** Persist a fact-sized intermediate (shingle/signature table) reused
    * across the candidate-generation and verify stages. Default
    * MEMORY_AND_DISK: at 100 TB the shingle table is LARGER than the
    * corpus, so memory-only caching would thrash the block manager —
    * spill-to-disk keeps reuse without eviction storms. Pass
    * StorageLevel.NONE to skip persistence and recompute instead. */
  private def persisted(df: DataFrame, level: StorageLevel): DataFrame =
    if (level == StorageLevel.NONE) df else df.persist(level)

  /** Exact dedup on a content column, deterministic keep-first by
    * tiebreaker (usually the id). Skew-safe by construction: the winner
    * row per content group comes from a PARTIAL-AGGREGATED `min_by`
    * (map-side combine collapses a text duplicated a million times —
    * the exact situation dedup exists for — to one candidate per input
    * partition before the shuffle), not a window that would route every
    * copy to one task. Groups key on (64-bit hash, content) so the
    * exchange hashes 8 bytes while collisions still split on the true
    * content. */
  def exactDedup(df: DataFrame, content: String, tiebreak: Seq[Column]): DataFrame = {
    val winner = min_by(struct(df.columns.map(col): _*), struct(tiebreak: _*))
    df.groupBy(xxhash64(col(content)), col(content))
      .agg(winner.as("__row"))
      .select(df.columns.map(c => col("__row").getField(c).as(c)): _*)
  }

  /** Distinct word n-gram shingles per document: (id, shingle) long
    * table. The shingle is hashed to 64 bits so the exploded table and
    * the join exchange stay narrow. */
  def shingles(df: DataFrame, id: String, text: String, n: Int = 3): DataFrame = {
    val ws = TextAnalysis.tokens(col(text))
    val grams = when(size(ws) >= n,
      transform(sequence(lit(1), size(ws) - (n - 1)),
        i => xxhash64(concat_ws(" ", slice(ws, i, lit(n))))))
      .otherwise(array(xxhash64(concat_ws(" ", ws))))
    df.select(col(id), explode(array_distinct(grams)).as("shingle"))
  }

  /** Exact n-gram Jaccard near-dup pairs ≥ threshold. Candidate pairs
    * come from a PREFIX-FILTERED shingle equi-join (AllPairs/PPJoin
    * family): order each doc's shingles by ascending global document
    * frequency; a pair with Jaccard ≥ t MUST share a shingle within the
    * first ⌊(1−t)·|d|⌋+1 shingles of each doc, so only that prefix
    * participates in candidate generation — the frequent-shingle
    * blowup (every doc sharing "the same common 3-gram") never reaches
    * the join. Verification then counts the FULL intersection for
    * candidates only. Exactness is preserved; at 100 TB this is the
    * difference between a bounded join and a quadratic one. */
  def ngramJaccardPairs(df: DataFrame, id: String, text: String, n: Int = 3,
                        threshold: Double = 0.8,
                        storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val sh = persisted(shingles(df, id, text, n), storage)
    val sizes = sh.groupBy(col(id)).agg(count(lit(1)).as("sz"))
    // global doc-frequency rank per shingle → prefix = rarest shingles
    val dfreq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("__df"))
    val ranked = sh.join(dfreq, "shingle")
      .withColumn("__pos", row_number().over(
        Window.partitionBy(col(id)).orderBy(col("__df").asc, col("shingle").asc)))
      .join(broadcast(sizes), id)
      // +2, not the theoretical +1: (1−t)·|d| is computed in floating
      // point, and when it lands near an integer the floor can
      // under-count by one and silently drop a qualifying pair (seen at
      // sf0.1). One extra prefix element costs a few candidates and
      // restores the exactness guarantee under float jitter.
      .filter(col("__pos") <= floor(lit(1.0 - threshold) * col("sz")) + 2)
      .select(col(id), col("shingle"))
    val a = ranked.toDF("id_a", "shingle")
    val b = ranked.toDF("id_b", "shingle")
    val cand = a.join(b, "shingle").filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    // full-intersection verify on candidates only
    val fullA = sh.toDF("id_a", "shingle")
    val fullB = sh.toDF("id_b", "shingle")
    val inter = cand.join(fullA, "id_a").join(fullB, Seq("id_b", "shingle"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_common"))
    inter
      .join(broadcast(sizes.toDF("id_a", "sz_a")), "id_a")
      .join(broadcast(sizes.toDF("id_b", "sz_b")), "id_b")
      .withColumn("jaccard",
        col("n_common") / (col("sz_a") + col("sz_b") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("n_common"), col("sz_a"), col("sz_b"),
        col("jaccard"))
  }

  /** MinHash signatures: for each of `numHashes` seeded hash functions,
    * the minimum over the document's shingles. Returned as (id,
    * sig ArrayType(Long)). One shuffle on id. */
  def minHashSignatures(sh: DataFrame, id: String, numHashes: Int = 32): DataFrame = {
    val mins = (0 until numHashes).map(s =>
      min(xxhash64(col("shingle"), lit(s))).as(s"h$s"))
    sh.groupBy(col(id))
      .agg(mins.head, mins.tail: _*)
      .select(col(id), array((0 until numHashes).map(s => col(s"h$s")): _*).as("sig"))
  }

  /** MinHash LSH candidate pairs: signatures are split into `bands`
    * bands of numHashes/bands rows; docs agreeing on any full band
    * become candidates (equi-join on (band, bandHash) — never
    * all-pairs). Estimated Jaccard = matching signature positions. */
  def minHashCandidates(df: DataFrame, id: String, text: String,
                        n: Int = 3, numHashes: Int = 32, bands: Int = 8,
                        minEstJaccard: Double = 0.5,
                        storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val rows = numHashes / bands
    val sigs = persisted(minHashSignatures(shingles(df, id, text, n), id, numHashes), storage)
    val banded = sigs.select(col(id), posexplode(
      transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows)).cast("string"), b))))
      .toDF(id, "band", "band_hash")
      .distinct()
    val a = banded.toDF("id_a", "band", "band_hash")
    val b = banded.toDF("id_b", "band", "band_hash")
    val cand = a.join(b, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    cand
      .join(sigs.toDF("id_a", "sig_a"), "id_a")
      .join(sigs.toDF("id_b", "sig_b"), "id_b")
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast("double") / lit(numHashes.toDouble))
      .filter(col("est_jaccard") >= minEstJaccard)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
  }

  /** PORTABLE MinHash-LSH candidates: the same band-bucket shape as
    * [[minHashCandidates]] but every hash is engine-portable integer
    * arithmetic (graft.functions.PortableHash) instead of xxhash64 —
    * char-`gram` shingles hash polynomially, `numHashes` universal
    * permutations `(a_i·h + b_i) mod 2^31−1` (a_i, b_i from the
    * iterated-Lehmer stream) take the shingle-set minimum, and band
    * keys fold the signature slice polynomially. Any engine reproduces
    * the exact candidate set — the cross-system dedup contract the
    * xxhash64 variant (faster; values engine-private) cannot give.
    * Same scale shape: narrow per-doc signature pass, equi-join on
    * (band, key), never all-pairs. */
  def minHashCandidatesPortable(df: DataFrame, id: String, text: String,
                                gram: Int = 4, numHashes: Int = 32,
                                bands: Int = 8): DataFrame = {
    import graft.functions.PortableHash.MPoly
    val rows = numHashes / bands
    // signature via the native codegen'd expression (one primitive
    // rolling pass; value-identical to the HOF transform/array_min
    // formulation — see graft.expr.MinHashSigExpr)
    val signed = df.filter(length(col(text)) >= gram)
      .withColumn("__sig",
        graft.expr.MinHashSigExpr.column(col(text), gram, numHashes))
    val banded = signed.select(col(id), posexplode(
      array((0 until bands).map { b =>
        aggregate(slice(col("__sig"), b * rows + 2, rows - 1),
          element_at(col("__sig"), b * rows + 1),
          (acc, x) => (acc * lit(31L) + x) % lit(MPoly))
      }: _*)))
      .toDF(id, "band", "bkey")
    val a = banded.toDF("id_a", "band", "bkey")
    val b = banded.toDF("id_b", "band", "bkey")
    a.join(b, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** PORTABLE SimHash (30-bit) + pigeonhole candidates: token hashes
    * come from the portable polynomial hash (30 usable bits — the
    * modulus is 1e9+7), bit votes and the sign fingerprint follow the
    * classic construction, and candidates block on 6 bands of 5 bits
    * (pigeonhole: any pair within hamming 5 shares a band; the wider
    * `maxHamming` filter then runs exactly on candidates). Every value
    * is engine-reproducible — the same query in DuckDB yields the
    * identical pair set — unlike [[simHash]]'s xxhash64 (faster,
    * engine-private). Same scale shape: one shuffle on id for votes,
    * equi-join on (band, key), never all-pairs. */
  def simHashCandidatesPortable(df: DataFrame, id: String, text: String,
                                maxHamming: Int = 10): DataFrame = {
    import graft.functions.PortableHash.polyHash
    val bits = 30
    val toks = df.select(col(id), explode(TextAnalysis.tokens(lower(col(text)))).as("tok"))
      .withColumn("h", polyHash(col("tok")))
    val votes = (0 until bits).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, lit(1L))
        .otherwise(lit(-1L))).as(s"b$i"))
    val fp = toks.groupBy(col(id))
      .agg(votes.head, votes.tail: _*)
      .select(col(id),
        (0 until bits).map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce(_ + _).as("fp"))
    val banded = fp.select(col(id), col("fp"), posexplode(
      array((0 until 6).map(b =>
        shiftright(col("fp"), b * 5).bitwiseAND(lit(31L))): _*)))
      .toDF(id, "fp", "band", "key")
    val a = banded.toDF("id_a", "fp_a", "band", "key")
    val b = banded.toDF("id_b", "fp_b", "band", "key")
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** SimHash 64-bit fingerprint: each token hashes to 64 bits; each bit
    * position accumulates +1/−1 votes weighted by token frequency; the
    * sign pattern is the fingerprint. Expressed as 64 conditional sums
    * over the exploded token table — one shuffle on id. */
  def simHash(df: DataFrame, id: String, text: String): DataFrame = {
    val toks = df.select(col(id), explode(TextAnalysis.tokens(lower(col(text)))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val votes = (0 until 64).map(i =>
      sum(when(col("h").bitwiseAND(lit(1L << i)) =!= 0L, lit(1L)).otherwise(lit(-1L))).as(s"b$i"))
    toks.groupBy(col(id))
      .agg(votes.head, votes.tail: _*)
      .select(col(id),
        (0 until 64).map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce(_.bitwiseOR(_)).as("simhash"))
  }

  /** Transitive dedup clustering: near-dup PAIRS (id_a, id_b) from any
    * of the candidate generators imply equivalence classes (a~b, b~c ⇒
    * one cluster). Connected components via GraphX give each doc its
    * cluster id (the minimum member id); keep-one-per-cluster is then a
    * trivial filter. The distributed closure step every real dedup
    * pipeline needs between "pairs found" and "rows dropped". */
  /** @param maxIterations cap on the label-propagation rounds. CC
    *   converges in O(diameter) rounds; near-dup graphs are usually
    *   star/clique-shaped (diameter ≤ ~4), but a pathological chain of
    *   pairwise-similar docs can stretch the diameter to the corpus
    *   size and stall the job at 100 TB. The cap bounds the worst case:
    *   an unconverged chain splits into a few adjacent clusters —
    *   slightly under-merged dedup, never a hung cluster. */
  def dedupClusters(pairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
                    maxIterations: Int = 20): DataFrame = {
    import org.apache.spark.graphx.{Edge, Graph}
    val spark = pairs.sparkSession
    import spark.implicits._
    val edges = pairs.select(col(idA).cast("long"), col(idB).cast("long"))
      .as[(Long, Long)].rdd.map { case (a, b) => Edge(a, b, ()) }
    val graph = Graph.fromEdges[Unit, Unit](edges, ())
    graph.connectedComponents(maxIterations).vertices
      .toDF("doc_id", "cluster_id")
  }

  /** Keep one representative per near-dup cluster: docs absent from any
    * cluster keep themselves; cluster members survive only if they ARE
    * the cluster id (the minimum member — deterministic). */
  def dropNearDupes(df: DataFrame, id: String, clusters: DataFrame): DataFrame =
    df.join(clusters, df(id) === clusters("doc_id"), "left")
      .filter(col("cluster_id").isNull || col("cluster_id") === df(id))
      .drop("doc_id", "cluster_id")

  /** Quality-aware cluster resolution: keep the BEST member of each
    * near-dup cluster by `quality` (descending, id ascending tie-break)
    * instead of dropNearDupes' arbitrary min-id rule — production
    * curation keeps the longest/cleanest copy, not the lowest id. One
    * row_number window on the cluster grain; singleton docs form their
    * own cluster and always survive. */
  def keepBest(df: DataFrame, id: String, clusters: DataFrame,
               quality: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cl = clusters.select(col("doc_id").as("__cl_id"),
      col("cluster_id").as("__cl_cluster"))
    val joined = df.join(cl, df(id) === col("__cl_id"), "left")
      .withColumn("__cid", coalesce(col("__cl_cluster"), df(id)))
    val w = Window.partitionBy(col("__cid")).orderBy(quality.desc, df(id).asc)
    joined.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__cl_id", "__cl_cluster", "__cid", "__rk")
  }

  /** SimHash near-dup candidates with Hamming distance ≤ maxHamming.
    * Blocking: the 64-bit fingerprint is cut into `chunks` pieces; by
    * pigeonhole, pairs within distance (chunks−1) share ≥1 exact chunk —
    * candidates come from the (chunkIdx, chunkValue) equi-join, then the
    * exact popcount filter runs on candidates only. */
  def simHashCandidates(df: DataFrame, id: String, text: String,
                        maxHamming: Int = 3, chunks: Int = 4,
                        storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val width = 64 / chunks
    val mask = (1L << width) - 1
    val sh = persisted(simHash(df, id, text), storage)
    val chunked = sh.select(col(id), col("simhash"),
      posexplode(array((0 until chunks).map(cix =>
        shiftright(col("simhash"), cix * width).bitwiseAND(lit(mask))): _*)))
      .toDF(id, "simhash", "chunk_idx", "chunk_val")
    val a = chunked.toDF("id_a", "sh_a", "chunk_idx", "chunk_val")
    val b = chunked.toDF("id_b", "sh_b", "chunk_idx", "chunk_val")
    a.join(b, Seq("chunk_idx", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b")).distinct()
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
