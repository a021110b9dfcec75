package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding (BPE) tokenizer training + encoding
  * (Sennrich et al. 2016) — the vocabulary-construction step of an LLM
  * data pipeline, run over the corpus the engine curates.
  *
  * Training scale shape (100 TB): the corpus collapses to its WORD
  * VOCABULARY first (one map-side-combined groupBy — vocabulary-bounded,
  * not corpus-bounded), and every merge iteration then runs on that
  * cached vocab frame only: adjacent-pair counts (narrow zip + explode →
  * vocab-sized groupBy), a 1-row argmax to the driver, and a codegen'd
  * array fold applying the merge. Corpus size only affects the initial
  * word count; iterations cost O(vocab), independent of corpus bytes.
  *
  * Encoding is per-row imperative logic (a loop over merge ranks per
  * word) — a genuine mapPartitions case; the merge table (≤ numMerges
  * entries) is broadcast.
  */
object Bpe {

  /** One learned merge: `left`+`right` → `left+right`, at 0-based `rank`. */
  final case class Merge(rank: Int, left: String, right: String)

  private def words(text: String): Column =
    explode(split(trim(lower(col(text))), "\\s+"))

  /** Replace every non-overlapping adjacent (a,b) by a+b, one
    * left-to-right pass — a codegen'd `aggregate` fold over the symbol
    * array (vocab-sized input, so the interpreted-HOF cost is bounded). */
  private def mergePass(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) => when(size(acc) > lit(0) &&
          element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - lit(1)), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Learn `numMerges` merges over the corpus word vocabulary, frequency-
    * weighted. Deterministic: ties break on (pair count desc, left asc,
    * right asc — unsigned UTF-8 byte order, matching Spark/DuckDB binary
    * string comparison). Stops early when no adjacent pair occurs twice.
    *
    * Two execution paths with IDENTICAL results (BpeSpec pins parity):
    * when the vocabulary fits `maxDriverVocab` entries the merge loop
    * runs driver-side over the collected (word, freq) table — the corpus
    * still collapses to its vocabulary DISTRIBUTED (one map-side-combined
    * groupBy; that is the only corpus-sized pass), and a vocab-bounded
    * loop on one machine is how production tokenizer trainers work
    * (numMerges driver round-trips of the distributed loop cost more
    * than the whole local computation). Corpora whose vocabulary
    * overflows the bound fall back to the fully-distributed loop:
    * per-iteration pair counts as a vocab-grain aggregate, a 1-row
    * argmax, and a codegen'd array-fold merge pass. */
  def learnMerges(df: DataFrame, text: String, numMerges: Int,
                  maxDriverVocab: Int = 1 << 16): Seq[Merge] = {
    // cache before the size probe so an over-bound vocabulary does not
    // pay the corpus-sized groupBy twice (probe + distributed loop)
    val vocabCounts = df.select(words(text).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .cache()
    val local = vocabCounts.limit(maxDriverVocab + 1).collect()
    if (local.length <= maxDriverVocab) {
      vocabCounts.unpersist()
      return learnMergesLocal(
        local.map(r => (r.getString(0), r.getLong(1))), numMerges)
    }

    var vocab = vocabCounts
      .select(split(col("w"), "").as("syms"), col("freq"))
      .cache()
    vocab.count() // materialize before the loop
    vocabCounts.unpersist()

    val out = Seq.newBuilder[Merge]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val top = vocab
        .select(explode(arrays_zip(
          slice(col("syms"), lit(1), size(col("syms")) - 1).as("a"),
          slice(col("syms"), lit(2), size(col("syms")) - 1).as("b"))).as("p"),
          col("freq"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < 2L) done = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        out += Merge(i, a, b)
        val next = vocab.withColumn("syms", mergePass(col("syms"), a, b))
        // truncate lineage every few merges so analysis stays O(1)/iter
        vocab = (if ((i + 1) % 8 == 0) next.localCheckpoint(true) else next).cache()
        i += 1
      }
    }
    out.result()
  }

  /** Unsigned-UTF-8-byte string order — Spark's and DuckDB's BINARY
    * collation. Scala's String.compareTo is UTF-16 code-unit order,
    * which diverges for supplementary-plane characters; tie-breaks must
    * sort identically in all three places. */
  private[text] val utf8Order: Ordering[String] = Ordering.comparatorToOrdering(
    (a: String, b: String) => {
      val (ab, bb) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
      var i = 0
      val n = math.min(ab.length, bb.length)
      while (i < n && ab(i) == bb(i)) i += 1
      if (i < n) (ab(i) & 0xff) - (bb(i) & 0xff) else ab.length - bb.length
    })

  /** Driver-side merge loop over a collected (word, freq) vocabulary —
    * bitwise the same merges as the distributed loop: same pair counts,
    * same (count desc, left asc, right asc) argmax under UTF-8 byte
    * order, same greedy non-overlapping pass ([[encodeWord]]'s), same
    * stop-below-2 rule. */
  private def learnMergesLocal(vocab: Array[(String, Long)],
                               numMerges: Int): Seq[Merge] = {
    // Java "".split("") -> [""], identical to Spark's split(w, "")
    var state = vocab.map { case (w, f) => (w.split(""), f) }
    val out = Seq.newBuilder[Merge]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val counts = new java.util.HashMap[(String, String), Long]()
      state.foreach { case (syms, f) =>
        var j = 0
        while (j < syms.length - 1) {
          counts.merge((syms(j), syms(j + 1)), f, _ + _)
          j += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        import scala.jdk.CollectionConverters._
        val ((a, b), cnt) = counts.asScala.minBy { case ((x, y), c) =>
          (-c, x, y)
        }(Ordering.Tuple3(Ordering.Long, utf8Order, utf8Order))
        if (cnt < 2L) done = true
        else {
          out += Merge(i, a, b)
          state = state.map { case (syms, f) => (encodeOnePass(syms, a, b), f) }
          i += 1
        }
      }
    }
    out.result()
  }

  /** One greedy non-overlapping left-to-right pass (the [[encodeWord]]
    * inner step, exposed for the driver-side trainer). */
  private def encodeOnePass(syms: Array[String], a: String, b: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Encode documents with a learned merge list: per word, apply merges
    * in rank order (one left-to-right pass each — mirrors training
    * exactly). Returns (id, pieces, n_tokens, n_pieces). */
  def encode(df: DataFrame, idCol: String, text: String,
             merges: Seq[Merge]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      merges.sortBy(_.rank).map(m => (m.left, m.right)).toArray)
    df.select(col(idCol).cast("long"), trim(lower(col(text))))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ms = bc.value
        it.map { case (id, txt) =>
          val ws = txt.split("\\s+").filter(_.nonEmpty)
          val pieces = ws.flatMap(w => encodeWord(w, ms))
          (id, pieces, ws.length.toLong, pieces.length.toLong)
        }
      }
      .toDF(idCol, "pieces", "n_tokens", "n_pieces")
  }

  /** Single-word encode: for each merge in rank order, one non-overlapping
    * left-to-right merge pass (same semantics as [[mergePass]]). */
  private[text] def encodeWord(w: String, merges: Array[(String, String)]): Array[String] = {
    var syms = w.toCharArray.map(_.toString)
    var mi = 0
    while (mi < merges.length && syms.length > 1) {
      val (a, b) = merges(mi)
      val out = Array.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.result()
      mi += 1
    }
    syms
  }
}
