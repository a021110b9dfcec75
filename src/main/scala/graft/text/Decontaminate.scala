package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — flag training documents that share
  * word-n-gram shingles with an evaluation/benchmark set (the GPT-3/
  * PaLM-style n-gram overlap check run before pretraining). Documents
  * with any overlap are reported with their matched-shingle count so
  * the pipeline can drop or audit them.
  *
  * Scale shape: the benchmark side is small by definition (eval sets,
  * not corpora) — its distinct shingle set is BROADCAST; the training
  * side streams through a codegen'd explode + broadcast-hash semi-join
  * and one partial-agg rollup per contaminated doc. The training corpus
  * is never shuffled by shingle. Shingles join on their text here
  * (exact, oracle-checkable); at 100 TB swap the join key for
  * PortableHash.polyHash(shingle) to shrink the broadcast — the
  * topology is unchanged.
  */
object Decontaminate {

  /** Distinct 1-based `n`-word shingles per document (documents shorter
    * than `n` words produce none). */
  def wordShingles(df: DataFrame, id: String, text: String, n: Int): DataFrame = {
    val ws = split(col(text), " ")
    val grams = when(size(ws) >= n,
      transform(sequence(lit(1), size(ws) - (n - 1)),
        i => concat_ws(" ", slice(ws, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
    df.select(col(id), explode(grams).as("shingle")).distinct()
  }

  /** Per-document contamination report: training docs sharing ≥ 1
    * `n`-word shingle with `bench`, with the count of distinct matched
    * shingles. Clean documents are absent from the output. */
  def report(train: DataFrame, bench: DataFrame, id: String, text: String,
             n: Int = 8): DataFrame = {
    val tg = wordShingles(train, id, text, n)
    val bg = wordShingles(bench, id, text, n).select(col("shingle")).distinct()
    tg.join(broadcast(bg), Seq("shingle"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_matched"))
  }
}
