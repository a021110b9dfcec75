package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-pruned semi-join — the "runtime row filter" pattern made explicit.
  *
  * At 100 TB the dominant cost of `fact ⋉ dim_filtered` is shuffling the
  * fact side; when the filtered dim key set is small-ish but too large or
  * too late-derived for static partition pruning, the scale play is:
  *
  *   1. ONE distributed aggregate over the dim side builds a bloom filter
  *      of `xxhash64(key)` (Spark's `BloomFilterAggregate`, merged
  *      tree-wise; only the final sketch — a few MB — reaches the driver).
  *   2. The sketch is embedded as a `Literal` into
  *      `BloomFilterMightContain`, a codegen'd predicate evaluated
  *      scan-side on the fact — so ~(1−selectivity) of fact rows are
  *      dropped BEFORE the join shuffle, with zero false negatives.
  *   3. An exact semi-join removes the bloom's false positives.
  *
  * This is exactly what Spark's adaptive `InjectRuntimeFilter` does for
  * qualifying shuffle joins; exposing it as an operator lets pipelines
  * apply it where the planner can't see the opportunity (e.g. the "keys"
  * side is a pre-computed quality allowlist, a decontamination block-list,
  * or a dedup survivor set — reference analogue: the data_loader's
  * id-allowlist filtering, src/utils/data_loader.py:221-240).
  *
  * Result identity: `semiJoin(fact, keys)` ≡ `fact ⋉ keys` exactly — the
  * bloom stage only prunes, so correctness is oracle-checkable with plain
  * SQL while the plan keeps the cheap pre-shuffle drop.
  */
object BloomPrune {

  /** Build the serialized bloom sketch over `key` of `keys` with one
    * distributed aggregate. `expectedItems` sizes the sketch (Spark
    * defaults to 3% FPP at that cardinality); the returned byte array is
    * bounded (~1.2 MB per 1M expected items) regardless of input size. */
  def buildBloom(keys: DataFrame, key: Column, expectedItems: Long = 1000000L): Array[Byte] = {
    val agg = new BloomFilterAggregate(GraftBridge.expression(xxhash64(key)), expectedItems)
    val sketch = keys
      .select(GraftBridge.column(agg.toAggregateExpression()).as("bloom"))
      .head()
    // An empty `keys` frame yields a NULL sketch: nothing can match.
    if (sketch.isNullAt(0)) null else sketch.getAs[Array[Byte]](0)
  }

  /** Codegen'd `might_contain(bloom, xxhash64(key))` predicate column. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    if (bloom == null) lit(false)
    else GraftBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType), GraftBridge.expression(xxhash64(key))))

  /** `fact ⋉ keys` with the bloom pre-filter ahead of the shuffle.
    * `factKey`/`keysKey` name the equi-join columns. The distinct() on the
    * keys side keeps semi-join semantics while letting AQE pick a
    * broadcast for the exact stage when the key set is small. */
  def semiJoin(fact: DataFrame, keys: DataFrame, factKey: String, keysKey: String,
               expectedItems: Long = 1000000L): DataFrame = {
    val bloom = buildBloom(keys, col(keysKey), expectedItems)
    val pruned = fact.filter(mightContain(bloom, col(factKey)))
    pruned.join(keys.select(col(keysKey)).distinct(),
      pruned(factKey) === col(keysKey), "left_semi")
  }

  /** Anti flavor: `fact ▷ keys` (e.g. decontamination block-lists). The
    * bloom can only prune the JOIN input on the semi side, so for anti we
    * split: rows the bloom rejects are definitely non-members (kept
    * directly, no shuffle); only bloom-accepted rows — the small maybe set
    * — go through the exact anti-join. */
  def antiJoin(fact: DataFrame, keys: DataFrame, factKey: String, keysKey: String,
               expectedItems: Long = 1000000L): DataFrame = {
    val bloom = buildBloom(keys, col(keysKey), expectedItems)
    val maybe = fact.filter(mightContain(bloom, col(factKey)))
    val definiteOut = fact.filter(!mightContain(bloom, col(factKey)))
    val cleared = maybe.join(keys.select(col(keysKey)).distinct(),
      maybe(factKey) === col(keysKey), "left_anti")
    definiteOut.unionByName(cleared)
  }
}
