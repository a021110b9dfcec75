package graft

import org.apache.spark.sql.functions._
import graft.text.Boilerplate

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  // "x y" opens docs 1-3 (df = 3); every other span is unique to its doc;
  // doc 4 repeats "x y" internally but contains it as ONE document.
  private val docs = Seq(
    (1L, "x y a b"),
    (2L, "x y c d"),
    (3L, "x y e f"),
    (4L, "x y x y"),
    (5L, "g h i j")
  ).toDF("doc_id", "text")

  test("census: document frequency, within-doc repeats count once") {
    val cen = Boilerplate.census(docs, "doc_id", "text", 2)
      .as[(String, Long)].collect().toMap
    assert(cen("x y") == 4L) // docs 1,2,3,4 — doc 4's self-repeat counts once
    assert(cen("a b") == 1L)
    assert(cen("g h") == 1L)
  }

  test("scrub: spans at df >= maxDocFreq removed from EVERY document") {
    val out = Boilerplate.scrub(docs, "doc_id", "text", w = 2, maxDocFreq = 3)
      .orderBy("doc_id")
      .select("doc_id", "n_spans", "n_dropped", "clean_text")
      .as[(Long, Long, Long, String)].collect()
    assert(out(0) == ((1L, 2L, 1L, "a b")))
    assert(out(1) == ((2L, 2L, 1L, "c d")))
    assert(out(2) == ((3L, 2L, 1L, "e f")))
    // doc 4 was pure boilerplate: both occurrences go, text empties
    assert(out(3) == ((4L, 2L, 2L, "")))
    // doc 5 untouched (no span reaches df 3)
    assert(out(4) == ((5L, 2L, 0L, "g h i j")))
  }

  test("scrub: below-threshold shared spans survive (keep-first would not)") {
    val out = Boilerplate.scrub(docs, "doc_id", "text", w = 2, maxDocFreq = 5)
      .orderBy("doc_id").select("doc_id", "n_dropped", "clean_text")
      .as[(Long, Long, String)].collect()
    // df("x y") = 4 < 5 → nothing is boilerplate, every doc reconstructs
    assert(out.forall(_._2 == 0L))
    assert(out.map(_._3).toSeq ==
      Seq("x y a b", "x y c d", "x y e f", "x y x y", "g h i j"))
  }

  test("hashed census key produces the portable string-keyed output") {
    val a = Boilerplate.scrub(docs, "doc_id", "text", 2, 3, hashedKey = true)
    val b = Boilerplate.scrub(docs, "doc_id", "text", 2, 3, hashedKey = false)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("hot span: corpus-wide boilerplate in 500 docs scrubs from every one") {
    val boiler = "subscribe to our newsletter"
    val hot = (1L to 500L).map(i => (i, s"$boiler unique tail $i"))
      .toDF("doc_id", "text")
    // census is partial-aggregated distinct+count — the hot span is one
    // row per upstream partition, never a single hot reducer
    val out = Boilerplate.scrub(hot.repartition(8), "doc_id", "text",
      w = 4, maxDocFreq = 100)
    assert(out.count() == 500L)
    val agg = out.agg(sum(col("n_dropped")), count(lit(1))).head()
    assert(agg.getLong(0) == 500L) // the boilerplate span left EVERY doc
    assert(out.filter(col("clean_text").startsWith("unique tail")).count() == 500L)
  }

  test("scrub: filtered-verdict left join ≡ the full-census inner join " +
    "(r18 join shape) on a randomized corpus") {
    // the pre-r18 form, inline: inner-join the UNFILTERED census and
    // threshold per occurrence row — the verdict-set left join must be
    // value-identical on every column
    def oldForm(df: org.apache.spark.sql.DataFrame, w: Int, maxDocFreq: Int) = {
      val sp = graft.text.SpanDedup.spans(df, "doc_id", "text", w)
      val cen = sp.select(col("doc_id"), col("span")).distinct()
        .groupBy("span").agg(count(lit(1)).as("span_df"))
      sp.join(cen, "span")
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_spans"),
          sum(when(col("span_df") >= maxDocFreq, 1L).otherwise(0L)).as("n_dropped"),
          array_join(
            transform(
              array_sort(collect_list(when(col("span_df") < maxDocFreq,
                struct(col("span_no"), col("span"))))),
              s => s.getField("span")),
            " ").as("clean_text"))
    }
    // deterministic pseudo-random corpus with a planted boilerplate span
    // at several frequencies plus unique tails
    val corpus = (1L to 300L).map { i =>
      val banner = if (i % 3 != 0) "click here to subscribe " else ""
      val mid = if (i % 7 == 0) "rare shared middle " else ""
      (i, s"${banner}${mid}tail ${i * 37 % 101} ${i * 53 % 89} end$i")
    }.toDF("doc_id", "text")
    for (mdf <- Seq(2, 50, 500)) {
      val now = Boilerplate.scrub(corpus, "doc_id", "text", w = 2,
        maxDocFreq = mdf, hashedKey = false).orderBy("doc_id")
        .collect().map(_.toSeq).toSeq
      val old = oldForm(corpus, 2, mdf).orderBy("doc_id")
        .collect().map(_.toSeq).toSeq
      assert(now == old, s"maxDocFreq=$mdf")
    }
  }

  test("guards: w >= 1, maxDocFreq >= 2") {
    intercept[IllegalArgumentException] {
      Boilerplate.scrub(docs, "doc_id", "text", w = 0)
    }
    intercept[IllegalArgumentException] {
      Boilerplate.scrub(docs, "doc_id", "text", w = 2, maxDocFreq = 1)
    }
  }
}
