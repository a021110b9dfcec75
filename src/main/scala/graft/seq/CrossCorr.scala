package graft.seq

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Funcs.r

/** Per-series lead–lag cross-correlation (the sample CCF of
  * Box–Jenkins transfer-function identification): for two aligned
  * per-key series x and y,
  *
  *   r_xy(k) = c_xy(k) / √(c_xx(0)·c_yy(0)),
  *   c_xy(k) = Σ_t (x_t − μ_x)(y_{t−k} − μ_y) / n
  *
  * for k ∈ [−maxLag, maxLag] — positive k means y LEADS x by k steps
  * (x now correlates with y k steps ago), negative k means y lags.
  * The lead-lag profile is how a pipeline detects that promos/price
  * moves precede demand — the cross-series companion of
  * [[YuleWalker.acfPacf]]'s within-series view.
  *
  * Execution shape: one series-window pass for the ±maxLag shifted
  * copies of y, ONE map-side-combinable aggregate for all 2·maxLag+3
  * sufficient sums, scalar arithmetic at the key grain, and a bounded
  * per-key explode to (key, lag) rows. Scales in the series count.
  *
  * Determinism (the [[YuleWalker]] convention): both series center on
  * their exact micro-int means, quantize once to the 1e-4 grid, and
  * every lagged-product sum accumulates exactly in decimal(38,0);
  * √ is IEEE correctly rounded; the correlation rounds to the 4dp
  * grid. Degenerate series (either variance < 1e-8) report 0 at every
  * lag; series shorter than maxLag + 2 are absent (every lag keeps at
  * least two product pairs). */
object CrossCorr {

  private val VarEps = 1e-8

  def ccf(df: DataFrame, keyCols: Seq[String], ordCols: Seq[Column],
          xCol: String, yCol: String, maxLag: Int = 3): DataFrame = {
    require(maxLag >= 1 && maxLag <= 8, s"maxLag must be in [1, 8], got $maxLag")
    val keys = keyCols.map(col)
    val mu = df.groupBy(keys: _*).agg(
      graft.functions.Funcs.microMean(col(xCol)).as("__mx"),
      graft.functions.Funcs.microMean(col(yCol)).as("__my"))
    val w = Window.partitionBy(keys: _*).orderBy(ordCols: _*)
    val shifted = (1 to maxLag).foldLeft(
      df.join(mu, keyCols)
        .withColumn("__xi",
          graft.expr.RoundHalfUpExpr.column((col(xCol).cast("double") - col("__mx")) * lit(1e4)).cast("long"))
        .withColumn("__yi",
          graft.expr.RoundHalfUpExpr.column((col(yCol).cast("double") - col("__my")) * lit(1e4)).cast("long"))
    ) { (d, k) =>
      d.withColumn(s"__yb$k", lag(col("__yi"), k).over(w))
        .withColumn(s"__yf$k", lead(col("__yi"), k).over(w))
    }
    val dec = "decimal(38,0)"
    def d8(c: Column) = c.cast("double") / lit(1e8) + lit(0.0)
    def prod(k: Column) = d8(sum(col("__xi").cast(dec) * k))
    val lagSums = (1 to maxLag).flatMap(k => Seq(
      prod(col(s"__yb$k")).as(s"__sp$k"),   // y k steps AGO → lag +k
      prod(col(s"__yf$k")).as(s"__sn$k")))  // y k steps AHEAD → lag −k
    val aggCols = Seq(
      count(lit(1)).cast("double").as("__n"),
      d8(sum(col("__xi").cast(dec) * col("__xi"))).as("__sxx"),
      d8(sum(col("__yi").cast(dec) * col("__yi"))).as("__syy"),
      prod(col("__yi")).as("__s0")) ++ lagSums
    val sums = shifted.groupBy(keys: _*).agg(aggCols.head, aggCols.tail: _*)
      .filter(col("__n") >= maxLag + 2)
    val n = col("__n")
    val ok = col("__sxx") / n >= VarEps && col("__syy") / n >= VarEps
    val den = sqrt((col("__sxx") / n) * (col("__syy") / n))
    def cc(s: Column) = r(when(ok, (s / n) / den).otherwise(lit(0.0)))
    val pairs = (-maxLag to maxLag).map { k =>
      val s = if (k == 0) col("__s0")
              else if (k > 0) col(s"__sp$k")
              else col(s"__sn${-k}")
      struct(lit(k.toLong).as("lag"), cc(s).as("ccf"))
    }
    sums.withColumn("__e", explode(array(pairs: _*)))
      .select(keys ++ Seq(n.as("n_obs"),
        col("__e.lag").as("lag"), col("__e.ccf").as("ccf")): _*)
  }
}
