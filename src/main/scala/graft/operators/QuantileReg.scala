package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Funcs.r

/** Linear quantile regression by fixed-iteration IRLS — the
  * engine-side equivalent of the reference's `QuantileRegressor`
  * (model_calibration.py:296-375: one sklearn pinball fit per
  * quantile, with a weighted-least-squares fallback at :341-346 when
  * the exact solver is unavailable; this operator IS that fallback's
  * iterated form, which converges to the same pinball minimizer).
  *
  * Model: per (group, τ), y ≈ a + b·x minimizing the smoothed pinball
  * loss. Each IRLS round recomputes asymmetric weights from the
  * current residuals,
  *
  *   w_i = τ / max(|r_i|, ε)        if r_i > 0
  *       = (1−τ) / max(|r_i|, ε)    otherwise
  *
  * and solves the 2×2 weighted normal equations in closed form. The
  * iteration count is a LITERAL (default 8), not a convergence test,
  * so the computation is a fixed dataflow both engines replay exactly:
  * weights round to the 1e-4 grid, every weighted sum accumulates as
  * micro-int products in decimal(38,0) (the Ar/Theta exact-sum
  * convention — partial-aggregation-order independent), and each
  * round's (a, b) round before feeding the next round.
  *
  * Execution shape (the Platt.scala distinct-grain device): the fact
  * first collapses to the DISTINCT (group, x, y) grain with a
  * multiplicity count — one fact pass — and THAT tiny frame is
  * checkpointed for the iters+1 consumers. IRLS weights depend only on
  * (x, y, a, b, τ), so every weighted sum is exactly the distinct-cell
  * sum scaled by the cell count (integer arithmetic — bit-identical to
  * the row-grain sum in any order), and each round is a hash-aggregate
  * over cells, not rows: for bounded-cardinality measures (prices,
  * quantities, discounts — the retail reality) round cost is
  * independent of fact size; in the worst (all-distinct) case it
  * degrades to the row grain, i.e. never worse than one extra
  * exchange. τ rides the aggregation key (one `explode` of the literal
  * τ list), so any number of quantiles costs zero extra passes.
  *
  * Degenerate groups (no x variance → |den| < 1e-8) fall back to
  * b = 0 with a the weighted mean — the reference's Ridge fallback
  * shape. Output: group..., tau, qr_a, qr_b, pinball (the final mean
  * pinball loss, 4dp-rounded per row then exactly summed).
  */
object QuantileReg {

  /** Session conf selecting the execution shape (r17 verdict ask #2):
    * `true` (the unset default) = single-pass — the per-(group) distinct
    * cells are packed into one array and ALL IRLS rounds run inside one
    * `aggregate` higher-order function, so the whole fit is ONE Spark
    * job instead of 1 + iters + 1 sequential checkpoint jobs (each
    * ~0.15 s of launch latency that dominated the fit at bench scale);
    * `false` = the r17 per-round-checkpoint iterative form. The two are
    * value-identical — every quantization, decimal accumulation and
    * branch is expression-for-expression the same, and the fold
    * accumulators are exact integer/decimal sums, so cell order cannot
    * move a bit (QuantileRegSpec pins equality across the toggle).
    * Flip to `false` only when a single group's distinct-(x, y) cell
    * count cannot fit one task's memory — the iterative form degrades
    * to distributed hash aggregates instead. */
  val SinglePassConf = "spark.graft.qrSinglePass"

  def fit(df: DataFrame, groupCols: Seq[String], x: Column, y: Column,
          taus: Seq[Double] = Seq(0.25, 0.5, 0.75), iters: Int = 8,
          eps: Double = 0.01): DataFrame = {
    require(taus.nonEmpty && taus.forall(t => t > 0 && t < 1),
      "quantiles must lie in (0, 1)")
    require(iters >= 1, "need at least one reweighted round")
    val singlePass = org.apache.spark.sql.SparkSession.active
      .conf.get(SinglePassConf, "true").toBoolean
    if (singlePass) fitSinglePass(df, groupCols, x, y, taus, iters, eps)
    else fitIterative(df, groupCols, x, y, taus, iters, eps)
  }

  /** One-job IRLS: fold the per-group cell array through all rounds
    * inside a single projection. Every arithmetic step mirrors
    * [[fitIterative]] verbatim; the only representational difference is
    * that each round's five weighted sums accumulate via an explicit
    * array fold — exact decimal/long adds with a per-sum non-null
    * count, which reproduces `Sum`'s semantics (null terms skipped,
    * all-null group → NULL) in any fold order. */
  private def fitSinglePass(df: DataFrame, groupCols: Seq[String], x: Column,
                            y: Column, taus: Seq[Double], iters: Int,
                            eps: Double): DataFrame = {
    val groups = groupCols.map(col)
    val dec = "decimal(38,0)"
    val dec0 = lit(0).cast(dec)

    // same distinct-(group, x, y) grain as the iterative form (one fact
    // pass, cell-bounded downstream cost), then ONE more tiny exchange
    // packs each group's cells into an array — the whole iteration is
    // a per-row computation from here, no further shuffle or job
    val packed = df.select(groups ++ Seq(x.cast("double").as("__x"),
        y.cast("double").as("__y")): _*)
      .groupBy(groups ++ Seq(col("__x"), col("__y")): _*)
      .agg(count(lit(1)).as("__cnt"))
      .groupBy(groups: _*)
      .agg(collect_list(struct(col("__x"), col("__y"), col("__cnt"))).as("__cells"))
      .withColumn("tau", explode(array(taus.map(lit): _*)))

    val cells = col("__cells")
    val tau = col("tau")

    // let-binding for expression trees: evaluate `v` ONCE and expose it
    // to `body` as a lambda variable (a single-element transform), so
    // formulas can reference expensive subtrees without re-evaluating
    // them per reference (interpreted HOFs re-eval on every reference)
    def bind(v: Column)(body: Column => Column): Column =
      transform(array(v), body).getItem(0)

    def mxL(c: Column): Column =
      graft.expr.RoundHalfUpExpr.column(c.getField("__x") * lit(1e4)).cast("long")
    def myL(c: Column): Column =
      graft.expr.RoundHalfUpExpr.column(c.getField("__y") * lit(1e4)).cast("long")

    // the five weighted sums of one IRLS round as an exact fold, then
    // the closed-form 2x2 solve — returns struct(__a, __b); `w` builds
    // the round's weight column from a cell (fitIterative's
    // weight-then-quantize idiom, verbatim)
    def solve(w: Column => Column): Column = {
      val zero = struct(
        dec0.as("sw"), lit(0L).as("nw"), dec0.as("swx"), lit(0L).as("nwx"),
        dec0.as("swxx"), lit(0L).as("nwxx"), dec0.as("swy"), lit(0L).as("nwy"),
        dec0.as("swxy"), lit(0L).as("nwxy"))
      val folded = aggregate(cells, zero, (a: Column, c: Column) =>
        bind(struct(
          (graft.expr.RoundHalfUpExpr.column(w(c) * lit(1e4)).cast(dec) *
            c.getField("__cnt")).as("mw"),
          mxL(c).as("mx"), myL(c).as("my"))) { v =>
          val mw = v.getField("mw"); val mx = v.getField("mx"); val my = v.getField("my")
          def add(f: String, nf: String, t: Column) = Seq(
            (a.getField(f) + coalesce(t, dec0)).cast(dec).as(f),
            (a.getField(nf) + when(t.isNotNull, 1L).otherwise(0L)).as(nf))
          struct((add("sw", "nw", mw) ++ add("swx", "nwx", mw * mx) ++
            add("swxx", "nwxx", mw * mx * mx) ++ add("swy", "nwy", mw * my) ++
            add("swxy", "nwxy", mw * mx * my)): _*)
        })
      bind(folded) { acc =>
        def fin(f: String, nf: String, sc: Double): Column =
          when(acc.getField(nf) > 0, acc.getField(f).cast("double") / lit(sc))
            .otherwise(lit(null).cast("double"))
        bind(struct(fin("sw", "nw", 1e4).as("sw"), fin("swx", "nwx", 1e8).as("swx"),
          fin("swxx", "nwxx", 1e12).as("swxx"), fin("swy", "nwy", 1e8).as("swy"),
          fin("swxy", "nwxy", 1e12).as("swxy"))) { s =>
          val sw = s.getField("sw"); val swx = s.getField("swx")
          val swxx = s.getField("swxx"); val swy = s.getField("swy")
          val swxy = s.getField("swxy")
          bind(struct((sw * swxx - swx * swx).as("den"))) { d =>
            val den = d.getField("den")
            bind(struct(r(when(abs(den) >= 1e-8,
              (sw * swxy - swx * swy) / den).otherwise(lit(0.0))).as("b"))) { bb =>
              val b = bb.getField("b")
              struct(r((swy - b * swx) / sw).as("__a"), b.as("__b"))
            }
          }
        }
      }
    }

    def weight(st: Column)(c: Column): Column = {
      val resid = c.getField("__y") - st.getField("__a") -
        st.getField("__b") * c.getField("__x")
      val scale = greatest(abs(resid), lit(eps))
      r(when(resid > 0, tau / scale).otherwise((lit(1.0) - tau) / scale))
    }

    // round 0 = unit weights (the OLS start), rounds 1..iters reweight
    // from the previous state: a runtime fold over the round indices,
    // NOT a driver-side unroll — the expression tree holds exactly two
    // solve bodies (init + step) however many rounds run
    val fitted = aggregate(sequence(lit(1), lit(iters)),
      solve(_ => lit(1.0)),
      (st: Column, _: Column) => bind(st)(s => solve(weight(s))))

    packed.withColumn("__fit", fitted)
      .withColumn("__pb", bind(col("__fit")) { st =>
        // final pinball pass, fitIterative's quantize-then-exact-sum:
        // rho 4dp-rounded per cell, micro-ints summed in decimal scaled
        // by the cell count, divided by the total row count
        bind(aggregate(cells,
          struct(dec0.as("num"), lit(0L).as("nnum"), lit(0L).as("den")),
          (a: Column, c: Column) => bind(struct(
            (graft.expr.RoundHalfUpExpr.column(
              r(greatest(tau * (c.getField("__y") - st.getField("__a") -
                st.getField("__b") * c.getField("__x")),
                (tau - 1) * (c.getField("__y") - st.getField("__a") -
                  st.getField("__b") * c.getField("__x")))) * lit(1e4)).cast(dec) *
              c.getField("__cnt")).as("t"))) { v =>
            val t = v.getField("t")
            struct((a.getField("num") + coalesce(t, dec0)).cast(dec).as("num"),
              (a.getField("nnum") + when(t.isNotNull, 1L).otherwise(0L)).as("nnum"),
              (a.getField("den") + c.getField("__cnt")).as("den"))
          })) { acc =>
          r(when(acc.getField("nnum") > 0,
            acc.getField("num").cast("double") / lit(1e4))
            .otherwise(lit(null).cast("double")) / acc.getField("den").cast("double"))
        }
      })
      .select(groups ++ Seq(tau, col("__fit").getField("__a").as("qr_a"),
        col("__fit").getField("__b").as("qr_b"), col("__pb").as("pinball")): _*)
  }

  private def fitIterative(df: DataFrame, groupCols: Seq[String], x: Column,
                           y: Column, taus: Seq[Double], iters: Int,
                           eps: Double): DataFrame = {
    val groups = groupCols.map(col)
    val dec = "decimal(38,0)"
    // distinct-(group, x, y) grain with multiplicities: every weighted
    // sum below is the row-grain sum exactly (integer products scale by
    // the cell count), but round cost is cell-bounded, not fact-bounded
    val base = df.select(groups ++ Seq(x.cast("double").as("__x"),
        y.cast("double").as("__y")): _*)
      .groupBy(groups ++ Seq(col("__x"), col("__y")): _*)
      .agg(count(lit(1)).as("__cnt"))
      .localCheckpoint(true)
      .withColumn("tau", explode(array(taus.map(lit): _*)))
    val keys = groupCols :+ "tau"

    def mxL = graft.expr.RoundHalfUpExpr.column(col("__x") * lit(1e4)).cast("long")
    def myL = graft.expr.RoundHalfUpExpr.column(col("__y") * lit(1e4)).cast("long")
    def cntL = col("__cnt")

    def solve(weighted: DataFrame, w: Column): DataFrame = {
      val mw = graft.expr.RoundHalfUpExpr.column(w * lit(1e4)).cast(dec) * cntL
      val sums = weighted.groupBy(keys.map(col): _*).agg(
        (sum(mw).cast("double") / lit(1e4)).as("__sw"),
        (sum(mw * mxL).cast("double") / lit(1e8)).as("__swx"),
        (sum(mw * mxL * mxL).cast("double") / lit(1e12)).as("__swxx"),
        (sum(mw * myL).cast("double") / lit(1e8)).as("__swy"),
        (sum(mw * mxL * myL).cast("double") / lit(1e12)).as("__swxy"))
      val den = col("__sw") * col("__swxx") - col("__swx") * col("__swx")
      sums
        .withColumn("__b", r(when(abs(den) >= 1e-8,
          (col("__sw") * col("__swxy") - col("__swx") * col("__swy")) / den)
          .otherwise(lit(0.0))))
        .withColumn("__a", r((col("__swy") - col("__b") * col("__swx")) / col("__sw")))
        .select(keys.map(col) ++ Seq(col("__a"), col("__b")): _*)
    }

    def weight(tau: Column, resid: Column): Column = {
      val scale = greatest(abs(resid), lit(eps))
      r(when(resid > 0, tau / scale).otherwise((lit(1.0) - tau) / scale))
    }

    // round 0: unit weights = the plain OLS start. Each round's state
    // (one (a, b) row per (group, tau) — broadcast-sized by the same
    // assumption broadcast(state) already makes) is eagerly
    // checkpointed so round k is planned against a LEAF, not the
    // k-deep join/aggregate tree: without this, every action re-plans
    // and re-codegens the full nested tree and the per-round marginal
    // is dominated by the driver, not the 2x2 solve (QrProbe r17).
    val init = solve(base, lit(1.0)).localCheckpoint(true)
    val fitted = (1 to iters).foldLeft(init) { (state, _) =>
      val joined = base.join(broadcast(state), keys)
      val resid = col("__y") - col("__a") - col("__b") * col("__x")
      solve(joined, weight(col("tau"), resid)).localCheckpoint(true)
    }
    val scored = base.join(broadcast(fitted), keys)
      .withColumn("__r", col("__y") - col("__a") - col("__b") * col("__x"))
      .withColumn("__rho", r(greatest(col("tau") * col("__r"),
        (col("tau") - 1) * col("__r"))))
    scored.groupBy(keys.map(col): _*)
      .agg(max(col("__a")).as("qr_a"), max(col("__b")).as("qr_b"),
        r((sum(graft.expr.RoundHalfUpExpr.column(col("__rho") * lit(1e4)).cast(dec) * cntL).cast("double") /
          lit(1e4) / sum(cntL).cast("double"))).as("pinball"))
  }
}
