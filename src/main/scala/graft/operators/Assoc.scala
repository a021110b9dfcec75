package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Funcs

/** Categorical-association statistics and target encoding — the
  * feature-selection companions to the reference's correlation scan
  * (reference: src/features/feature_pipeline.py feature selection is
  * numeric-only `corr`; these cover the categorical side: χ²
  * independence, Cramér's V, mutual information, and smoothed
  * target-mean encoding as the model-ready projection).
  *
  * Scale shape: everything reduces the fact to the contingency grain
  * (|X|·|Y| cells) with one hash-aggregate, then joins tiny marginal
  * frames back broadcast. No windows over fact rows, no collect.
  */
object Assoc {

  /** Per-cell χ² table: observed vs expected counts with each cell's
    * contribution, plus the totals (χ², Cramér's V) replicated on every
    * row via a broadcast 1-row join. The grid is the full |X|×|Y| cross
    * of the observed marginals — a category pair that never co-occurs
    * still contributes (0−e)²/e (dropping empty cells understates χ²,
    * exactly on the most-dependent data). */
  def chi2(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val cells = df.groupBy(col(xCol), col(yCol)).agg(count(lit(1)).as("__o"))
    val rowT = cells.groupBy(col(xCol)).agg(sum(col("__o")).as("__rt"))
    val colT = cells.groupBy(col(yCol)).agg(sum(col("__o")).as("__ct"))
    val tot = cells.agg(sum(col("__o")).as("__n"),
      countDistinct(col(xCol)).as("__rx"), countDistinct(col(yCol)).as("__ry"))
    val withE = rowT.crossJoin(broadcast(colT))
      .join(cells, Seq(xCol, yCol), "left")
      .withColumn("observed", coalesce(col("__o"), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("expected", col("__rt") * col("__ct") / col("__n"))
      .withColumn("contrib",
        (col("observed") - col("expected")) * (col("observed") - col("expected"))
          / col("expected"))
    val totals = withE.agg(sum(col("contrib")).as("__chi2"),
        first(col("__n")).as("__nn"), first(col("__rx")).as("__rx2"),
        first(col("__ry")).as("__ry2"))
      .select(col("__chi2"),
        sqrt(col("__chi2") / (col("__nn")
          * least(col("__rx2") - 1, col("__ry2") - 1))).as("__v"))
    withE.crossJoin(broadcast(totals))
      .select(col(xCol), col(yCol), col("observed"),
        Funcs.r(col("expected")).as("expected"),
        Funcs.r(col("contrib")).as("contrib"),
        Funcs.r(col("__chi2")).as("chi2"),
        Funcs.r(col("__v")).as("cramers_v"))
  }

  /** Mutual information between two categoricals (nats), with the
    * marginal entropies and the sqrt-normalized NMI. Single output row. */
  def mutualInfo(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val cells = df.groupBy(col(xCol), col(yCol)).agg(count(lit(1)).as("o"))
    val rowT = cells.groupBy(col(xCol)).agg(sum(col("o")).as("__rt"))
    val colT = cells.groupBy(col(yCol)).agg(sum(col("o")).as("__ct"))
    val tot = cells.agg(sum(col("o")).as("__n"))
    val joint = cells.join(broadcast(rowT), xCol).join(broadcast(colT), yCol)
      .crossJoin(broadcast(tot))
      .select((col("o") / col("__n")
        * log(col("o") * col("__n") / (col("__rt") * col("__ct")))).as("term"))
      .agg(sum(col("term")).as("mi"))
    def entropy(marg: DataFrame, t: String): DataFrame = marg
      .crossJoin(broadcast(tot))
      .select((col(t) / col("__n") * log(col(t) / col("__n"))).as("term"))
      .agg((-sum(col("term"))).as("h"))
    val hx = entropy(rowT, "__rt").withColumnRenamed("h", "h_x")
    val hy = entropy(colT, "__ct").withColumnRenamed("h", "h_y")
    joint.crossJoin(broadcast(hx)).crossJoin(broadcast(hy))
      .select(Funcs.r(col("mi")).as("mi_nats"),
        Funcs.r(col("h_x")).as("h_x"), Funcs.r(col("h_y")).as("h_y"),
        Funcs.r(col("mi") / sqrt(col("h_x") * col("h_y"))).as("nmi"))
  }

  /** m-estimate smoothed target-mean encoding: per category,
    *   enc = (Σy + m·prior) / (n + m),  prior = global mean(y)
    * — shrinks rare categories toward the global rate (the standard
    * leakage-safe variant when fit on train and joined onto score).
    * Returns the per-category encoding table (join it back broadcast). */
  def targetEncode(df: DataFrame, catCol: String, label: Column,
                   m: Double): DataFrame = {
    val perCat = df.groupBy(col(catCol))
      .agg(count(lit(1)).as("n"), sum(label.cast("long")).as("__pos"))
    val prior = perCat.agg((sum(col("__pos")) / sum(col("n"))).as("__prior"))
    perCat.crossJoin(broadcast(prior))
      .select(col(catCol), col("n"),
        Funcs.r((col("__pos") + lit(m) * col("__prior")) / (col("n") + lit(m)))
          .as("enc"))
  }

  /** Spearman rank correlation per group — the monotone-association
    * screen (robust to outliers and nonlinearity) next to the Pearson
    * scan in [[FeatureQuality.highCorrPairs]]: Pearson over FRACTIONAL
    * ranks, ties receiving the average rank `rank + (ties−1)/2` (the
    * textbook treatment, matching scipy.stats.spearmanr).
    *
    * Determinism and overflow: the average fractional rank is a
    * half-integer, so DOUBLED ranks `2·rank + ties − 1` are exact
    * integers — the Pearson correlation is scale-invariant, so using
    * 2× ranks leaves the result unchanged while making every sufficient
    * sum an integer. The sums accumulate as decimal(38,0) (exact in any
    * partial-aggregation order; sum(rx·ry) ~ n³ would wrap BIGINT past
    * ~1.3e6 rows/group, decimal holds to n ≈ 1e9 where n·Sxx ~ 4n⁴
    * meets the 38-digit ceiling). Two rank windows + one tie-count
    * window per axis, all partitioned on the group key, then one
    * aggregate — group-keyed exchanges only, no collect. */
  def spearman(df: DataFrame, groupCols: Seq[String], x: Column,
               y: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keys = groupCols.map(col)
    val dec = "decimal(38,0)"
    def avgRank2(c: Column, tag: String) = {
      val rk = rank().over(Window.partitionBy(keys: _*).orderBy(c))
      val ties = count(lit(1)).over(Window.partitionBy(keys :+ c: _*))
      // 2·(fractional average rank) — an exact integer even with ties
      (lit(2L) * rk + ties - lit(1L)).cast("long").as(s"__r$tag")
    }
    val ranked = df.select(keys ++ Seq(avgRank2(x, "x"), avgRank2(y, "y")): _*)
    val s = ranked.groupBy(keys: _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__rx").cast(dec)).as("__sx"), sum(col("__ry").cast(dec)).as("__sy"),
        sum(col("__rx").cast(dec) * col("__ry")).as("__sxy"),
        sum(col("__rx").cast(dec) * col("__rx")).as("__sxx"),
        sum(col("__ry").cast(dec) * col("__ry")).as("__syy"))
    val nD = col("n").cast(dec)
    val num = (nD * col("__sxy") - col("__sx") * col("__sy")).cast("double")
    val dx = (nD * col("__sxx") - col("__sx") * col("__sx")).cast("double")
    val dy = (nD * col("__syy") - col("__sy") * col("__sy")).cast("double")
    s.select(keys ++ Seq(col("n"),
      Funcs.r(num / (sqrt(dx) * sqrt(dy))).as("spearman")): _*)
  }

  /** Kendall rank association per group — τ_b AND Goodman–Kruskal γ
    * from one concordance pass: over all point pairs, C = concordant
    * (sign(Δx)·sign(Δy) > 0), D = discordant (< 0),
    * τ_b = (C−D)/√((n₀−n_x)(n₀−n_y)) with n₀ = n(n−1)/2 and
    * n_x/n_y = Σ t(t−1)/2 over each coordinate's tied groups (the
    * both-sides tie correction [[graft.operators.Ols.mannKendall]]
    * carries for its variance), γ = (C−D)/(C+D) (ties ignored — the
    * ordinal-data companion). The rank-correlation complement of
    * [[spearman]]: τ counts pairwise inversions (robust, directly
    * interpretable as P(concordant)−P(discordant)), Spearman ranks.
    *
    * Pair generation needs NO unique tiebreak: the sign product is
    * symmetric under swap, so the group self-join sums over all
    * ordered pairs (self pairs contribute 0) and halves the even
    * counts. O(n²) pairs per GROUP — run at an aggregate grain
    * (the [[graft.operators.Ols.theilSen]] cost model); past a few
    * thousand points per group switch to [[kendallTauSampled]], the
    * O(n + s) Lehmer-sampled twin (KendallProbe: exact 15.2 s vs
    * sampled 3.1 s at 20k-point series). Values round to the 4dp grid
    * before comparison, so tie detection is exact cross-engine; all
    * counts are exact integers and τ/γ are deterministic transforms
    * of them. Degenerate groups (either coordinate all-tied) report
    * τ_b = 0; all-tied-pairs groups report γ = 0. */
  def kendall(df: DataFrame, groupCols: Seq[String], x: Column,
              y: Column): DataFrame = {
    val keys = groupCols.map(col)
    // NULL coordinates enter n_obs and the tie tables but produce NULL
    // sign products (counted in neither C nor D) — the same silent-skew
    // hazard the r15 ADVICE flagged on mannWhitneyU; drop them up front
    val a = df.select(keys ++ Seq(Funcs.r(x).as("__x"), Funcs.r(y).as("__y")): _*)
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    val b = a.toDF((groupCols ++ Seq("__x2", "__y2")): _*)
    val prod = signum(col("__x2") - col("__x")) * signum(col("__y2") - col("__y"))
    val pairAgg = a.join(b, groupCols)
      .select(keys :+ prod.cast("long").as("__p"): _*)
      .groupBy(keys: _*)
      .agg((sum(when(col("__p") > 0, 1L).otherwise(0L)) / lit(2)).cast("long")
        .as("conc"),
        (sum(when(col("__p") < 0, 1L).otherwise(0L)) / lit(2)).cast("long")
          .as("disc"))
    def tieHalf(c: String, out: String) = a.groupBy((keys :+ col(c)): _*)
      .agg(count(lit(1)).as("__t"))
      .groupBy(keys: _*)
      .agg((sum(col("__t") * (col("__t") - 1)) / lit(2)).cast("long").as(out))
    val nAgg = a.groupBy(keys: _*).agg(count(lit(1)).as("n_obs"))
    val joined = nAgg.join(pairAgg, groupCols)
      .join(tieHalf("__x", "__nx"), groupCols)
      .join(tieHalf("__y", "__ny"), groupCols)
    val n = col("n_obs").cast("double")
    val n0 = n * (n - 1) / 2
    val s = (col("conc") - col("disc")).cast("double")
    val denT = (n0 - col("__nx")) * (n0 - col("__ny"))
    val denG = (col("conc") + col("disc")).cast("double")
    joined.select(keys ++ Seq(col("n_obs"), col("conc"), col("disc"),
      Funcs.r(when(denT > 0, s / sqrt(denT)).otherwise(lit(0.0))).as("tau_b"),
      Funcs.r(when(denG > 0, s / denG).otherwise(lit(0.0))).as("gk_gamma")): _*)
  }

  /** Sampled Kendall τ for LONG series (r15 verdict ask #4 — the
    * [[kendall]] grain-cap cost model's "sample or coarsen" option made
    * real, mirroring [[graft.operators.Ols.theilSenSampled]]): the
    * exact operator's pair self-join is O(n²) per group and safe only
    * by grain choice; here concordance is ESTIMATED from
    * `pairsPerGroup` deterministic index pairs — cost O(n + s) per
    * group, so group size stops being the quadratic axis.
    *
    * The tie corrections stay EXACT: n₀ = n(n−1)/2 and the tied-group
    * tables n_x, n_y are fact-linear aggregates (no pair join), so only
    * the concordance proportion is Monte-Carlo. Estimates:
    *   Ŝ = n₀·(C−D)/s,  τ̂_b = Ŝ/√((n₀−n_x)(n₀−n_y)),
    *   γ̂ = (C−D)/(C+D)
    * with C/D the sampled concordant/discordant counts (sampling WITH
    * replacement over unordered pairs; error ~O(1/√s)).
    *
    * Draws are PORTABLE ([[graft.functions.PortableHash.lehmer]] of
    * seed + 2t / seed + 2t + 1 → i = h₁ mod n, j skips i — pure integer
    * arithmetic any engine replays bit-identically), so the operator
    * admits a plain-SQL oracle exactly like q326's. Values round to the
    * 4dp grid before ranking and comparison (tie detection exact
    * cross-engine); the per-group index orders by (x, y, rows-order-free
    * tiebreak on the rounded pair) — groups with duplicate (x, y)
    * points keep a deterministic index because ties draw the SAME
    * (x, y) payload regardless of which row takes which rank. Groups
    * with n < 2 are absent; zero-denominator groups report 0. */
  def kendallTauSampled(df: DataFrame, groupCols: Seq[String], x: Column,
                        y: Column, pairsPerGroup: Int,
                        seed: Long = 42L): DataFrame = {
    require(pairsPerGroup >= 1,
      s"pairsPerGroup must be >= 1, got $pairsPerGroup")
    import org.apache.spark.sql.expressions.Window
    import graft.functions.PortableHash.lehmer
    val keys = groupCols.map(col)
    // same NULL hygiene as [[kendall]]: a NULL coordinate must not
    // take an index slot (a sampled pair hitting it would vanish from
    // both C and D while still counting in s_pairs)
    val a = df.select(keys ++ Seq(Funcs.r(x).as("__x"), Funcs.r(y).as("__y")): _*)
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    val w = Window.partitionBy(keys: _*).orderBy(col("__x"), col("__y"))
    val idxd = a.withColumn("__i", row_number().over(w))
    val slots = idxd.groupBy(keys: _*).agg(max(col("__i")).as("__n"))
      .filter(col("__n") >= 2)
      .withColumn("__t", explode(sequence(lit(1), lit(pairsPerGroup))))
      .withColumn("__h1", lehmer(lit(seed) + col("__t") * 2))
      .withColumn("__h2", lehmer(lit(seed) + col("__t") * 2 + 1))
      .withColumn("__pi", pmod(col("__h1"), col("__n")) + 1)
      .withColumn("__j0", pmod(col("__h2"), col("__n") - 1) + 1)
      .withColumn("__pj",
        when(col("__j0") >= col("__pi"), col("__j0") + 1).otherwise(col("__j0")))
      .select(keys ++ Seq(col("__pi"), col("__pj")): _*)
    val p1 = idxd.select(keys ++ Seq(col("__i").as("__pi"),
      col("__x").as("__x1"), col("__y").as("__y1")): _*)
    val p2 = idxd.select(keys ++ Seq(col("__i").as("__pj"),
      col("__x").as("__x2"), col("__y").as("__y2")): _*)
    val prod = signum(col("__x2") - col("__x1")) * signum(col("__y2") - col("__y1"))
    val sampleAgg = slots.join(p1, groupCols :+ "__pi")
      .join(p2, groupCols :+ "__pj")
      .select(keys :+ prod.cast("long").as("__p"): _*)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("s_pairs"),
        sum(when(col("__p") > 0, 1L).otherwise(0L)).as("conc"),
        sum(when(col("__p") < 0, 1L).otherwise(0L)).as("disc"))
    def tieHalf(c: String, out: String) = a.groupBy((keys :+ col(c)): _*)
      .agg(count(lit(1)).as("__t"))
      .groupBy(keys: _*)
      .agg((sum(col("__t") * (col("__t") - 1)) / lit(2)).cast("long").as(out))
    val nAgg = a.groupBy(keys: _*).agg(count(lit(1)).as("n_obs"))
    val joined = nAgg.join(sampleAgg, groupCols)
      .join(tieHalf("__x", "__nx"), groupCols)
      .join(tieHalf("__y", "__ny"), groupCols)
    val n = col("n_obs").cast("double")
    val n0 = n * (n - 1) / 2
    val sHat = n0 * (col("conc") - col("disc")).cast("double") /
      col("s_pairs").cast("double")
    val denT = (n0 - col("__nx")) * (n0 - col("__ny"))
    val denG = (col("conc") + col("disc")).cast("double")
    joined.select(keys ++ Seq(col("n_obs"), col("s_pairs"), col("conc"),
      col("disc"),
      Funcs.r(when(denT > 0, sHat / sqrt(denT)).otherwise(lit(0.0)))
        .as("tau_b_est"),
      Funcs.r(when(denG > 0, (col("conc") - col("disc")).cast("double") / denG)
        .otherwise(lit(0.0))).as("gk_gamma_est")): _*)
  }

  /** Mann–Whitney U (Wilcoxon rank-sum) two-sample test per group —
    * does the `inSample` subset's value distribution sit above/below
    * the rest's? U₁ = S₁ − n₁(n₁+1)/2 over average ranks of the
    * combined sample, tie-corrected normal approximation
    * z = (U₁ − n₁n₂/2)/σ with σ² = n₁n₂/12·[(n+1) − Σ(t³−t)/(n(n−1))],
    * and the common-language effect size U₁/(n₁n₂) = P(X₁ > X₂) +
    * ½P(X₁ = X₂). The distribution-comparison member of the round's
    * nonparametric family (Mann–Kendall trends, Theil–Sen slopes,
    * Kendall τ): segment-vs-rest error/measure comparisons without a
    * normality assumption.
    *
    * Exactness: values round to the 4dp grid (tie detection is then
    * cross-engine exact); average ranks ride the 2·rank + t − 1
    * integer device ([[spearman]]'s), so 2S₁ is an exact integer and
    * every statistic is a deterministic transform of exact integers.
    * Scale shape: one rank window + one aggregate on the group key —
    * no pair join, fact-linear. Degenerate groups (one-sided or
    * all-tied: σ = 0) report z = 0; empty-side groups report
    * effect 0. No continuity correction (document vs scipy's
    * use_continuity=True default). */
  def mannWhitneyU(df: DataFrame, groupCols: Seq[String], inSample: Column,
                   value: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keys = groupCols.map(col)
    // NULL predicate/value rows would be ranked into the combined
    // sample yet counted in neither n1 nor n2 (when/otherwise both
    // miss NULL), silently skewing U and sigma — drop them up front so
    // the rank window and the n1/n2/tie aggregates see the same rows
    val base = df.select(keys ++ Seq(inSample.cast("boolean").as("__f"),
      Funcs.r(value).as("__v")): _*)
      .filter(col("__f").isNotNull && col("__v").isNotNull)
    val w = Window.partitionBy(keys: _*).orderBy(col("__v"))
    val tw = Window.partitionBy((keys :+ col("__v")): _*)
    val ranked = base.withColumn("__2r",
      (lit(2L) * rank().over(w) + count(lit(1)).over(tw) - 1).cast("long"))
    val tieAgg = base.groupBy((keys :+ col("__v")): _*)
      .agg(count(lit(1)).cast("double").as("__t"))
      .groupBy(keys: _*)
      .agg(sum(col("__t") * col("__t") * col("__t") - col("__t")).as("__tie"))
    val agg = ranked.groupBy(keys: _*).agg(
      sum(when(col("__f"), 1L).otherwise(0L)).as("n1"),
      sum(when(!col("__f"), 1L).otherwise(0L)).as("n2"),
      sum(when(col("__f"), col("__2r")).otherwise(lit(0L))).as("__2s1"))
    val n1 = col("n1").cast("double")
    val n2 = col("n2").cast("double")
    val n = n1 + n2
    val u1 = (col("__2s1").cast("double") - n1 * (n1 + 1)) / 2
    val mu = n1 * n2 / 2
    val sig2 = n1 * n2 / 12 * ((n + 1) - col("__tie") / (n * (n - 1)))
    agg.join(tieAgg, groupCols).select(keys ++ Seq(col("n1"), col("n2"),
      Funcs.r(u1).as("u1"),
      Funcs.r(when(sig2 > 0, (u1 - mu) / sqrt(sig2)).otherwise(lit(0.0)))
        .as("mw_z"),
      Funcs.r(when(col("n1") * col("n2") > 0, u1 / (n1 * n2))
        .otherwise(lit(0.0))).as("cles")): _*)
  }

  /** Kruskal–Wallis H per group — the k-sample extension of
    * [[mannWhitneyU]] (one-way ANOVA on ranks): with R_j the rank sum
    * of sample j over the combined average ranks,
    * H = [12/(n(n+1)) · Σ_j R_j²/n_j − 3(n+1)] / [1 − Σ(t³−t)/(n³−n)]
    * (tie-corrected denominator; compare to χ²_{k−1}). Does ANY of k
    * segments draw its values from a shifted distribution — the
    * multi-segment screen run before pairwise [[mannWhitneyU]] drills.
    *
    * Same exactness discipline: 4dp-grid values, the 2·rank + t − 1
    * integer device (2R_j is an exact long), every statistic a
    * deterministic transform — the Σ R_j²/n_j terms are bit-identical
    * doubles in any engine and only their k-term sum order can differ
    * (ulp-level, absorbed by the 4dp output rounding; the q111 sum
    * precedent). One rank window + two aggregates on the group key,
    * no pair join — fact-linear. Degenerate groups (n < 2 or all
    * values tied: correction ≤ 0) report H = 0. */
  def kruskalWallis(df: DataFrame, groupCols: Seq[String], sample: Column,
                    value: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keys = groupCols.map(col)
    // same NULL hazard as [[mannWhitneyU]]: a NULL sample id or value
    // must not enter the combined ranking
    val base = df.select(keys ++ Seq(sample.cast("string").as("__g"),
      Funcs.r(value).as("__v")): _*)
      .filter(col("__g").isNotNull && col("__v").isNotNull)
    val w = Window.partitionBy(keys: _*).orderBy(col("__v"))
    val tw = Window.partitionBy((keys :+ col("__v")): _*)
    val ranked = base.withColumn("__2r",
      (lit(2L) * rank().over(w) + count(lit(1)).over(tw) - 1).cast("long"))
    val perSample = ranked.groupBy((keys :+ col("__g")): _*)
      .agg(count(lit(1)).as("__nj"), sum(col("__2r")).as("__2rj"))
    val grp = perSample.groupBy(keys: _*).agg(
      count(lit(1)).as("k_samples"),
      sum(col("__nj")).as("n_obs"),
      // Σ R_j²/n_j = Σ (2R_j)²/(4 n_j); 2R_j squared as a double —
      // (2R_j)² passes 2⁶³ at fact scale, and double(long)² is
      // engine-deterministic
      sum(col("__2rj").cast("double") * col("__2rj").cast("double")
        / (lit(4L) * col("__nj"))).as("__sumT"))
    val ties = base.groupBy((keys :+ col("__v")): _*)
      .agg(count(lit(1)).cast("double").as("__t"))
      .groupBy(keys: _*)
      .agg(sum(col("__t") * col("__t") * col("__t") - col("__t")).as("__tie"))
    val n = col("n_obs").cast("double")
    val hRaw = lit(12.0) / (n * (n + 1)) * col("__sumT") - lit(3.0) * (n + 1)
    val corr = lit(1.0) - col("__tie") / (n * n * n - n)
    grp.join(ties, groupCols).select(keys ++ Seq(col("k_samples"),
      col("n_obs"),
      Funcs.r(when(n > 1 && corr > 0, hRaw / corr).otherwise(lit(0.0)))
        .as("kw_h")): _*)
  }

  /** Wilcoxon signed-rank test per group — the PAIRED member of the
    * nonparametric family ([[mannWhitneyU]] compares two independent
    * samples; this compares matched pairs, e.g. the same entity
    * before/after): with dᵢ = aᵢ − bᵢ (4dp-rounded, zeros dropped per
    * the standard Wilcoxon treatment), rank |dᵢ| with average ranks,
    * W⁺ = Σ ranks of positive d, and the tie-corrected normal
    * approximation z = (W⁺ − n(n+1)/4)/σ with
    * σ² = n(n+1)(2n+1)/24 − Σ(t³−t)/48. The rank-biserial effect size
    * r = 2(W⁺ − W⁻)/(n(n+1)) accompanies (matched-pairs effect
    * direction/magnitude without a normality assumption).
    *
    * Exactness: d rounds to the 4dp grid (sign and tie detection exact
    * cross-engine); average ranks ride the 2·rank + t − 1 integer
    * device, so 2W⁺ is an exact long and every statistic is a
    * deterministic transform of exact integers. One rank window + one
    * aggregate on the group key — fact-linear, no pair join. NULL a/b
    * rows are dropped up front (the [[mannWhitneyU]] NULL contract).
    * No continuity correction (document vs scipy's default). Groups
    * whose every pair is tied (n = 0 after the zero-drop) have no
    * surviving rows and are therefore ABSENT from the output; only
    * groups with surviving rows but σ = 0 report z = 0 (the oracle
    * behaves identically — r16 ADVICE doc fix). */
  def wilcoxonSignedRank(df: DataFrame, groupCols: Seq[String], a: Column,
                         b: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keys = groupCols.map(col)
    val base = df.select(keys :+ Funcs.r(a - b).as("__d"): _*)
      .filter(col("__d").isNotNull && col("__d") =!= 0.0)
      .withColumn("__ad", abs(col("__d")))
    val w = Window.partitionBy(keys: _*).orderBy(col("__ad"))
    val tw = Window.partitionBy((keys :+ col("__ad")): _*)
    val ranked = base.withColumn("__2r",
      (lit(2L) * rank().over(w) + count(lit(1)).over(tw) - 1).cast("long"))
    val ties = base.groupBy((keys :+ col("__ad")): _*)
      .agg(count(lit(1)).cast("double").as("__t"))
      .groupBy(keys: _*)
      .agg(sum(col("__t") * col("__t") * col("__t") - col("__t")).as("__tie"))
    val agg = ranked.groupBy(keys: _*).agg(
      count(lit(1)).as("n_pairs"),
      sum(when(col("__d") > 0, col("__2r")).otherwise(lit(0L))).as("__2wp"))
    val n = col("n_pairs").cast("double")
    val wPlus = col("__2wp").cast("double") / 2
    val mu = n * (n + 1) / 4
    val sig2 = n * (n + 1) * (lit(2.0) * n + 1) / 24 - col("__tie") / 48
    agg.join(ties, groupCols).select(keys ++ Seq(col("n_pairs"),
      Funcs.r(wPlus).as("w_plus"),
      Funcs.r(when(sig2 > 0, (wPlus - mu) / sqrt(sig2)).otherwise(lit(0.0)))
        .as("wsr_z"),
      // W⁻ = n(n+1)/2 − W⁺, so r_rb = 2(W⁺−W⁻)/(n(n+1)) = 4W⁺/(n(n+1)) − 1
      Funcs.r(when(col("n_pairs") > 0,
        lit(4.0) * wPlus / (n * (n + 1)) - 1).otherwise(lit(0.0)))
        .as("rank_biserial")): _*)
  }

  /** Friedman test per group — the BLOCKED k-sample member of the
    * family ([[kruskalWallis]] assumes independent samples; this ranks
    * WITHIN each block, e.g. each supplier's quarters against each
    * other, so between-block level differences cancel): with average
    * ranks r_bj of the k treatments within block b and rank sums
    * R_j = Σ_b r_bj, the tie-general statistic
    *   χ²_F = (k−1)·[Σ_j R_j² − n²k(k+1)²/4] / [Σ_{b,j} r_bj² − nk(k+1)²/4]
    * (reduces to the textbook 12/(nk(k+1))·ΣR_j² − 3n(k+1) when no
    * ties; compare to χ²_{k−1}).
    *
    * Blocks must be COMPLETE (one row per treatment): the operator
    * keeps blocks with EXACTLY one row per treatment — row count = k
    * AND distinct treatments = k, so a block like {t1,t1,t2} with a
    * duplicated treatment masking a missing one is dropped, not
    * silently admitted (r16 ADVICE) — and reports kept blocks as
    * n_blocks; incomplete blocks would shift every R_j, so dropping
    * them is the standard treatment.
    * Exactness: values round to the 4dp grid; within-block average
    * ranks ride 2·rank + t − 1 (2R_j and Σ(2r)² are exact longs);
    * NULL treatment/value rows are dropped up front. Degenerate
    * groups (k < 2, n = 0, or an all-tied denominator) report 0. */
  def friedman(df: DataFrame, groupCols: Seq[String], block: Column,
               treatment: Column, value: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keys = groupCols.map(col)
    val base = df.select(keys ++ Seq(block.cast("string").as("__b"),
      treatment.cast("string").as("__j"), Funcs.r(value).as("__v")): _*)
      .filter(col("__b").isNotNull && col("__j").isNotNull &&
        col("__v").isNotNull)
    // k = treatments observed in the group; keep complete blocks only
    val kPer = base.groupBy(keys: _*)
      .agg(countDistinct(col("__j")).as("__k"))
    val blockSize = Window.partitionBy((keys :+ col("__b")): _*)
    val complete = base.join(broadcast(kPer), groupCols)
      .withColumn("__bn", count(lit(1)).over(blockSize))
      // distinct treatments per block via collect_set (bounded by k —
      // the treatment alphabet, never the fact grain); row count alone
      // would admit a duplicated treatment masking a missing one
      .withColumn("__bk", size(collect_set(col("__j")).over(blockSize)))
      .filter(col("__bn") === col("__k") && col("__bk") === col("__k"))
    val w = Window.partitionBy((keys :+ col("__b")): _*).orderBy(col("__v"))
    val tw = Window.partitionBy((keys ++ Seq(col("__b"), col("__v"))): _*)
    val ranked = complete.withColumn("__2r",
      (lit(2L) * rank().over(w) + count(lit(1)).over(tw) - 1).cast("long"))
    val perTreat = ranked.groupBy((keys :+ col("__j")): _*)
      .agg(first(col("__k")).as("__k"), sum(col("__2r")).as("__2rj"),
        // Σ r² within the treatment as exact quarter-integers: (2r)²/4
        sum(col("__2r") * col("__2r")).as("__4r2"),
        count(lit(1)).as("__nb"))
    val grp = perTreat.groupBy(keys: _*).agg(
      first(col("__k")).cast("double").as("k_treatments"),
      (sum(col("__nb")) / first(col("__k"))).cast("double").as("n_blocks"),
      // Σ_j R_j² = Σ_j (2R_j)²/4 — (2R_j)² as double(long)·double(long),
      // engine-deterministic (the q330 device)
      sum(col("__2rj").cast("double") * col("__2rj").cast("double") / lit(4.0))
        .as("__sum_bigr2"),
      sum(col("__4r2").cast("double") / lit(4.0)).as("__sum_litr2"))
    val k = col("k_treatments")
    val n = col("n_blocks")
    val num = col("__sum_bigr2") - n * n * k * (k + 1) * (k + 1) / 4
    val den = col("__sum_litr2") - n * k * (k + 1) * (k + 1) / 4
    grp.select(keys ++ Seq(k.cast("long").as("k_treatments"),
      n.cast("long").as("n_blocks"),
      Funcs.r(when(k >= 2 && n >= 1 && den > 0, (k - 1) * num / den)
        .otherwise(lit(0.0))).as("friedman_chi2")): _*)
  }

  /** Hodges–Lehmann shift estimator per group — the EFFECT-SIZE
    * companion the rank tests imply (the estimator associated with
    * [[mannWhitneyU]]): Δ̂ = median over all cross pairs of
    * (x_i − y_j), x from the `inSample` subset, y from the rest. The
    * one-sample/paired variant (associated with [[wilcoxonSignedRank]])
    * is the median of Walsh averages (xᵢ+xⱼ)/2, i ≤ j — pass the
    * differences as `value` with `inSample = lit(true)` and read
    * `hl_center`. Robust location shift: 29% breakdown, no normality
    * or symmetry-of-tails assumption, directly the "how much higher
    * does the discounted segment ship" number q329's z only tests.
    *
    * Scale shape: an n₁×n₂ pair join per group — the [[kendall]] /
    * [[graft.operators.Ols.theilSen]] cost model: run at an aggregate
    * grain (entity-level points, thousands per group), not fact rows;
    * for longer series the Lehmer pair-sampling device
    * ([[kendallTauSampled]]) transplants verbatim. Values round to the
    * 4dp grid; differences/averages of grid values are deterministic
    * doubles and the median is the exact `percentile` — every engine
    * replays it bit-identically. Groups missing either side are
    * absent. */
  def hodgesLehmannShift(df: DataFrame, groupCols: Seq[String],
                         inSample: Column, value: Column): DataFrame = {
    val keys = groupCols.map(col)
    val base = df.select(keys ++ Seq(inSample.cast("boolean").as("__f"),
      Funcs.r(value).as("__v")): _*)
      .filter(col("__f").isNotNull && col("__v").isNotNull)
    val xs = base.filter(col("__f")).select(keys :+ col("__v").as("__x"): _*)
    val ys = base.filter(!col("__f")).select(keys :+ col("__v").as("__y"): _*)
    xs.join(ys, groupCols)
      .select(keys :+ Funcs.r(col("__x") - col("__y")).as("__d"): _*)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_pairs"),
        Funcs.r(percentile(col("__d"), lit(0.5))).as("hl_shift"))
  }

  /** One-sample Hodges–Lehmann pseudo-median per group: the median of
    * Walsh averages (xᵢ + xⱼ)/2 over i ≤ j (self-pairs included, the
    * standard definition) — [[wilcoxonSignedRank]]'s associated
    * location estimator. Same pair-join cost model and determinism
    * discipline as [[hodgesLehmannShift]]. */
  def hodgesLehmannCenter(df: DataFrame, groupCols: Seq[String],
                          value: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keys = groupCols.map(col)
    val base = df.select(keys :+ Funcs.r(value).as("__v"): _*)
      .filter(col("__v").isNotNull)
    val w = Window.partitionBy(keys: _*).orderBy(col("__v"))
    val idxd = base.withColumn("__i", row_number().over(w))
    val a = idxd.select(keys ++ Seq(col("__i").as("__ia"), col("__v").as("__x")): _*)
    val b = idxd.select(keys ++ Seq(col("__i").as("__ib"), col("__v").as("__y")): _*)
    a.join(b, groupCols).filter(col("__ia") <= col("__ib"))
      .select(keys :+ Funcs.r((col("__x") + col("__y")) / 2).as("__w"): _*)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_walsh"),
        Funcs.r(percentile(col("__w"), lit(0.5))).as("hl_center"))
  }

  /** Out-of-fold target encoding — the leakage-safe variant used when
    * the encoding is consumed by the SAME training rows it was fit on
    * (fit-on-train [[targetEncode]] covers the train/score split;
    * this covers in-train features, the K-fold scheme of the
    * reference's CV stack, src/models/lightgbm_master.py CV loop).
    * A row in fold f gets the category mean computed from the OTHER
    * folds only: `(pos − pos_f + m·prior) / (n − n_f + m)`, smoothed
    * toward the global prior like the plain encoder.
    *
    * Folds are assigned by the portable Lehmer hash of `rowKey`
    * (deterministic, engine-portable, cluster-stable) so the same row
    * lands in the same fold in every engine and every run.
    *
    * Scale shape: ONE hash-aggregate to the (category, fold) grain —
    * bounded by |cats|·K, never fact-sized — then per-category totals
    * via a window over that tiny grain and the global prior via a
    * broadcast 1-row join. Join the result back to the fact on
    * (category, fold), broadcast. Returns (catCol, fold, n_fold, enc_oof). */
  def targetEncodeOof(df: DataFrame, catCol: String, rowKey: Column,
                      label: Column, folds: Int, m: Double): DataFrame = {
    require(folds >= 2, "out-of-fold encoding needs at least 2 folds")
    // |cats|·K rows; checkpointing pins the grain so the prior and the
    // per-category window both read it — ONE scan of the fact, not two
    val perCell = df
      .withColumn("__fold", graft.functions.PortableHash.lehmer(rowKey) % folds)
      .groupBy(col(catCol), col("__fold"))
      .agg(count(lit(1)).as("n_fold"), sum(label.cast("long")).as("__pos_f"))
      .localCheckpoint(true)
    val wCat = org.apache.spark.sql.expressions.Window.partitionBy(col(catCol))
    val prior = perCell.agg((sum(col("__pos_f")) / sum(col("n_fold"))).as("__prior"))
    perCell
      .withColumn("__n", sum(col("n_fold")).over(wCat))
      .withColumn("__pos", sum(col("__pos_f")).over(wCat))
      .crossJoin(broadcast(prior))
      .select(col(catCol), col("__fold").as("fold"), col("n_fold"),
        Funcs.r((col("__pos") - col("__pos_f") + lit(m) * col("__prior"))
          / (col("__n") - col("n_fold") + lit(m))).as("enc_oof"))
  }
}
