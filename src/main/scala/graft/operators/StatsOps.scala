package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic second-order statistics (variance/stddev/correlation)
  * via DECIMAL-exact moment sums.
  *
  * Spark's built-in `corr`/`stddev` aggregates accumulate doubles, so the
  * result depends on partition merge order — re-running the same query
  * can flip last bits, and no cross-engine oracle can pin it. Summing the
  * moments (Σx, Σx², Σxy …) as decimals instead is exact and
  * order-independent; the closed-form combination into corr/stddev is
  * then a FIXED sequence of IEEE double ops on identical inputs →
  * bit-identical on any engine that mirrors the expression. One ordinary
  * hash aggregate (map-side partial), same cost shape as a plain sum.
  */
object StatsOps {

  /** Per-group n, mean, sample stddev of `x`, and Pearson correlation of
    * (x, y), all deterministic. `scale` = input decimal scale (2 for
    * money-like columns).
    *
    * NULL handling: complete-case — a row where EITHER x or y is null is
    * excluded from n and every moment (the SQL-standard CORR contract).
    * Counting all rows while the sums skip nulls would silently compute
    * mean/stddev/corr with an inconsistent n.
    */
  def exactStats(
      df: DataFrame,
      groupCols: Seq[String],
      x: Column,
      y: Column,
      scale: Int = 2
  ): DataFrame = {
    val bothPresent = x.isNotNull && y.isNotNull
    val xd = when(bothPresent, x).cast(s"decimal(18,$scale)")
    val yd = when(bothPresent, y).cast(s"decimal(18,$scale)")
    val s2 = scale * 2
    val moments = df
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(when(bothPresent, 1)).as("n"),
        sum(xd).cast("decimal(38," + scale + ")").cast("double").as("sx"),
        sum(yd).cast("decimal(38," + scale + ")").cast("double").as("sy"),
        sum((xd * xd).cast(s"decimal(38,$s2)")).cast(s"decimal(38,$s2)").cast("double").as("sxx"),
        sum((yd * yd).cast(s"decimal(38,$s2)")).cast(s"decimal(38,$s2)").cast("double").as("syy"),
        sum((xd * yd).cast(s"decimal(38,$s2)")).cast(s"decimal(38,$s2)").cast("double").as("sxy"))
    val n = col("n").cast("double")
    // fixed operation order — the DuckDB oracle mirrors this expression
    // token for token (see SparkEntry.oracleSql q24_stats)
    moments.select(
      (groupCols.map(col) ++ Seq(
        col("n"),
        (col("sx") / n).as("mean_x"),
        sqrt((col("sxx") - col("sx") * col("sx") / n) / (n - lit(1d))).as("stddev_x"),
        ((n * col("sxy") - col("sx") * col("sy")) /
          sqrt((n * col("sxx") - col("sx") * col("sx")) * (n * col("syy") - col("sy") * col("sy"))))
          .as("corr_xy"))): _*)
  }

  /** Per-group z-score standardization (feature scaling): two passes —
    * decimal-exact (n, Σx, Σx²) per group, then one join back and a FIXED
    * IEEE expression per row, so the standardized value is deterministic
    * and cross-engine exact (Spark's stddev aggregate is partition-order
    * dependent; these moment sums are not). Group count ≪ rows, so the
    * moments side is tiny — no broadcast hint needed, AQE picks it.
    * Sample (n-1) stddev; single-row groups get z = NULL (0/0 guarded).
    */
  def zscore(
      df: DataFrame,
      groupCols: Seq[String],
      x: Column,
      outCol: String = "z",
      scale: Int = 2
  ): DataFrame = {
    // the helper columns below are injected into the caller's frame and
    // dropped again — a caller column with one of these names would be
    // silently overwritten (same guard style as capPerKey/asofNearest)
    val reserved = Set("__n", "__sx", "__sxx", "__mean", "__sd", "__zl", "__zr")
    val clash = df.columns.filter(c => reserved(c))
    require(clash.isEmpty,
      s"zscore: input columns collide with reserved helper names: ${clash.mkString(", ")}")
    require(!reserved(outCol), s"zscore: outCol '$outCol' is a reserved helper name")
    val xd = x.cast(s"decimal(18,$scale)")
    val s2 = scale * 2
    val moments = df
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(when(x.isNotNull, 1)).as("__n"),
        sum(xd).cast(s"decimal(38,$scale)").cast("double").as("__sx"),
        sum((xd * xd).cast(s"decimal(38,$s2)")).cast(s"decimal(38,$s2)").cast("double").as("__sxx"))
    val n = col("__n").cast("double")
    // ANSI-safe: n ≤ 1 has no sample stddev (and n = 0 no mean) — yield
    // null instead of a divide-by-zero
    val withStats = moments.select(
      (groupCols.map(col) ++ Seq(
        when(col("__n") > 0, col("__sx") / n).as("__mean"),
        when(col("__n") > 1,
          sqrt((col("__sxx") - col("__sx") * col("__sx") / n) / (n - lit(1d)))).as("__sd"))): _*)
    // NULL-SAFE join back: groupBy treats null as a group, but an equi
    // join would drop null-keyed rows (null ≠ null) — <=> keeps them
    val l = df.alias("__zl")
    val r = withStats.alias("__zr")
    val cond = groupCols.map(c => col(s"__zl.$c") <=> col(s"__zr.$c")).reduce(_ && _)
    l.join(r, cond)
      .select((df.columns.map(c => col(s"__zl.$c")) :+ col("__mean") :+ col("__sd")): _*)
      .withColumn(outCol,
        when(col("__sd") > 0, (x.cast("double") - col("__mean")) / col("__sd")))
      .drop("__mean", "__sd")
  }

  /** Per-key median absolute deviation — the robust spread statistic
    * outlier gates use where stddev is poisoned by the very outliers
    * being hunted: mad = median(|x - median(x)|). Two exact-percentile
    * passes: per-key medians first (partial-aggregated percentile, no
    * sort shuffle of raw rows beyond the agg), broadcast-or-shuffle
    * joined back (unhinted — key cardinality is the caller's regime,
    * AQE decides), then the deviation percentile. Exact percentile holds
    * per-key value multisets in the aggregation buffer — fine while a
    * single key's row count fits an executor (the same caveat as
    * `q19_percentile`); at hot-key scale swap `percentile` for
    * `approx_percentile` with identical plan shape.
    */
  def madByKey(df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    val med = df.groupBy(col(keyCol))
      .agg(expr(s"percentile($valCol, 0.5)").as("med"))
    df.join(med, keyCol :: Nil)
      .groupBy(col(keyCol))
      .agg(
        first(col("med")).as("med"),
        expr(s"percentile(abs($valCol - med), 0.5)").as("mad"))
  }

  /** Per-key winsorization: clip `valCol` to its key-local [lo, hi]
    * quantiles — the outlier treatment that keeps rows (unlike a filter)
    * while bounding the leverage any single value has on downstream
    * means/models. Quantiles per key come from ONE exact-percentile
    * aggregation (vocab-of-keys-sized result), rejoined unhinted so AQE
    * broadcasts when keys are few and shuffle-joins when they aren't;
    * the clip itself is a pure projection. Same hot-key caveat as
    * [[madByKey]]: exact percentile buffers one key's values in the
    * aggregation buffer — swap in approx_percentile past that regime.
    */
  def winsorizeByKey(
      df: DataFrame,
      keyCol: String,
      valCol: String,
      lo: Double,
      hi: Double,
      outCol: String = "v_w"
  ): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, "need 0 <= lo < hi <= 1")
    require(!df.columns.contains(outCol), s"winsorizeByKey: outCol '$outCol' already exists")
    val q = df.groupBy(col(keyCol))
      .agg(
        expr(s"percentile($valCol, $lo)").as("__qlo"),
        expr(s"percentile($valCol, $hi)").as("__qhi"))
    df.join(q, keyCol :: Nil)
      .withColumn(outCol,
        when(col(valCol) < col("__qlo"), col("__qlo"))
          .when(col(valCol) > col("__qhi"), col("__qhi"))
          .otherwise(col(valCol).cast("double")))
      .drop("__qlo", "__qhi")
  }

  /** Per-key MERGEABLE distinct sketches (DataSketches HLL): the
    * incremental-analytics primitive — build one sketch row per key (per
    * day/partition) ONCE, persist the tiny table, and answer "distinct
    * over any key range" later by merging sketches, never rescanning the
    * raw 100 TB. `lgK = 12` ⇒ ~1.6 % standard error in ~4 KB per sketch;
    * a year of daily sketches is ~1.5 MB. Unlike
    * `approx_count_distinct`'s per-query sketch, these rows COMPOSE:
    * union is associative, so daily jobs append and any window query
    * merges. */
  def distinctSketches(df: DataFrame, keyCol: String, valCol: String, lgK: Int = 12): DataFrame =
    df.groupBy(col(keyCol)).agg(hll_sketch_agg(col(valCol), lit(lgK)).as("sketch"))

  /** Merged distinct estimate over a (filtered) sketch table — the query
    * side of [[distinctSketches]]. One tiny aggregation over sketch rows. */
  def unionDistinctEstimate(sketches: DataFrame, sketchCol: String = "sketch"): DataFrame =
    sketches.agg(hll_sketch_estimate(hll_union_agg(col(sketchCol), lit(false))).as("est_distinct"))

  /** Bounded exponentially-weighted moving value (α = 1/2 over the last
    * `k` rows per key, k ≤ 63): every weight 2⁻ʲ is a power of two, so
    * v·2⁻ʲ is EXACT in IEEE double and the fixed left-to-right chain sum
    * is bit-identical across engines and replays — the usual "EWMA is
    * FP-recursive and engine-divergent" objection disappears by
    * construction. One keyed sort serves all k lag terms. Adds an
    * `ewma` column; rows keep their identity (callers pick latest-row,
    * threshold, etc.).
    */
  def boundedEwma(
      df: DataFrame,
      keyCol: String,
      orderCols: Seq[String],
      valCol: String,
      k: Int
  ): DataFrame = {
    require(k >= 1 && k <= 63, s"boundedEwma: k must be in [1, 63], got $k")
    val wo = Window.partitionBy(keyCol).orderBy(orderCols.map(col): _*)
    val lags = (0 until k).map(j => lag(col(valCol), j).over(wo))
    val num = lags.zipWithIndex
      .map { case (l, j) => coalesce(l * lit(math.pow(0.5, j)), lit(0.0)) }
      .reduce(_ + _)
    val den = lags.zipWithIndex
      .map { case (l, j) => when(l.isNotNull, lit(math.pow(0.5, j))).otherwise(lit(0.0)) }
      .reduce(_ + _)
    df.withColumn("ewma", num / den)
  }

  /** Trailing-window z-score anomaly flags, engine-exact: the rolling
    * moments are DECIMAL window sums (order-independent, so replay- and
    * engine-stable), and mean/var/z are a FIXED closed-form double
    * expression the oracle mirrors token-for-token — the windowed
    * sibling of [[exactStats]]. One keyed sort serves both moment
    * windows. Returns rows with |z| > `zThresh` whose window holds at
    * least `minN` points (small windows flag everything; a cold key
    * must earn its baseline first).
    */
  def rollingZScore(
      df: DataFrame,
      keyCol: String,
      orderCols: Seq[String],
      valCol: String,
      window: Int,
      minN: Int,
      zThresh: Double
  ): DataFrame = {
    val w = Window.partitionBy(keyCol)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-(window - 1), Window.currentRow)
    val vdec = col(valCol).cast("decimal(18,2)")
    val s1 = sum(vdec).over(w).cast("decimal(38,2)").cast("double")
    val s2 = sum((vdec * vdec).cast("decimal(37,4)")).over(w).cast("decimal(38,4)").cast("double")
    val n = count(lit(1)).over(w).cast("double")
    df.withColumn("__s1", s1).withColumn("__s2", s2).withColumn("__n", n)
      .withColumn("mean", col("__s1") / col("__n"))
      .withColumn("variance", col("__s2") / col("__n") - col("mean") * col("mean"))
      .withColumn("z",
        (vdec.cast("double") - col("mean")) / sqrt(greatest(col("variance"), lit(1e-12))))
      .filter(col("__n") >= minN && abs(col("z")) > zThresh)
      .drop("__s1", "__s2", "__n")
  }

  /** Rolling `window`-key distinct estimate from the mergeable per-key
    * sketch table (e.g. 7-day rolling distinct users from daily HLL
    * rows): for each key, union the sketches of [key-window+1, key] and
    * estimate. This is THE reason the sketch table exists — the rolling
    * series comes from KEY-COUNT-sized rows (one per day), never from
    * rescanning the raw events. The range self-join is over two
    * day-count-sized frames (a year = 365 rows), a broadcast
    * nested-loop at any corpus scale; `keyCol` must be integral. */
  def rollingDistinctEstimate(
      df: DataFrame,
      keyCol: String,
      valCol: String,
      window: Int,
      lgK: Int = 12
  ): DataFrame = {
    val sk = distinctSketches(df, keyCol, valCol, lgK)
    val src = sk.select(col(keyCol).as("__src_key"), col("sketch"))
    sk.select(col(keyCol))
      .join(src,
        col("__src_key") >= col(keyCol) - (window - 1) && col("__src_key") <= col(keyCol))
      .groupBy(keyCol)
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false))).as("est"))
  }

  /** Exact ROC-AUC per group, computed WITHOUT the textbook global
    * rank sort (a single-partition window over every scored row — the
    * classic scale trap). Uses the Mann-Whitney pair identity on the
    * SCORE DISTRIBUTION instead:
    *
    *   AUC = [Σ_s pos(s)·negBelow(s) + ½·Σ_s pos(s)·neg(s)] / (P·N)
    *
    * One shuffle aggregates rows to (group, score) counts; the
    * cumulative pass runs over the distinct-score domain (integer
    * milli-scores → thousands of rows per group, independent of corpus
    * size). All counting in DECIMAL(38,0) — P·N overflows BIGINT at
    * ~10^10 rows — with ONE double division at the end, so the value is
    * replay-stable and cross-engine exact (ties handled by the ½ term,
    * identical to averaged ranks).
    */
  def aucExact(
      df: DataFrame,
      groupCol: String,
      scoreCol: String,
      labelCol: String // boolean: true = positive
  ): DataFrame = {
    val counts = df
      .groupBy(col(groupCol), col(scoreCol).as("s"))
      .agg(
        count(when(col(labelCol), 1)).as("p"),
        count(when(!col(labelCol), 1)).as("q"))
    val w = Window.partitionBy(groupCol).orderBy("s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val d38 = "decimal(38,0)"
    counts
      .withColumn("q_below", coalesce(sum("q").over(w), lit(0L)))
      .groupBy(groupCol)
      .agg(
        sum("p").cast("bigint").as("n_pos"),
        sum("q").cast("bigint").as("n_neg"),
        sum((col("p").cast(d38) * lit(2) * col("q_below").cast(d38) +
          col("p").cast(d38) * col("q").cast(d38)).cast(d38)).cast(d38).as("num2"))
      .select(col(groupCol), col("n_pos"), col("n_neg"),
        (col("num2").cast("double") /
          (col("n_pos").cast(d38) * lit(2) * col("n_neg").cast(d38)).cast("double"))
          .as("auc"))
      .orderBy(groupCol)
  }

  /** Per-group skewness and excess kurtosis from integer-exact power
    * sums: the value is scaled to integer cents, Σc, Σc², Σc³, Σc⁴
    * accumulate in DECIMAL(38,0) (order-independent, so the shuffle
    * merge order can't flip bits), and the standardized moments are a
    * FIXED closed-form double expression on those exact sums — skew and
    * kurtosis are scale-invariant, so the cents scaling cancels and no
    * double rescale is ever applied. Cross-engine exact: the DuckDB twin
    * mirrors the expression token for token (HUGEINT sums there).
    * Single hash aggregate with map-side partials; no window, no sort.
    */
  def momentsReport(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val cents = (col(valCol).cast("decimal(18,2)") * 100).cast(d38)
    val moments = df
      .withColumn("c", cents)
      .groupBy(groupCol)
      .agg(
        count(col("c")).as("n"),
        sum(col("c")).cast(d38).cast("double").as("s1"),
        sum((col("c") * col("c")).cast(d38)).cast(d38).cast("double").as("s2"),
        sum((col("c") * col("c") * col("c")).cast(d38)).cast(d38).cast("double").as("s3"),
        sum((col("c") * col("c") * col("c") * col("c")).cast(d38)).cast(d38).cast("double").as("s4"))
    // fixed IEEE op order, mirrored verbatim by the oracle
    moments.selectExpr(
      groupCol, "n",
      "s1 / n AS mean_cents",
      "s2 / n - (s1 / n) * (s1 / n) AS m2",
      "s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3",
      "s4 / n - 4 * (s1 / n) * (s3 / n) + 6 * (s1 / n) * (s1 / n) * (s2 / n) - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4")
      .selectExpr(
        groupCol, "n",
        "m3 / (m2 * sqrt(m2)) AS skewness",
        "m4 / (m2 * m2) - 3.0 AS kurtosis_excess")
      .orderBy(groupCol)
  }

  /** Exact tie-averaged Spearman rank correlation of (x, y) per group.
    *
    * Ranks are SQL-standard AVERAGE ranks (ties share the mean of their
    * positions). To stay integer-exact AND scale-safe, the doubled rank
    * a = 2·avgrank = 2·(rows strictly before) + ties + 1 is computed per
    * DISTINCT VALUE — never through a per-row rank window — on the
    * banded running-sum core ([[RankOps.bandedRankCum]] over the
    * (group, value) table, band = value div 2^bandBits), so no
    * value-domain-sized single partition exists anywhere. The earlier-
    * groups offset is the group's MIN cumulative (an aggregate, not
    * another window). Row-level rank moments Σa, Σb, Σa², Σb², Σab
    * accumulate in DECIMAL(38,0) (exact to n ≈ 3·10¹²; a ≤ 2n); the
    * Pearson-on-ranks combine is a FIXED double expression the DuckDB
    * oracle mirrors token for token. Single-value groups yield NULL
    * (0/0). `x` should be the bounded-domain variable (its value table
    * is broadcast); `y` may be near-unique (value table meets the rows
    * in a shuffle join).
    */
  def spearmanByGroup(
      df: DataFrame,
      groupCol: String,
      x: Column,
      y: Column,
      bandBits: Int = 20): DataFrame = {
    val rows = df
      .select(col(groupCol).as("g"), x.cast("long").as("x"), y.cast("long").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      // spread: the scan is a 1-task single-file read, and all four
      // consumers (x/y value tables, the moment join's probe side, the
      // group offsets) otherwise re-ran the whole serial scan — their
      // stages launch concurrently, so even a lazy checkpoint raced its
      // own first materialization (measured 4×). Above the spread
      // EXCHANGE the race is harmless: shuffle output is written once
      // and every consumer re-reads it, so the lazy pin (which keeps
      // the subtree visible to the plan audits) is the right one.
      .transform(Par.spread)
      .transform(Ckpt.lazyCkpt)
    def ar2(vcol: String): DataFrame = {
      val vt = rows.groupBy("g", vcol).agg(count(lit(1)).cast("long").as("c"))
        .withColumn("_band", RankOps.idiv(col(vcol), 1L << bandBits))
      val cum = RankOps.bandedRankCum(vt,
        bandCols = Seq("g", "_band"),
        bandSort = Seq(col("g"), col("_band")),
        rowSort = Seq(col("g"), col(vcol)),
        cumCols = Seq("c"), rankName = "_vrk")
      val gOff = cum.groupBy("g").agg(min("cum_before_c").as("_goff"))
      cum.join(broadcast(gOff), Seq("g"))
        .select(col("g"), col(vcol),
          (lit(2L) * (col("cum_before_c") - col("_goff")) + col("c") + lit(1L))
            .as(s"ar2_$vcol"))
    }
    // x is the bounded-domain variable by this function's contract, so
    // its VALUE TABLE is domain-sized (|g|·|x-domain| rows) — the
    // banded decomposition is machinery without a purpose there (r15:
    // it cost 4 extra scheduled stages per call). One per-g cumulative
    // window over the tiny vt computes the identical doubled rank:
    // 2·(rows strictly before within g) + ties + 1, all longs.
    def ar2Domain(vcol: String): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val vt = rows.groupBy("g", vcol).agg(count(lit(1)).cast("long").as("c"))
      val wc = Window.partitionBy("g").orderBy(col(vcol))
        .rowsBetween(Window.unboundedPreceding, -1)
      vt.select(col("g"), col(vcol),
        (lit(2L) * coalesce(sum("c").over(wc), lit(0L)) + col("c") + lit(1L))
          .as(s"ar2_$vcol"))
    }
    val withA = rows
      .join(broadcast(ar2Domain("x")), Seq("g", "x"))
      .join(ar2("y"), Seq("g", "y"))
      .select(col("g"),
        col("ar2_x").cast("decimal(19,0)").as("a"),
        col("ar2_y").cast("decimal(19,0)").as("b"))
    def dsum38(c: Column): Column = sum(c).cast("decimal(38,0)").cast("double")
    val m = withA.groupBy("g").agg(
      count(lit(1)).as("n"),
      dsum38(col("a")).as("sa"), dsum38(col("b")).as("sb"),
      dsum38((col("a") * col("a")).cast("decimal(38,0)")).as("saa"),
      dsum38((col("b") * col("b")).cast("decimal(38,0)")).as("sbb"),
      dsum38((col("a") * col("b")).cast("decimal(38,0)")).as("sab"))
    val n = col("n").cast("double")
    m.select(col("g"), col("n"),
      ((n * col("sab") - col("sa") * col("sb")) /
        (sqrt(n * col("saa") - col("sa") * col("sa")) *
          sqrt(n * col("sbb") - col("sb") * col("sb")))).as("spearman_rho"))
  }

  /** Distributed closed-form linear-probe TRAINING: fit
    * y ≈ w0 + w1·x1 + w2·x2 by least squares (normal equations solved
    * with Cramer's rule) plus an in-engine classifier eval at
    * threshold ½ — the 100 TB way to train a linear model: ONE
    * map-side-combined aggregate collects the 9 sufficient statistics
    * (integer-feature moments summed DECIMAL-exact, order-independent),
    * the 3×3 solve and SSE are a FIXED double expression over the 1-row
    * stats (bit-identical on any engine mirroring the order — the
    * exactStats/spearman convention), and the eval pass broadcasts the
    * 1-row model back over the corpus for an integer-exact
    * correct-prediction count. No gradient loop, no driver-side data,
    * no per-row floats inside any sum. Inputs contract: x1, x2, y are
    * integer-valued (counts / 0-1 labels) with |x| small enough that
    * per-row products fit DECIMAL(38,0) — any count feature does.
    */
  def linearProbeFit(df: DataFrame, x1: Column, x2: Column, label: Column): DataFrame = {
    val d0 = df.select(x1.cast("long").as("x1"), x2.cast("long").as("x2"),
      label.cast("long").as("y"))
    val model = linearProbeModel(df, x1, x2, label)
    val pred = col("w0") + col("w1") * col("x1").cast("double") +
      col("w2") * col("x2").cast("double")
    val eval0 = d0.crossJoin(broadcast(model.select("w0", "w1", "w2")))
      .agg(sum(when((pred > 0.5) === (col("y") === 1), 1L).otherwise(0L)).as("n_correct"))
    model.crossJoin(broadcast(eval0)).select(
      col("n_rows"), col("w0"), col("w1"), col("w2"), col("sse"), col("n_correct"),
      (col("n_correct").cast("double") / col("n_rows").cast("double")).as("accuracy"))
  }

  /** CUPED variance reduction for experiment readouts (Deng et al.
    * WSDM'13 — the industry-standard A/B sensitivity boost): adjust the
    * experiment metric with a PRE-period covariate,
    * Y' = Y − θ(X − X̄) with θ = cov(X,Y)/var(X) pooled across arms, so
    * between-user variance explained by pre-behavior cancels out of the
    * arm comparison. Everything derives from EXACT integer-moment sums
    * (Σx, Σy, Σxy, Σx², Σy² per arm, pooled by addition): the adjusted
    * arm means ȳ_a − θ(x̄_a − x̄) and the variance-reduction ratio
    * 1 − ρ² are fixed double expressions over the 1-row stats — no
    * per-row doubles in any sum, one partial-agg groupBy total.
    * Inputs contract: x, y integer-valued (cents/counts).
    *
    * Pooled θ assumes RANDOMIZED assignment (X ⟂ arm), per the paper;
    * under covariate imbalance the pooled covariance absorbs part of
    * the treatment effect — compute θ from pre-experiment data alone
    * in that case and apply the same adjusted-mean formula.
    */
  def cupedAdjust(df: DataFrame, armCol: String, x: Column, y: Column): DataFrame = {
    val d0 = df.select(col(armCol).as("arm"), x.cast("long").as("x"), y.cast("long").as("y"))
    def d19(c: Column) = c.cast("decimal(19,0)")
    def dsum(c: Column) = sum(c).cast("decimal(38,0)").cast("double")
    val m = d0.groupBy("arm").agg(
      count(lit(1)).as("n"),
      dsum(d19(col("x"))).as("sx"), dsum(d19(col("y"))).as("sy"),
      dsum(d19(col("x")) * d19(col("x"))).as("sxx"),
      dsum(d19(col("y")) * d19(col("y"))).as("syy"),
      dsum(d19(col("x")) * d19(col("y"))).as("sxy"))
      .transform(Ckpt.lazyCkpt) // arms-sized; read by pooled + per-arm
    // pooled moments fold in ARM order (arms-sized double sums — the
    // list-fold order-independence convention)
    val pooled = m
      .select(struct(col("arm"), col("n"), col("sx"), col("sy"),
        col("sxx"), col("syy"), col("sxy")).as("s"))
      .agg(sort_array(collect_list(col("s"))).as("a"))
      .select(
        expr("aggregate(a, CAST(0 AS BIGINT), (acc, v) -> acc + v.n)").as("pn"),
        expr("aggregate(a, CAST(0.0 AS DOUBLE), (acc, v) -> acc + v.sx)").as("psx"),
        expr("aggregate(a, CAST(0.0 AS DOUBLE), (acc, v) -> acc + v.sy)").as("psy"),
        expr("aggregate(a, CAST(0.0 AS DOUBLE), (acc, v) -> acc + v.sxx)").as("psxx"),
        expr("aggregate(a, CAST(0.0 AS DOUBLE), (acc, v) -> acc + v.syy)").as("psyy"),
        expr("aggregate(a, CAST(0.0 AS DOUBLE), (acc, v) -> acc + v.sxy)").as("psxy"))
      .select(col("pn"), (col("psx") / col("pn").cast("double")).as("xbar"),
        // θ = cov/var and ρ² = cov²/(var_x·var_y) via the n-scaled sums
        ((col("pn").cast("double") * col("psxy") - col("psx") * col("psy")) /
          (col("pn").cast("double") * col("psxx") - col("psx") * col("psx"))).as("theta"),
        (((col("pn").cast("double") * col("psxy") - col("psx") * col("psy")) *
          (col("pn").cast("double") * col("psxy") - col("psx") * col("psy"))) /
          ((col("pn").cast("double") * col("psxx") - col("psx") * col("psx")) *
            (col("pn").cast("double") * col("psyy") - col("psy") * col("psy")))).as("rho2"))
    m.crossJoin(broadcast(pooled)).select(
      col("arm"), col("n"),
      (col("sy") / col("n").cast("double")).as("mean_y"),
      (col("sy") / col("n").cast("double") -
        col("theta") * (col("sx") / col("n").cast("double") - col("xbar"))).as("mean_y_adj"),
      col("theta"), (lit(1.0) - col("rho2")).as("var_ratio"))
  }

  /** Expected calibration error of the fitted probe (Guo et al. 2017,
    * the binned ECE): predictions bucketed into `bins` equal-width
    * bins, per-bin |mean prediction − empirical positive rate|,
    * n-weighted into the scalar ECE. Per-row predictions are rounded
    * to 9 decimals and summed as DECIMAL so the per-bin confidence
    * means are ORDER-INDEPENDENT (a raw double sum differs in last
    * bits with partition merge order); bin ids, counts, and positive
    * counts are exact integers. One model-fit pass + one broadcast
    * scoring agg — the linearProbeFit cost shape. Returns per-bin rows
    * (bin, n, frac_pos, avg_conf, gap) with the corpus ECE riding on
    * every row.
    */
  def probeCalibration(
      df: DataFrame,
      x1: Column,
      x2: Column,
      label: Column,
      bins: Int = 10
  ): DataFrame = {
    val d0 = df.select(x1.cast("long").as("x1"), x2.cast("long").as("x2"),
      label.cast("long").as("y"))
    val model = linearProbeModel(df, x1, x2, label).select("w0", "w1", "w2")
    val pred = col("w0") + col("w1") * col("x1").cast("double") +
      col("w2") * col("x2").cast("double")
    val binned = d0.crossJoin(broadcast(model))
      .select(col("y"),
        // clamp into [0, bins-1]: probe output is unbounded
        least(greatest(floor(pred * bins).cast("long"), lit(0L)), lit(bins - 1L)).as("bin"),
        round(pred, 9).cast("decimal(20,9)").as("p9"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("y").as("n_pos"),
        sum("p9").cast("decimal(38,9)").cast("double").as("sum_conf"))
      .select(col("bin"), col("n"), col("n_pos"),
        (col("n_pos").cast("double") / col("n").cast("double")).as("frac_pos"),
        (col("sum_conf") / col("n").cast("double")).as("avg_conf"))
      .withColumn("gap",
        abs(col("avg_conf") - col("frac_pos")))
    // the ECE fold is a ≤`bins`-element DOUBLE sum — made order-
    // independent by folding the collected per-bin terms in BIN order
    // (the events_anova list-fold convention)
    val eceRow = binned
      .select(struct(col("bin"), (col("gap") * col("n").cast("double")).as("gw"), col("n")).as("s"))
      .agg(sort_array(collect_list(col("s"))).as("arr"))
      .select(
        expr("aggregate(arr, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.gw)").as("gap_sum"),
        expr("aggregate(arr, CAST(0 AS BIGINT), (acc, x) -> acc + x.n)").as("n_tot"))
      .select((col("gap_sum") / col("n_tot").cast("double")).as("ece"))
    binned.crossJoin(broadcast(eceRow))
  }

  /** The 1-row fitted model of [[linearProbeFit]] — (n_rows, w0, w1,
    * w2, sse) — for consumers that apply the probe elsewhere
    * (uncertainty sampling, scoring) without the eval pass. */
  def linearProbeModel(df: DataFrame, x1: Column, x2: Column, label: Column): DataFrame = {
    val d0 = df.select(x1.cast("long").as("x1"), x2.cast("long").as("x2"),
      label.cast("long").as("y"))
    def d19(c: Column) = c.cast("decimal(19,0)")
    def dsum(c: Column) = sum(c).cast("decimal(38,0)").cast("double")
    val m = d0.agg(
      count(lit(1)).as("n_rows"),
      dsum(d19(col("x1"))).as("sx1"), dsum(d19(col("x2"))).as("sx2"),
      dsum(d19(col("y"))).as("sy"),
      dsum(d19(col("x1")) * d19(col("x1"))).as("sx11"),
      dsum(d19(col("x2")) * d19(col("x2"))).as("sx22"),
      dsum(d19(col("x1")) * d19(col("x2"))).as("sx12"),
      dsum(d19(col("x1")) * d19(col("y"))).as("sx1y"),
      dsum(d19(col("x2")) * d19(col("y"))).as("sx2y"))
    // Cramer on the symmetric normal matrix [[n,sx1,sx2],[sx1,sx11,sx12],
    // [sx2,sx12,sx22]] against [sy,sx1y,sx2y]; expression order is the
    // cross-engine contract — mirror it exactly in any oracle.
    val a = col("n_rows").cast("double")
    val (b, c0, dd, e, f) = (col("sx1"), col("sx2"), col("sx11"), col("sx12"), col("sx22"))
    val (p, q, r) = (col("sy"), col("sx1y"), col("sx2y"))
    val det = a * (dd * f - e * e) - b * (b * f - e * c0) + c0 * (b * e - dd * c0)
    m.select(col("n_rows"), col("sy"), col("sx1y"), col("sx2y"),
        col("sx1"), col("sx2"), col("sx11"), col("sx12"), col("sx22"),
        ((p * (dd * f - e * e) - b * (q * f - e * r) + c0 * (q * e - dd * r)) / det).as("w0"),
        ((a * (q * f - e * r) - p * (b * f - e * c0) + c0 * (b * r - q * c0)) / det).as("w1"),
        ((a * (dd * r - q * e) - b * (b * r - q * c0) + p * (b * e - dd * c0)) / det).as("w2"))
      .select(col("n_rows"), col("w0"), col("w1"), col("w2"),
        // SSE from the same statistics (y integer ⇒ Σy² = Σy only for
        // 0/1 labels — keep the general Σy² = sy form ONLY for binary y;
        // documented contract): Σ(y−ŷ)² = Σy² − 2wᵀXᵀy + wᵀXᵀXw
        (col("sy") -
          (lit(2.0) * (col("w0") * col("sy") + col("w1") * col("sx1y") + col("w2") * col("sx2y"))) +
          (col("w0") * col("w0") * col("n_rows").cast("double") +
            col("w1") * col("w1") * col("sx11") + col("w2") * col("w2") * col("sx22") +
            lit(2.0) * col("w0") * col("w1") * col("sx1") +
            lit(2.0) * col("w0") * col("w2") * col("sx2") +
            lit(2.0) * col("w1") * col("w2") * col("sx12"))).as("sse"))
  }

  /** Mann-Whitney U test (two-sample Wilcoxon rank-sum) per group — the
    * NONPARAMETRIC experiment readout next to Welch's t
    * (events_ab_test) and CUPED (events_ab_cuped): no normality
    * assumption, robust to the heavy-tailed spend metrics A/B tests
    * actually run on. Exactness contract (the spearmanByGroup
    * convention): 2×average-rank over the POOLED sample is an integer
    * (`ar2 = 2·cum_before + c + 1` off the banded rank-cum — no per-row
    * rank window anywhere), so 2·U_A = Σ_A ar2 − n_A(n_A+1) is an exact
    * integer, as is the tie term Σ(t³−t); the tie-corrected normal
    * z-statistic is then ONE fixed closed-form double expression over
    * those integers — bit-identical on any engine mirroring the token
    * order. Shape: one (g, v) tie-count partial agg, the banded rank
    * cum (no hot partition), one join back, one hash aggregate.
    */
  def mannWhitneyByGroup(
      df: DataFrame,
      groupCol: String,
      armCol: String,
      value: Column,
      armA: String,
      bandBits: Int = 20): DataFrame = {
    val rows = df
      .select(col(groupCol).as("g"), col(armCol).as("arm"), value.cast("long").as("v"))
      .filter(col("v").isNotNull && col("arm").isNotNull)
    val vt = rows.groupBy("g", "v").agg(count(lit(1)).cast("long").as("c"))
      .withColumn("_band", RankOps.idiv(col("v"), 1L << bandBits))
    val cum = RankOps.bandedRankCum(vt,
      bandCols = Seq("g", "_band"),
      bandSort = Seq(col("g"), col("_band")),
      rowSort = Seq(col("g"), col("v")),
      cumCols = Seq("c"), rankName = "_vrk")
    val gOff = cum.groupBy("g").agg(min("cum_before_c").as("_goff"))
    val ar2 = cum.join(broadcast(gOff), Seq("g"))
      .select(col("g"), col("v"),
        (lit(2L) * (col("cum_before_c") - col("_goff")) + col("c") + lit(1L)).as("ar2"))
    // tie term Σ_v (t³ − t), exact (decimal keeps 100 TB tie counts safe)
    val ties = vt.groupBy("g").agg(
      sum((col("c").cast("decimal(38,0)") * col("c") * col("c") - col("c"))
        .cast("decimal(38,0)")).cast("decimal(38,0)").as("tsum"))
    val agg = rows.join(ar2, Seq("g", "v"))
      .groupBy("g")
      .agg(
        count(when(col("arm") === armA, 1)).as("n_a"),
        count(when(col("arm") =!= armA, 1)).as("n_b"),
        sum(when(col("arm") === armA, col("ar2")).otherwise(lit(0L))
          .cast("decimal(38,0)")).cast("decimal(38,0)").as("r2_a"))
      .join(ties, Seq("g"))
    // 2·U_A exact integer; z = (U_A − μ)/σ with μ = n_A n_B/2 and
    // σ² = (n_A n_B/12)·((n+1) − T/(n(n−1))). Token order mirrored by
    // the DuckDB twin.
    val u2 = (col("r2_a") - (col("n_a").cast("decimal(38,0)") * (col("n_a") + lit(1L))))
      .cast("decimal(38,0)")
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val n = (col("n_a") + col("n_b")).cast("double")
    val ua = u2.cast("double") / lit(2.0)
    val mu = na * nb / lit(2.0)
    val tieTerm = col("tsum").cast("double") / (n * (n - lit(1.0)))
    val sig2 = na * nb / lit(12.0) * ((n + lit(1.0)) - tieTerm)
    agg.select(col("g"), col("n_a"), col("n_b"), u2.cast("long").as("u2_a"),
      col("tsum").cast("long").as("tie_sum"),
      ua.as("u_a"),
      when(sig2 > 0, (ua - mu) / sqrt(sig2)).as("z"))
  }

  /** Exponentially-decayed event counts per key — the trending /
    * freshness-weighted leaderboard signal. The STATE is plain integer
    * per-(key, day) counts — mergeable across batches, shards and the
    * stream/batch boundary (the events_agg_maint posture); the decay is
    * applied only AT READ TIME as score = Σ_d n_d · 0.5^(age_d days).
    * Exactness: 0.5^k is an exact power of two and the fold runs in
    * PINNED ascending-age order over the per-key day list (bounded by
    * the corpus's day span, never rows), so batch, stream and the
    * DuckDB twin produce the identical double — no order-dependent
    * float aggregate anywhere.
    */
  def decayedTrend(
      df: DataFrame,
      keyCol: String,
      tsUsCol: String,
      bucketUs: Long = 86400000000L): DataFrame = {
    val b = df.select(col(keyCol).as("k"), RankOps.idiv(col(tsUsCol), bucketUs).as("d"))
    val counts = b.groupBy("k", "d").agg(count(lit(1)).cast("long").as("n"))
    val tmax = counts.agg(max("d").as("dmax"))
    counts.crossJoin(broadcast(tmax)) // 1-row attach
      .withColumn("age", (col("dmax") - col("d")).cast("int"))
      .groupBy("k")
      .agg(sum("n").cast("long").as("n_events"),
        sort_array(collect_list(struct(col("age"), col("n")))).as("cells"))
      .select(col("k"), col("n_events"),
        aggregate(col("cells"), lit(0.0),
          (acc, x) => acc + x("n").cast("double") *
            pow(lit(0.5), x("age").cast("double"))).as("decayed"))
  }

  /** Krippendorff's alpha, nominal data (Krippendorff 2004) — the
    * inter-annotator agreement metric that HANDLES MISSING RATINGS,
    * which Cohen/Fleiss kappa (quality_kappa) cannot: any item with ≥ 2
    * of the R raters contributes, pairs weighted 1/(mᵢ−1). Exactness:
    * with the coincidence matrix scaled by 2 every contribution
    * 2/(mᵢ−1) is an INTEGER for mᵢ ∈ {2, 3}; items with mᵢ ≥ 4 would
    * FLOOR to 0 and silently drop out, so the plan fails loudly
    * (raise_error on max mᵢ > 3) instead of emitting a wrong alpha. So
    * observed disagreement S_o2, the marginals n2_c and the expected
    * term Σ_{c≠k} n2_c·n2_k are exact integers and
    * alpha = 1 − S_o2·(n2−2) / Σ_{c≠k} n2_c·n2_k is ONE double
    * division. Shape: one (item, label) partial agg, a per-item
    * label-pair self-join (≤ R rows per item — bounded), two tiny
    * label-domain aggs; nothing corpus-wide shuffles twice.
    */
  def krippendorffAlpha(
      df: DataFrame,
      itemCol: String,
      raterCol: String,
      labelCol: String): DataFrame = {
    val ratings = df.select(col(itemCol).as("item"), col(raterCol).as("rater"),
        col(labelCol).as("lab"))
      .filter(col("lab").isNotNull)
      .dropDuplicates("item", "rater")
    // per-item label cells collected ONCE (≤ R entries — bounded by the
    // rater count), the label-pair cross expanded IN ROW by a double
    // explode: no per-item self-join, so the whole coincidence algebra
    // costs 3 shuffles (dedup, (item,lab) agg, item agg) + tiny
    // label-domain aggregates
    val nic = ratings.groupBy("item", "lab").agg(count(lit(1)).cast("long").as("nc"))
    val perItem = nic.groupBy("item")
      .agg(sum("nc").cast("long").as("m"),
        collect_list(struct(col("lab"), col("nc"))).as("cells"))
      .filter(col("m") >= 2)
      .transform(Ckpt.lazyCkpt) // feeds the pair expansion + n_items once
    // o2[c,k] contributions: within an item, ordered label pairs
    // (c ≠ k): nc·nk; diagonal: nc·(nc−1) — each × 2/(m−1) (an exact
    // integer for m ∈ {2, 3})
    val pairs = perItem
      .select(col("m"), col("cells"), explode(col("cells")).as("a"))
      .select(col("m"), col("a"), explode(col("cells")).as("b"))
      .select(col("a.lab").as("c"), col("b.lab").as("k"),
        (col("a.nc") * when(col("a.lab") === col("b.lab"), col("b.nc") - 1)
          .otherwise(col("b.nc")) *
          (lit(2L) / (col("m") - 1)).cast("long")).as("contrib"))
    val o2 = pairs.groupBy("c", "k")
      .agg(sum("contrib").cast("decimal(38,0)").as("o2"))
      .transform(Ckpt.lazyCkpt) // feeds so2 + marg + n2 once
    val so2 = o2.filter(col("c") =!= col("k"))
      .agg(coalesce(sum("o2"), lit(0L)).cast("decimal(38,0)").as("s_o2"))
    val marg = o2.groupBy("c").agg(sum("o2").cast("decimal(38,0)").as("n2_c"))
    val de = marg.as("x").join(marg.as("y"), col("x.c") =!= col("y.c"))
      .agg(sum(col("x.n2_c") * col("y.n2_c")).cast("decimal(38,0)").as("de2"))
    val n2 = o2.agg(sum("o2").cast("decimal(38,0)").as("n2"))
    val items = perItem.agg(count(lit(1)).cast("long").as("n_items"),
      max("m").cast("long").as("max_m"))
    so2.crossJoin(broadcast(de)).crossJoin(broadcast(n2)) // 1-row × 1-row
      .crossJoin(broadcast(items))
      .select(col("n_items"),
        (col("n2") / 2).cast("long").as("n_ratings_pairable"),
        col("s_o2").cast("long").as("s_o2"),
        col("de2").cast("long").as("de2"),
        // fail-loud ≥4-rater guard (round-11 advice): 2/(m−1) floors to
        // 0 for m ≥ 4, which would silently DROP those items from the
        // coincidence algebra — and the oracle shares the floor, so the
        // gate could never catch a wrong alpha for a future caller
        when(col("max_m") > 3, raise_error(concat(
            lit("krippendorffAlpha: an item has "), col("max_m"),
            lit(" raters; the integer-exact coincidence algebra supports at most 3"))))
          .otherwise(lit(1.0) -
            (col("s_o2") * (col("n2") - 2)).cast("decimal(38,0)").cast("double")
            / col("de2").cast("double")).as("alpha"))
  }

  /** Randomization (permutation-style) test for a two-arm experiment —
    * the assumption-free p-value next to Welch-t / Mann-Whitney / CUPED:
    * K deterministic md5 REASSIGNMENTS of the per-unit totals (Dwass
    * 1957 random-reassignment variant; never the raw event rows), the
    * |mean difference| statistic recomputed under each, and the
    * add-one Monte-Carlo estimator p = (1 + #{k: |Δₖ| ≥ |Δ_obs|})/(K+1)
    * (Phipson & Smyth 2010 — never reports p = 0). Exactness: per-arm
    * sums are exact decimals; each |Δ| is the same fixed two-division
    * double on both engines; the ≥ count is over identical doubles.
    * Shape: one per-unit agg, a broadcast K-row cross (the K-fold blow-
    * up rides the UNIT table, ≪ events), one (perm) agg — all
    * map-side combinable; no window, no driver loop.
    */
  def randomizationTest(
      perUnit: DataFrame, // (unitCol, valueCol: long)
      unitCol: String,
      valueCol: String,
      obsPrefix: String,
      k: Int = 64): DataFrame = {
    val spark = perUnit.sparkSession
    val perms = spark.range(0, k + 1).select(col("id").cast("int").as("perm"))
    def bit(prefix: Column) =
      conv(substring(md5(concat(prefix, col(unitCol).cast("string"))), 1, 8), 16, 10)
        .cast("long") % 2
    val assigned = perUnit
      .select(col(unitCol), col(valueCol).cast("long").as("__v"))
      .crossJoin(broadcast(perms)) // K+1-row literal attach
      .withColumn("__bit", bit(when(col("perm") === 0, lit(obsPrefix))
        .otherwise(concat(lit("perm"), col("perm"), lit(":")))))
    val stats = assigned.groupBy("perm")
      .agg(
        sum(when(col("__bit") === 0, col("__v")).otherwise(0L))
          .cast("decimal(38,0)").cast("double").as("sa"),
        count(when(col("__bit") === 0, 1)).cast("double").as("na"),
        sum(when(col("__bit") === 1, col("__v")).otherwise(0L))
          .cast("decimal(38,0)").cast("double").as("sb"),
        count(when(col("__bit") === 1, 1)).cast("double").as("nb"))
      .withColumn("stat",
        when(col("na") > 0 && col("nb") > 0,
          abs(col("sa") / col("na") - col("sb") / col("nb"))))
    val obs = stats.filter(col("perm") === 0)
      .select(col("stat").as("obs_stat"), (col("na") + col("nb")).cast("long").as("n_units"))
    stats.filter(col("perm") > 0)
      .crossJoin(broadcast(obs)) // 1-row attach
      .agg(
        max("n_units").as("n_units"),
        max("obs_stat").as("obs_diff"),
        count(when(col("stat") >= col("obs_stat"), 1)).cast("long").as("n_ge"))
      .select(col("n_units"), col("obs_diff"), col("n_ge"),
        ((col("n_ge") + 1).cast("double") / lit((k + 1).toDouble)).as("p_value"))
  }

  /** AMS "tug-of-war" sketch (Alon, Matias & Szegedy STOC'96) for the
    * second frequency moment F2 = Σ_u f_u² — the join-size /
    * self-join-size estimator that needs O(1) state instead of a
    * per-key aggregate: 32 estimators share ONE md5 per row (bits
    * 0..31 of a 60-bit hash word), each Zₑ = Σ ±1 accumulates as an
    * EXACT INTEGER conditional sum (order/merge-free — the sketch
    * merges across shards/batches by plain addition), and the estimate
    * is the classic median-of-4-means-of-8 Zₑ². The exact F2 (one
    * per-key agg) rides along for the error report — at 100 TB you'd
    * keep only the sketch side. All doubles are fixed-order combines
    * of exact integers.
    */
  def amsF2Report(df: DataFrame, keyCol: String): DataFrame = {
    val h = conv(substring(md5(concat(lit("ams:"), col(keyCol).cast("string"))), 1, 15),
      16, 10).cast("long")
    val signs = (0 until 32).map(e =>
      sum(lit(1L) - lit(2L) * shiftright(col("__h"), e).bitwiseAND(lit(1L)))
        .cast("long").as(s"z$e"))
    val aggs = count(lit(1)).cast("long").as("n_events") +: signs
    val zrow = df.select(h.as("__h")).agg(aggs.head, aggs.tail: _*)
    // 4 group means of 8 squared Z's (exact integer sums / 8.0), then
    // the even-median = mean of the two middle values
    val means = (0 until 4).map { g =>
      (0 until 8).map(i =>
        (col(s"z${g * 8 + i}").cast("decimal(19,0)") * col(s"z${g * 8 + i}"))
          .cast("decimal(38,0)"))
        .reduce(_ + _).cast("decimal(38,0)").cast("double") / lit(8.0)
    }
    val est = zrow
      .withColumn("__ms", sort_array(array(means: _*)))
      .select(col("n_events"),
        ((element_at(col("__ms"), 2) + element_at(col("__ms"), 3)) / lit(2.0)).as("est_f2"))
    val exact = df.groupBy(col(keyCol)).agg(count(lit(1)).cast("long").as("f"))
      .agg(sum((col("f").cast("decimal(19,0)") * col("f")).cast("decimal(38,0)"))
        .cast("decimal(38,0)").cast("double").as("exact_f2"))
    est.crossJoin(broadcast(exact)) // 1-row × 1-row
      .select(col("n_events"), col("exact_f2"), col("est_f2"),
        (abs(col("est_f2") - col("exact_f2")) / col("exact_f2")).as("rel_err"))
  }

  /** OPTIMAL 1-D k-means (the Ckmeans.1d.dp dynamic program, Wang &
    * Song 2011) over a pre-bucketed value domain — the provably-best
    * k-segmentation by within-cluster SSE, vs the heuristic bins of
    * equi-width (q23) / equi-depth (q46): the classic two-level shape
    * for 100 TB quantization. Stage 1 is ONE distributed pass folding
    * the corpus onto a ≤ `buckets` equi-width grid with EXACT integer
    * (count, Σv, Σv²) cells; stage 2 runs the O(B²k) DP on the
    * occupied cells driver-side (a bounded ≤64-row collect — the
    * trainCentroids contract). Segment costs are
    * q − s·s/c on doubles converted ONCE from the exact integer
    * prefix differences (IEEE-nearest on both engines), argmin ties
    * break on the smaller split — so the DuckDB twin replays the DP
    * and its backtrack decision-for-decision.
    */
  def kmeans1dOptimal(
      df: DataFrame,
      value: Column,
      k: Int = 4,
      buckets: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val v = df.select(value.cast("long").as("v")).filter(col("v").isNotNull)
    val mm = v.agg(min("v").as("lo"), max("v").as("hi")).collect()(0)
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val width = (hi - lo) / buckets + 1
    val occ = v
      .groupBy(RankOps.idiv(col("v") - lo, width).as("b"))
      .agg(count(lit(1)).cast("long").as("c"),
        sum(col("v").cast("decimal(19,0)")).cast("decimal(38,0)").as("s"),
        sum((col("v").cast("decimal(19,0)") * col("v")).cast("decimal(38,0)"))
          .cast("decimal(38,0)").as("q"))
      .orderBy("b")
      .collect() // ≤ `buckets` rows — bounded by construction
    val n = occ.length
    require(n >= k, s"kmeans1dOptimal: $n occupied cells < k=$k")
    val b = occ.map(_.getLong(0))
    val pc = new Array[Long](n + 1)
    val ps = new Array[BigInt](n + 1); val pq = new Array[BigInt](n + 1)
    ps(0) = BigInt(0); pq(0) = BigInt(0)
    occ.zipWithIndex.foreach { case (r, i) =>
      pc(i + 1) = pc(i) + r.getLong(1)
      ps(i + 1) = ps(i) + BigInt(r.getDecimal(2).toBigInteger)
      pq(i + 1) = pq(i) + BigInt(r.getDecimal(3).toBigInteger)
    }
    // cost(j+1..i), 1-based cells: doubles converted ONCE from exact ints
    def cost(j: Int, i: Int): Double = {
      val cd = (pc(i) - pc(j)).toDouble
      val sd = BigDecimal(ps(i) - ps(j)).doubleValue
      val qd = BigDecimal(pq(i) - pq(j)).doubleValue
      qd - sd * sd / cd
    }
    // forward DP: best(t)(i) over cells 1..i with t clusters
    val best = Array.ofDim[Double](k + 1, n + 1)
    val arg = Array.ofDim[Int](k + 1, n + 1)
    (1 to n).foreach(i => best(1)(i) = cost(0, i))
    for (t <- 2 to k; i <- t to n) {
      var bj = -1; var bv = 0.0
      var j = t - 1
      while (j <= i - 1) {
        val cand = best(t - 1)(j) + cost(j, i)
        if (bj < 0 || cand < bv) { bj = j; bv = cand } // tie → smaller j
        j += 1
      }
      best(t)(i) = bv; arg(t)(i) = bj
    }
    // backtrack the k segment ends
    val ends = new Array[Int](k + 1) // ends(0) = 0
    ends(k) = n
    for (t <- k until 1 by -1) ends(t - 1) = arg(t)(ends(t))
    import spark.implicits._
    (1 to k).map { t =>
      val (j, i) = (ends(t - 1), ends(t))
      val c = pc(i) - pc(j)
      val s = ps(i) - ps(j)
      (t, lo + b(j) * width, lo + b(i - 1) * width + width - 1,
        c, BigDecimal(s).doubleValue / c.toDouble, cost(j, i))
    }.toDF("cluster_id", "lo_value", "hi_value", "n", "mean", "sse")
  }

  /** Holt-Winters ADDITIVE SEASONAL smoothing (level + trend + a
    * 7-slot day-of-week component, α=β=γ=1/2) over a per-key daily
    * series — the seasonality-aware successor to Holt/EWMA. Seasonal
    * slots are CALENDAR-anchored (day % 7), so gaps in the series
    * cannot shift the weekly pattern; init l₀ = first observation,
    * b₀ = 0, s ≡ 0 (the seasonal learns through γ — the gap-robust
    * simplification). State is a 9-double array [l, b, s0..s6] folded
    * in day order inside ONE aggregate() expression: halving is exact
    * scaling and the op order is pinned, so a DuckDB list_reduce twin
    * replays the chain bit-for-bit. Forecast(+7d) reuses the same dow
    * slot. Per-key state is 9 doubles; the fold is bounded by the
    * day span, never rows.
    */
  def holtWintersAdditive(
      daily: DataFrame, // (keyCol, dayCol: long, xCol: long)
      keyCol: String,
      dayCol: String,
      xCol: String): DataFrame = {
    val arr = daily.groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col(dayCol).as("day"), col(xCol).as("x"))))
        .as("arr"))
    arr
      .select(col(keyCol), size(col("arr")).cast("bigint").as("n_days"),
        expr("""aggregate(
            slice(arr, 2, size(arr) - 1),
            transform(sequence(0, 8),
              i -> CASE WHEN i = 0 THEN cast(element_at(arr, 1).x as double)
                        ELSE cast(0.0 as double) END),
            (a, e) -> transform(a, (v, i) -> CASE
              WHEN i = 0 THEN
                (cast(e.x as double) - a[cast(e.day % 7 as int) + 2] + a[0] + a[1]) / 2.0D
              WHEN i = 1 THEN
                ((cast(e.x as double) - a[cast(e.day % 7 as int) + 2] + a[0] + a[1]) / 2.0D
                  - a[0]) / 2.0D + a[1] / 2.0D
              WHEN i = cast(e.day % 7 as int) + 2 THEN
                (cast(e.x as double)
                  - (cast(e.x as double) - a[cast(e.day % 7 as int) + 2] + a[0] + a[1]) / 2.0D)
                  / 2.0D + a[cast(e.day % 7 as int) + 2] / 2.0D
              ELSE v END),
            a -> a)""").as("st"),
        expr("cast(element_at(arr, size(arr)).day % 7 as int)").as("last_dow"))
      .select(col(keyCol), col("n_days"),
        col("st")(0).as("level"), col("st")(1).as("trend"),
        element_at(col("st"), col("last_dow") + 3).as("s_last"),
        (col("st")(0) + lit(7.0) * col("st")(1)
          + element_at(col("st"), col("last_dow") + 3)).as("forecast_7d"))
  }

  /** Isotonic calibration by Pool-Adjacent-Violators (Ayer et al. 1955;
    * the NONPARAMETRIC calibrator next to the per-domain percent-rank
    * of quality_calibrate and the ECE report): per group, the empirical
    * positive-rate over score BINS is replaced by the closest
    * non-decreasing fit. Stage 1 is one distributed pass folding rows
    * onto (group, bin) exact-integer (n, n_pos) cells; stage 2 runs PAV
    * on the ≤ `bins`-per-group cells driver-side (bounded collect, the
    * kmeans1dOptimal contract) with EXACT violator tests
    * (cross-multiplied longs — no float compare decides a merge). The
    * fitted rate is pool_pos/pool_n converted once to double. The
    * DuckDB twin exploits UNIQUENESS of the isotonic fit: it computes
    * the same values by the minimax closed form
    * ŷᵢ = max_{j≤i} min_{k≥i} avg(y_j..y_k) over the bin prefix sums —
    * a different ALGORITHM, provably the same answer, so the replay is
    * algorithm-independent evidence.
    */
  def isotonicCalibration(
      df: DataFrame,
      groupCol: String,
      scoreCol: String,   // integer-valued
      labelCol: String,   // boolean
      bins: Int = 16): DataFrame = {
    val spark = df.sparkSession
    // the driver-side pool loop reads the group key as String; a
    // non-string group would CCE at runtime, so say so at plan time
    require(df.schema(groupCol).dataType == org.apache.spark.sql.types.StringType,
      s"isotonicCalibration: groupCol '$groupCol' must be StringType " +
        s"(got ${df.schema(groupCol).dataType.simpleString}) — cast upstream")
    val mm = df.agg(min(col(scoreCol)).cast("long").as("lo"),
      max(col(scoreCol)).cast("long").as("hi")).collect()(0)
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val width = (hi - lo) / bins + 1
    val cells = df
      .groupBy(col(groupCol).as("g"),
        RankOps.idiv(col(scoreCol).cast("long") - lo, width).as("bin"))
      .agg(count(lit(1)).cast("long").as("n"),
        count(when(col(labelCol), 1)).cast("long").as("n_pos"))
      .orderBy("g", "bin")
      .collect() // ≤ groups × bins rows — bounded by construction
    val out = cells.groupBy(_.getString(0)).toSeq.flatMap { case (g, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      // PAV pools: (binLo, binHi, n, pos); merge while prev.rate > next.rate,
      // rate compare cross-multiplied exact
      val pools = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
      sorted.foreach { r =>
        pools += ((r.getLong(1), r.getLong(1), r.getLong(2), r.getLong(3)))
        while (pools.length >= 2 && {
          val a = pools(pools.length - 2); val b = pools.last
          // pos_a/n_a > pos_b/n_b exactly; BigInt so per-bin counts
          // above ~3e9 can't overflow the cross-product (driver-side,
          // ≤ bins pools — cost is nil)
          BigInt(a._4) * b._3 > BigInt(b._4) * a._3
        }) {
          val b = pools.remove(pools.length - 1)
          val a = pools.remove(pools.length - 1)
          pools += ((a._1, b._2, a._3 + b._3, a._4 + b._4))
        }
      }
      sorted.map { r =>
        val bin = r.getLong(1)
        val p = pools.find(p => p._1 <= bin && bin <= p._2).get
        (g, bin, r.getLong(2), r.getLong(3),
          r.getLong(3).toDouble / r.getLong(2).toDouble,
          p._4.toDouble / p._3.toDouble)
      }
    }
    import spark.implicits._
    out.toDF("g", "bin", "n", "n_pos", "rate_raw", "rate_isotonic")
      .withColumnRenamed("g", groupCol)
  }

  /** Simpson's-paradox check: the SIGN of the x–y association inside
    * every stratum vs in the aggregate, with a reversal flag — the
    * classic confounding monitor a metrics pipeline runs before
    * publishing a correlation (an aggregate trend that no stratum
    * shows, or vice versa, means the stratum variable confounds).
    * Exactness: the sign carrier is the scaled covariance
    * n·Σxy − Σx·Σy as an EXACT decimal integer (order-independent
    * partial-agg sums) — no variance normalization is needed for a
    * sign, so no float enters the verdict. One (stratum) agg + a
    * broadcast 1-row aggregate attach.
    */
  def simpsonCheck(
      df: DataFrame,
      stratumCol: String,
      x: Column,
      y: Column): DataFrame = {
    val rows = df.select(col(stratumCol).as("stratum"),
        x.cast("long").as("x"), y.cast("long").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
    def cov2(pre: String): Column =
      (col(s"${pre}n").cast("decimal(38,0)") * col(s"${pre}sxy")
        - col(s"${pre}sx") * col(s"${pre}sy")).cast("decimal(38,0)")
    def aggs(pre: String) = Seq(
      count(lit(1)).cast("decimal(19,0)").as(s"${pre}n"),
      sum(col("x").cast("decimal(19,0)")).cast("decimal(38,0)").as(s"${pre}sx"),
      sum(col("y").cast("decimal(19,0)")).cast("decimal(38,0)").as(s"${pre}sy"),
      sum((col("x").cast("decimal(19,0)") * col("y")).cast("decimal(38,0)"))
        .cast("decimal(38,0)").as(s"${pre}sxy"))
    val perStratum = rows.groupBy("stratum").agg(aggs("").head, aggs("").tail: _*)
      .withColumn("cov2", cov2(""))
    val overall = rows.agg(aggs("g_").head, aggs("g_").tail: _*)
      .withColumn("g_cov2", cov2("g_"))
      .select(signum(col("g_cov2")).cast("int").as("agg_sign"))
    perStratum
      .crossJoin(broadcast(overall)) // 1-row attach
      .select(col("stratum"), col("n").cast("long").as("n"),
        signum(col("cov2")).cast("int").as("stratum_sign"),
        col("agg_sign"),
        (signum(col("cov2")) =!= 0 && col("agg_sign") =!= 0 &&
          signum(col("cov2")).cast("int") =!= col("agg_sign")).as("reversed"))
  }

  /** Murphy decomposition of the Brier score (Murphy 1973) for BINNED
    * probability forecasts — REL − RES + UNC over the isotonic-
    * calibrated per-bin forecasts of [[isotonicCalibration]]: REL
    * (reliability — how far forecasts sit from observed bin rates; 0
    * for the isotonic fit's own training data unless pooling moved
    * them), RES (resolution — how much the bins separate outcomes),
    * UNC (the irreducible ō(1−ō)). All terms are fixed double combines
    * of the exact per-bin integers and the fitted rates. One pass over
    * the bounded calibration table.
    */
  def brierDecomposition(
      calib: DataFrame, // isotonicCalibration output (needs the bin column)
      groupCol: String): DataFrame = {
    // the float numerators fold in PINNED bin order (the decayedTrend /
    // holt-winters convention) — a plain sum(double) would be
    // merge-order-dependent and unreplayable
    val withTot = calib
      .groupBy(col(groupCol))
      .agg(
        sum("n").cast("long").as("n_total"),
        sum("n_pos").cast("long").as("n_pos_total"),
        sort_array(collect_list(struct(col("bin"), col("n"), col("n_pos"),
          col("rate_isotonic").as("p")))).as("cells"))
      .withColumn("rel_num", aggregate(col("cells"), lit(0.0),
        (acc, c) => acc + c("n").cast("double")
          * (c("p") - c("n_pos").cast("double") / c("n").cast("double"))
          * (c("p") - c("n_pos").cast("double") / c("n").cast("double"))))
      .withColumn("oo_num", aggregate(col("cells"), lit(0.0),
        (acc, c) => acc + c("n").cast("double")
          * (c("n_pos").cast("double") / c("n").cast("double"))
          * (c("n_pos").cast("double") / c("n").cast("double"))))
    val oBar = col("n_pos_total").cast("double") / col("n_total").cast("double")
    withTot.select(col(groupCol), col("n_total"), col("n_pos_total"),
      oBar.as("o_bar"),
      (col("rel_num") / col("n_total").cast("double")).as("reliability"),
      // RES = Σ n_k·(o_k − ō)²/N = Σ n_k·o_k²/N − ō²  (König–Huygens)
      (col("oo_num") / col("n_total").cast("double") - oBar * oBar).as("resolution"),
      (oBar * (lit(1.0) - oBar)).as("uncertainty"),
      (col("rel_num") / col("n_total").cast("double")
        - (col("oo_num") / col("n_total").cast("double") - oBar * oBar)
        + oBar * (lit(1.0) - oBar)).as("brier"))
  }

  /** Shapley-value channel attribution (Shapley 1953 applied to
    * marketing touch data — the PRINCIPLED credit split next to the
    * first-/last-touch heuristics of events_attribution): coalition
    * value v(S) = converted users reachable with channel set S (mask ⊆
    * S), φ_i = Σ_S |S|!(n−1−|S|)!/n!·(v(S∪i) − v(S)). Wired for
    * EXACTLY 3 channels so n! = 6 and 6·φ_i is an EXACT INTEGER — the
    * one double is the final /6. Shape: one per-user agg folds the
    * corpus to (mask, conv); the 8-row coalition table collects
    * (bounded literal, the kmeans1d posture) and the 2³ enumeration is
    * driver-side arithmetic. Efficiency property Σφ = v(N) − v(∅)
    * holds by construction and is spec-pinned.
    */
  def shapleyAttribution(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      channels: Seq[String], // exactly 3
      conversionType: String): DataFrame = {
    require(channels.size == 3, "exact-sixth Shapley is wired for 3 channels")
    val spark = events.sparkSession
    val bits = channels.zipWithIndex
    val aggCols = bits.map { case (c, i) =>
      max(when(col(typeCol) === c, lit(1L << i)).otherwise(0L)).as(s"b$i")
    } :+ max(when(col(typeCol) === conversionType, 1L).otherwise(0L)).as("conv")
    val pu = events.groupBy(col(userCol)).agg(aggCols.head, aggCols.tail: _*)
      .select((col("b0") + col("b1") + col("b2")).cast("int").as("mask"), col("conv"))
    val cnt = pu.filter(col("conv") === 1).groupBy("mask")
      .agg(count(lit(1)).cast("long").as("c"))
      .collect() // ≤ 8 rows — bounded by construction
    val cm = cnt.map(r => r.getInt(0) -> r.getLong(1)).toMap.withDefaultValue(0L)
    def v(s: Int): Long = (0 to 7).filter(m => (m & s) == m).map(cm).sum
    def fact(k: Int): Long = (1 to k).map(_.toLong).product
    val rows = bits.map { case (name, i) =>
      val bit = 1 << i
      val phi6 = (0 to 7).filter(s => (s & bit) == 0).map { s =>
        val k = Integer.bitCount(s)
        fact(k) * fact(2 - k) * (v(s | bit) - v(s))
      }.sum
      (name, phi6, phi6.toDouble / 6.0, v(7), v(0))
    }
    import spark.implicits._
    rows.toDF("channel", "phi6", "phi", "v_all", "v_none")
  }

  /** McNemar's test for PAIRED classifier comparison (McNemar 1947) —
    * the statistically-right way to decide a model SWAP on one eval
    * set (two AUCs on the same items are correlated; the unpaired
    * tests lie). Only the DISCORDANT counts matter: b = A right ∧ B
    * wrong, c = A wrong ∧ B right; χ² = (b−c)²/(b+c) (with the
    * |b−c|−1 continuity correction variant emitted alongside). All
    * counts exact integers off ONE hash aggregate per group; the two
    * statistics are fixed double combines.
    */
  def mcnemar(
      df: DataFrame,
      groupCol: String,
      correctA: Column,
      correctB: Column): DataFrame = {
    val g = df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).cast("long").as("n"),
        count(when(correctA && correctB, 1)).cast("long").as("n_both"),
        count(when(correctA && !correctB, 1)).cast("long").as("b"),
        count(when(!correctA && correctB, 1)).cast("long").as("c"),
        count(when(!correctA && !correctB, 1)).cast("long").as("n_neither"))
    val bd = col("b").cast("double"); val cd = col("c").cast("double")
    g.select(col(groupCol), col("n"), col("n_both"), col("b"), col("c"),
      col("n_neither"),
      when(col("b") + col("c") > 0,
        (bd - cd) * (bd - cd) / (bd + cd)).as("chi2"),
      when(col("b") + col("c") > 0,
        (abs(bd - cd) - lit(1.0)) * (abs(bd - cd) - lit(1.0)) / (bd + cd))
        .as("chi2_cc"))
  }

  /** Exact precision-recall curve per group: one point per DISTINCT
    * score threshold ("predict positive at score ≥ s"), tp/fp/fn exact
    * integers off a descending cumulative over the score-DOMAIN table
    * (the aucExact posture: the window runs over distinct scores, never
    * rows — a bounded-domain integer score keeps the window table tiny
    * at any corpus size). precision/recall/f1 are fixed double
    * expressions over the exact integers.
    */
  def prCurve(
      df: DataFrame,
      groupCol: String,
      scoreCol: String,
      labelCol: String // boolean: true = positive
  ): DataFrame = {
    val counts = df
      .groupBy(col(groupCol), col(scoreCol).as("s"))
      .agg(
        count(when(col(labelCol), 1)).as("p"),
        count(when(!col(labelCol), 1)).as("q"))
    val w = Window.partitionBy(groupCol).orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = df.groupBy(col(groupCol))
      .agg(count(when(col(labelCol), 1)).as("n_pos"))
    val prec = col("tp").cast("double") / (col("tp") + col("fp")).cast("double")
    val rec = col("tp").cast("double") / col("n_pos").cast("double")
    counts
      .withColumn("tp", sum("p").over(w).cast("long"))
      .withColumn("fp", sum("q").over(w).cast("long"))
      .join(broadcast(tot), Seq(groupCol))
      .select(col(groupCol), col("s").as("threshold"), col("tp"), col("fp"),
        (col("n_pos") - col("tp")).cast("long").as("fn"),
        prec.as("precision"), rec.as("recall"),
        when(col("tp") === 0, lit(0.0))
          .otherwise(lit(2.0) * prec * rec / (prec + rec)).as("f1"))
  }

  /** Generic single-scan column profiler (the schema-agnostic form of
    * the lineitem-specific `data_profile` query): per column — null
    * count, exact distinct count, numeric min/max (dates as epoch
    * days; non-numeric min/max null). ONE scan with a multi-column
    * count-distinct Expand, results stacked in-row — the ingestion
    * first-look every pipeline runs, surfaced to the CLI as
    * `report:///?kind=profile`. */
  def profileAllColumns(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    val cols = df.schema.fields.toSeq.map { f =>
      val numeric: Option[Column] = f.dataType match {
        case _: NumericType => Some(col(f.name).cast("double"))
        case DateType => Some(datediff(col(f.name), lit("1970-01-01")).cast("double"))
        case TimestampType | TimestampNTZType =>
          Some((unix_micros(col(f.name).cast("timestamp")) / lit(86400000000L)).cast("double"))
        case BooleanType => Some(col(f.name).cast("int").cast("double"))
        case _ => None
      }
      (f.name, numeric)
    }
    val agg = df.agg(
      count(lit(1)).as("__n_rows"),
      cols.flatMap { case (n, numOpt) =>
        Seq(
          sum(when(col(n).isNull, 1L).otherwise(0L)).as(s"__nn_$n"),
          countDistinct(col(n)).as(s"__nd_$n"),
          numOpt.map(c => min(c)).getOrElse(lit(null).cast("double")).as(s"__mn_$n"),
          numOpt.map(c => max(c)).getOrElse(lit(null).cast("double")).as(s"__mx_$n"))
      }: _*)
    val stack = cols.map { case (n, _) =>
      struct(lit(n).as("column"), col("__n_rows").cast("long").as("n_rows"),
        col(s"__nn_$n").cast("long").as("n_nulls"),
        col(s"__nd_$n").cast("long").as("n_distinct"),
        col(s"__mn_$n").as("min_num"), col(s"__mx_$n").as("max_num"))
    }
    agg.select(explode(array(stack: _*)).as("r")).select("r.*")
  }

  /** Benjamini–Hochberg FDR control over PER-GROUP randomization tests
    * (Benjamini & Hochberg 1995 step-up over [[randomizationTest]]'s
    * Dwass-style exact p-values) — the multiple-comparisons guard a
    * metrics platform needs the moment it reads more than one A/B
    * slice: with m slices at α=0.05 each, ~m/20 false "wins" are
    * expected; BH bounds the FALSE-DISCOVERY RATE at q instead.
    *
    * Exactness end to end: each p-value is the add-one Monte-Carlo
    * rational (n_ge+1)/(K+1) (never 0, Phipson & Smyth 2010), so the
    * BH step-up condition p_(i) ≤ i·q/m is decided as the INTEGER
    * cross-product (n_ge+1)·m·qDen ≤ i·(K+1)·qNum — no float enters
    * any verdict; the step-up cutoff is a window max over the ordered
    * flags. Shape: one per-(group, unit) agg, the (K+1)-fold broadcast
    * cross (rides the UNIT table), one (group, perm) agg, one group
    * agg, then m-row window work — all map-side combinable until the
    * m-row tail.
    *
    * Output per group: (group, obs_diff, n_ge, p_num, p_den, p_value,
    * bh_rank, rejected) — rejected = this slice survives FDR-q. A group
    * whose observed md5 split left an arm empty (obs_diff NULL) is
    * reported with every verdict column NULL and does not enter m or
    * the ranking — never spuriously rejected.
    */
  def fdrBhRandomization(
      perUnit: DataFrame, // (groupCol, unitCol, valueCol: long)
      groupCol: String,
      unitCol: String,
      valueCol: String,
      obsPrefix: String,
      k: Int = 64,
      qNum: Long = 1L,
      qDen: Long = 10L): DataFrame = {
    val spark = perUnit.sparkSession
    val perms = spark.range(0, k + 1).select(col("id").cast("int").as("perm"))
    def bit(prefix: Column) =
      conv(substring(md5(concat(prefix, col(unitCol).cast("string"))), 1, 8), 16, 10)
        .cast("long") % 2
    val assigned = perUnit
      .select(col(groupCol).as("g"), col(unitCol), col(valueCol).cast("long").as("__v"))
      .crossJoin(broadcast(perms))
      .withColumn("__bit", bit(when(col("perm") === 0, lit(obsPrefix))
        .otherwise(concat(lit("perm"), col("perm"), lit(":")))))
    val stats = assigned.groupBy("g", "perm")
      .agg(
        sum(when(col("__bit") === 0, col("__v")).otherwise(0L))
          .cast("decimal(38,0)").cast("double").as("sa"),
        count(when(col("__bit") === 0, 1)).cast("double").as("na"),
        sum(when(col("__bit") === 1, col("__v")).otherwise(0L))
          .cast("decimal(38,0)").cast("double").as("sb"),
        count(when(col("__bit") === 1, 1)).cast("double").as("nb"))
      .withColumn("stat",
        when(col("na") > 0 && col("nb") > 0,
          abs(col("sa") / col("na") - col("sb") / col("nb"))))
    val obs = stats.filter(col("perm") === 0)
      .select(col("g"), col("stat").as("obs_diff"))
    val p0 = stats.filter(col("perm") > 0)
      .join(obs, Seq("g"))
      .groupBy("g", "obs_diff")
      .agg(count(when(col("stat") >= col("obs_diff"), 1)).cast("long").as("n_ge"))
      .transform(Ckpt.lazyCkpt) // m-row table feeds the ranked + degenerate branches
    // A group whose OBSERVED split left one arm empty has obs_diff NULL:
    // every 'stat >= obs_diff' is NULL, n_ge = 0, and the add-one p would
    // be 1/(K+1) — the MOST significant rank, so a degenerate slice could
    // be spuriously FDR-rejected (round-12 advisor item 4). Such groups
    // are EXCLUDED from m and the step-up and emitted with NULL verdict
    // columns instead — visible, never ranked.
    val p = p0.filter(col("obs_diff").isNotNull)
      .select(col("g"), col("obs_diff"), col("n_ge"),
        (col("n_ge") + 1L).as("p_num"), lit((k + 1).toLong).as("p_den"))
    // BH step-up on the m-row p table: rank ascending (ties broken by
    // group name — deterministic), flag i where p_num·m·qDen ≤
    // i·p_den·qNum, reject every rank ≤ the max flagged rank
    val wAll = Window.orderBy(col("p_num"), col("g"))
    val wSet = Window.partitionBy()
    val ranked = p
      .withColumn("m", count(lit(1)).over(wSet))
      .withColumn("bh_rank", row_number().over(wAll))
      .withColumn("__pass",
        col("p_num") * col("m") * lit(qDen) <= col("bh_rank") * col("p_den") * lit(qNum))
      .withColumn("__cut", max(when(col("__pass"), col("bh_rank")).otherwise(0L)).over(wSet))
    val decided = ranked.select(col("g"), col("obs_diff"), col("n_ge"),
      col("p_num"), col("p_den"),
      (col("p_num").cast("double") / col("p_den").cast("double")).as("p_value"),
      col("bh_rank").cast("long").as("bh_rank"),
      (col("bh_rank") <= col("__cut")).as("rejected"))
    val degenerate = p0.filter(col("obs_diff").isNull)
      .select(col("g"), lit(null).cast("double").as("obs_diff"),
        lit(null).cast("long").as("n_ge"), lit(null).cast("long").as("p_num"),
        lit(null).cast("long").as("p_den"), lit(null).cast("double").as("p_value"),
        lit(null).cast("long").as("bh_rank"), lit(null).cast("boolean").as("rejected"))
    decided.unionByName(degenerate)
  }

  /** Fleiss' kappa (Fleiss 1971) — multi-rater agreement with a FIXED
    * rater count n per item, completing the agreement family (Cohen's
    * kappa: exactly 2 raters; Krippendorff's alpha: missing ratings).
    * Exactness: P̄_o's numerator Σᵢⱼ n_ij² − N·n and P̄_e's numerator
    * Σⱼ(Σᵢ n_ij)² are exact integers off two bounded aggs (items ×
    * observed labels, then the label domain); P̄_o, P̄_e, and kappa =
    * (P̄_o − P̄_e)/(1 − P̄_e) are three fixed-order double ops both
    * engines replay. The fixed-n contract is require'd loudly
    * (raise_error), not silently miscounted — the krippendorff m ≤ 3
    * posture. */
  def fleissKappa(
      df: DataFrame,
      itemCol: String,
      raterCol: String,
      labelCol: String): DataFrame = {
    val ratings = df.select(col(itemCol).as("item"), col(raterCol).as("rater"),
        col(labelCol).as("lab"))
      .filter(col("lab").isNotNull)
      .dropDuplicates("item", "rater")
    val nij = ratings.groupBy("item", "lab").agg(count(lit(1)).cast("long").as("nij"))
    val perItem = nij.groupBy("item")
      .agg(sum("nij").cast("long").as("n"),
        sum(col("nij") * col("nij")).cast("long").as("sq"))
      .transform(Ckpt.lazyCkpt) // feeds totals + the fixed-n guard once
    val labTot = nij.groupBy("lab").agg(sum("nij").cast("long").as("tot"))
    val e = labTot.agg(sum((col("tot") * col("tot")).cast("decimal(38,0)"))
      .cast("decimal(38,0)").as("sum_tot_sq"))
    perItem.agg(
        count(lit(1)).cast("long").as("n_items"),
        min("n").cast("long").as("n_min"),
        max("n").cast("long").as("n_raters"),
        sum("sq").cast("decimal(38,0)").as("sum_sq"))
      .crossJoin(broadcast(e))
      .select(col("n_items"),
        when(col("n_min") =!= col("n_raters"), raise_error(concat(
            lit("fleissKappa: rater count varies across items ("), col("n_min"),
            lit(".."), col("n_raters"),
            lit(") — Fleiss assumes fixed n; use krippendorffAlpha for missing ratings"))))
          .otherwise(col("n_raters")).as("n_raters"),
        col("sum_sq").cast("long").as("sum_nij_sq"),
        col("sum_tot_sq").cast("long").as("sum_cat_tot_sq"),
        ((col("sum_sq") - col("n_items") * col("n_raters")).cast("double")
          / (col("n_items") * col("n_raters") * (col("n_raters") - 1)).cast("double"))
          .as("po"),
        // (N·n)² as a double SQUARE of the exact long product — the
        // long product of the 4 factors would overflow past N ≈ 1.7e9
        (col("sum_tot_sq").cast("double")
          / ((col("n_items") * col("n_raters")).cast("double")
            * (col("n_items") * col("n_raters")).cast("double"))).as("pe"))
      .withColumn("kappa", (col("po") - col("pe")) / (lit(1.0) - col("pe")))
  }
}
