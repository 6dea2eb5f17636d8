package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-comparison operators: token-distribution drift between two
  * corpus slices, and corpus-level set-overlap estimation via mergeable
  * MinHash signatures. These are the monitoring primitives of a rolling
  * crawl pipeline — "did today's batch shift vocabulary?" and "how much
  * does source A overlap source B?" — and both are designed so the daily
  * job touches only per-slice aggregates, never a cross-slice row join.
  *
  * Reference scope: the reference engine ships generic SQL transforms
  * (core/src/main/scala/dev/mauch/spark/etl — no corpus-diff operator);
  * these extend the same curation surface the way its diff transformer
  * (DiffTransformer.scala) extends row-level comparison.
  */
object DriftOps {

  /** Per-(slice, token) term counts — stopwords and empties removed, so
    * drift reports rank CONTENT movement, not `the`/`of` noise. One
    * explode + one map-side-combined groupBy. */
  def sliceTokenCounts(docs: DataFrame, textCol: String, sliceCol: String): DataFrame =
    docs
      .select(col(sliceCol).as("slice"), explode(TextFunctions.tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "" && !col("token").isin(TextFunctions.allStopwords: _*))
      .groupBy("slice", "token")
      .agg(count(lit(1)).as("tf"))

  /** Top-`topK` tokens by absolute relative-frequency movement between
    * slice `ref` and slice `cur`.
    *
    * The movement |tf_ref/tot_ref - tf_cur/tot_cur| is ordered WITHOUT
    * floating division: cross-multiplied
    *   delta_scaled = |tf_ref·tot_cur - tf_cur·tot_ref|
    * is an integer (DECIMAL(38,0) — bigint·bigint overflows past ~10⁹
    * tokens/slice, a 100 TB certainty), monotone in the true delta, and
    * bit-identical on any engine — no rounding epsilon to tune.
    *
    * Scale: the corpus reduces to one (token, tf_ref, tf_cur) row per
    * token in a single map-side-combined conditional aggregation (no
    * per-slice join — absence is a zero in the same row), totals ride in
    * as a one-row broadcast frame off the checkpointed vocab-sized
    * aggregate, and top-k is TakeOrderedAndProject. The raw text is
    * scanned exactly once.
    */
  def tokenDrift(
      docs: DataFrame,
      textCol: String,
      sliceCol: String,
      ref: String,
      cur: String,
      topK: Int
  ): DataFrame = {
    // ONE conditional aggregation covers both slices — a token absent
    // from a slice is a zero count in the same row, so there is no
    // full-outer token join and no second corpus scan (the join shape
    // planned 8 exchanges and scanned the corpus once per side; this
    // shape plans 3). The per-token frame is vocab-sized; pinning it
    // with a lazy localCheckpoint lets the one-row totals frame read
    // the SAME blocks instead of re-deriving the aggregation subtree.
    val counts = docs.filter(col(sliceCol).isin(ref, cur))
      .select(col(sliceCol).as("slice"), explode(TextFunctions.tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "" && !col("token").isin(TextFunctions.allStopwords: _*))
      .groupBy("token")
      .agg(
        sum(when(col("slice") === ref, 1L).otherwise(0L)).as("tf_ref"),
        sum(when(col("slice") === cur, 1L).otherwise(0L)).as("tf_cur"))
      .transform(Ckpt.lazyCkpt)
    val totals = counts.agg(sum("tf_ref").as("tot_ref"), sum("tf_cur").as("tot_cur"))
    val dec = "decimal(38,0)"
    counts
      .crossJoin(broadcast(totals))
      .withColumn("delta_scaled",
        abs(col("tf_ref").cast(dec) * col("tot_cur").cast(dec)
          - col("tf_cur").cast(dec) * col("tot_ref").cast(dec)))
      .withColumn("direction",
        when(col("tf_cur").cast(dec) * col("tot_ref").cast(dec)
          > col("tf_ref").cast(dec) * col("tot_cur").cast(dec), lit("up")).otherwise(lit("down")))
      .select("token", "tf_ref", "tf_cur", "delta_scaled", "direction")
      .orderBy(col("delta_scaled").desc, col("token").asc)
      .limit(topK)
  }

  /** Per-slice MinHash signature of the slice's DISTINCT-token set:
    * `k` rows (seed, min-hash) per slice, hash = first 15 hex chars of
    * md5(seed ":" token) — engine-portable (same md5 idiom as SplitOps'
    * grains), and MERGEABLE: the signature of slice A ∪ B is the
    * elementwise min of their signatures, so a daily job persists k rows
    * per day and any date-range overlap question is answered from
    * signatures alone, exactly like StatsOps.distinctSketches for
    * counts. Cost: one distinct-token pass, then a k-way explode of the
    * DEDUPLICATED (slice, token) frame — map-side min-combine collapses
    * it to slices·k rows before the shuffle.
    */
  def corpusSignatures(
      docs: DataFrame,
      textCol: String,
      sliceCol: String,
      k: Int
  ): DataFrame = {
    require(k >= 1, "k must be >= 1")
    sliceTokenCounts(docs, textCol, sliceCol)
      .select(col("slice"), col("token"))
      .select(col("slice"), col("token"), explode(sequence(lit(0), lit(k - 1))).as("seed"))
      .select(col("slice"), col("seed"),
        conv(substring(md5(concat_ws(":", col("seed"), col("token"))), 1, 15), 16, 10)
          .cast("long").as("h"))
      .groupBy("slice", "seed")
      .agg(min("h").as("min_h"))
  }

  /** Pairwise token-set Jaccard between slices: the MinHash ESTIMATE
    * (fraction of agreeing signature components — computable from
    * persisted signatures alone) next to the EXACT Jaccard (one
    * token-keyed join of the distinct-token frames) with an `ok` bound
    * check. At 100 TB the exact column is the expensive audit you run
    * once to qualify `k`; the estimate is what the daily job reports.
    * Both are deterministic — the estimate is md5-derived, so an oracle
    * replays it bit-for-bit; `bound` covers the estimator's sampling
    * error (≈3σ = 1.5/√k for worst-case J=0.5).
    */
  def overlapEstimates(
      docs: DataFrame,
      textCol: String,
      sliceCol: String,
      k: Int,
      bound: Double
  ): DataFrame = {
    val sigs = corpusSignatures(docs, textCol, sliceCol, k)
    val est = sigs.as("x")
      .join(sigs.as("y"), col("x.seed") === col("y.seed") && col("x.slice") < col("y.slice"))
      .groupBy(col("x.slice").as("slice_a"), col("y.slice").as("slice_b"))
      .agg(round(sum(when(col("x.min_h") === col("y.min_h"), 1).otherwise(0))
        .cast("double") / k, 4).as("est_jaccard"))
    val toks = sliceTokenCounts(docs, textCol, sliceCol).select("slice", "token")
    val sizes = toks.groupBy("slice").agg(count(lit(1)).as("n_tok"))
    val inter = toks.as("p")
      .join(toks.as("q"), col("p.token") === col("q.token") && col("p.slice") < col("q.slice"))
      .groupBy(col("p.slice").as("slice_a"), col("q.slice").as("slice_b"))
      .agg(count(lit(1)).as("n_int"))
    val exact = inter
      .join(sizes.select(col("slice").as("slice_a"), col("n_tok").as("na")), "slice_a")
      .join(sizes.select(col("slice").as("slice_b"), col("n_tok").as("nb")), "slice_b")
      .withColumn("exact_jaccard",
        round(col("n_int").cast("double") / (col("na") + col("nb") - col("n_int")), 4))
      .select("slice_a", "slice_b", "exact_jaccard")
    est.join(exact, Seq("slice_a", "slice_b"), "full_outer")
      .na.fill(0.0, Seq("est_jaccard", "exact_jaccard"))
      .withColumn("ok", abs(col("est_jaccard") - col("exact_jaccard")) <= bound)
      .select("slice_a", "slice_b", "est_jaccard", "exact_jaccard", "ok")
      .orderBy("slice_a", "slice_b")
  }

  /** EXACT two-sample Kolmogorov-Smirnov distance of each slice's
    * `valCol` distribution against the whole corpus, in pure integer
    * arithmetic: at every jump point t of the pooled empirical CDFs,
    *
    *   |F_slice(t) − F_all(t)| = |cum_s(t)·n_all − cum_all(t)·n_s| / (n_s·n_all)
    *
    * so the max runs over DECIMAL(38,0) cross-products (BIGINT overflows
    * at ~10^10 rows) with ONE double division at the end. Scale shape:
    * one shuffle collapses rows to (slice, value) counts; everything
    * after runs on the VALUE-DOMAIN-sized grid (distinct `valCol` values
    * — use a discretized/bucketed column for continuous data), window
    * frames are per-slice over that grid, and the slice×grid expansion
    * is a broadcast of the grid aggregate — never of rows. */
  def ksDistance(df: DataFrame, sliceCol: String, valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    val counts = df
      .groupBy(col(sliceCol).as("slice"), col(valCol).as("v"))
      .agg(count(lit(1)).as("c"))
      .transform(Ckpt.lazyCkpt) // grid + per-slice counts + totals all read it
    val grid = counts.groupBy("v").agg(sum("c").as("cg"))
      .withColumn("cum_all",
        sum("cg").over(Window.orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val nAll = grid.agg(sum("cg").cast("bigint").as("n_all"))
    val slices = counts.groupBy("slice").agg(sum("c").cast("bigint").as("n_s"))
    val wS = Window.partitionBy("slice").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sliceCounts = counts
      .select(col("slice").as("slice2"), col("v").as("v2"), col("c"))
    slices
      // bounded expansion: n_slices × value-domain grid, both aggregates
      .crossJoin(broadcast(grid.select("v", "cum_all")))
      .join(sliceCounts,
        col("slice") === col("slice2") && col("v") === col("v2"), "left_outer")
      .drop("slice2", "v2")
      .withColumn("cum_s", coalesce(sum(coalesce(col("c"), lit(0L))).over(wS), lit(0L)))
      .crossJoin(broadcast(nAll)) // 1-row scalar attach
      .withColumn("diff",
        abs(col("cum_s").cast(d38) * col("n_all").cast(d38) -
          col("cum_all").cast(d38) * col("n_s").cast(d38)).cast(d38))
      .groupBy("slice")
      .agg(first("n_s").as("n"), first("n_all").as("n_all"), max("diff").as("ks_num"))
      .select(col("slice"), col("n"),
        (col("ks_num").cast("double") /
          (col("n").cast(d38) * col("n_all").cast(d38)).cast("double")).as("ks"))
      .orderBy("slice")
  }

  /** Wasserstein-1 (earth-mover's) distance of each slice vs the whole
    * corpus on an integer measure — the "HOW MUCH mass moved, and how
    * far" drift metric completing KS (max CDF gap, distance-blind) and
    * PSI (binned, range-fixed): W1 = ∫|F_s − F_all| dx over the merged
    * value grid. Exactness: the CDF gap numerator
    * |cum_s·N_all − cum_all·N_s| and the grid gap (next_v − v) are
    * exact integers; their products sum in DECIMAL (order-free), and
    * W1 is ONE double division by N_s·N_all. Same shapes as
    * [[ksDistance]]: the expansion is slices × value-domain grid,
    * never rows.
    */
  def w1Distance(df: DataFrame, sliceCol: String, valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    val counts = df
      .groupBy(col(sliceCol).as("slice"), col(valCol).as("v"))
      .agg(count(lit(1)).as("c"))
      .transform(Ckpt.lazyCkpt) // grid + per-slice counts + totals all read it
    val wAll = Window.orderBy("v")
    val grid = counts.groupBy("v").agg(sum("c").as("cg"))
      .withColumn("cum_all",
        sum("cg").over(wAll.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("next_v", lead("v", 1).over(wAll))
    val nAll = grid.agg(sum("cg").cast("bigint").as("n_all"))
    val slices = counts.groupBy("slice").agg(sum("c").cast("bigint").as("n_s"))
    val wS = Window.partitionBy("slice").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sliceCounts = counts
      .select(col("slice").as("slice2"), col("v").as("v2"), col("c"))
    slices
      .crossJoin(broadcast(grid.select("v", "cum_all", "next_v")))
      .join(sliceCounts,
        col("slice") === col("slice2") && col("v") === col("v2"), "left_outer")
      .drop("slice2", "v2")
      .withColumn("cum_s", coalesce(sum(coalesce(col("c"), lit(0L))).over(wS), lit(0L)))
      .crossJoin(broadcast(nAll)) // 1-row scalar attach
      .withColumn("term",
        when(col("next_v").isNull, lit(0L).cast(d38)).otherwise(
          (abs(col("cum_s").cast(d38) * col("n_all").cast(d38) -
            col("cum_all").cast(d38) * col("n_s").cast(d38)).cast(d38)
            * (col("next_v") - col("v")).cast("decimal(19,0)")).cast(d38)))
      .groupBy("slice")
      .agg(first("n_s").as("n"), first("n_all").as("n_all"),
        sum("term").cast(d38).as("w1_num"))
      .select(col("slice"), col("n"),
        (col("w1_num").cast("double") /
          (col("n").cast(d38) * col("n_all").cast(d38)).cast("double")).as("w1"))
      .orderBy("slice")
  }

  /** Population Stability Index — the scorecard-monitoring standard:
    * PSI = Σ_bins (p_b − q_b)·ln(p_b/q_b) between a BASELINE and a
    * CURRENT distribution over `bins` equal-width bins of an integer
    * measure on [lo, hi] (outliers clamp into the edge bins — PSI's
    * convention; KS (above) is the binless alternative). Laplace +1
    * smoothing keeps empty bins finite: p_b = (n_b+1)/(N+bins).
    *
    * Exactness: bin ids and counts are integers; each bin's
    * (p−q)·ln(p/q) term rounds to 9 ONCE (≤ `bins` rounding sites) and
    * the ≤`bins`-term PSI fold runs in bin order over a collected
    * array. Shape: one conditional-sum groupBy over the measure (both
    * sides counted in one scan), bins-sized everything after.
    */
  def psi(
      df: DataFrame,
      isBaseline: Column,
      measure: Column,
      bins: Int,
      lo: Long,
      hi: Long
  ): DataFrame = {
    require(bins >= 2 && hi > lo, "psi needs bins >= 2 and hi > lo")
    val width = (hi - lo + bins - 1) / bins // ceil so hi lands in the last bin
    val bin = least(greatest(
      ((measure.cast("long") - lo) / width).cast("long"), lit(0L)), lit(bins - 1L))
    val counts = df
      .groupBy(bin.as("bin"))
      .agg(sum(when(isBaseline, 1L).otherwise(0L)).as("n_base"),
        sum(when(isBaseline, 0L).otherwise(1L)).as("n_cur"))
    val tot = counts.agg(sum("n_base").cast("bigint").as("nb"),
      sum("n_cur").cast("bigint").as("nc"))
    val terms = counts.crossJoin(broadcast(tot))
      .withColumn("p", (col("n_base") + 1).cast("double") / (col("nb") + bins).cast("double"))
      .withColumn("q", (col("n_cur") + 1).cast("double") / (col("nc") + bins).cast("double"))
      .withColumn("term", round((col("p") - col("q")) * log(col("p") / col("q")), 9))
    val psiRow = terms
      .select(struct(col("bin"), col("term")).as("s"))
      .agg(sort_array(collect_list(col("s"))).as("arr"))
      .select(expr("aggregate(arr, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.term)").as("psi"))
    terms
      .select(col("bin"), col("n_base"), col("n_cur"), col("p"), col("q"), col("term"))
      .crossJoin(broadcast(psiRow))
  }
}
