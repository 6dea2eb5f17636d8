package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, Literal}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftColumns

/** Distributed global ranking / running sums via two-level banding — the
  * scale-safe replacement for `Window.orderBy(...)` with no partition
  * (which moves the whole input to ONE task: the
  * "WARN WindowExec: No Partition Defined" plan, a straggler at 100×
  * and an OOM at 100 TB).
  *
  * Shape (the `data_dense_ids` pattern, generalized): rows carry a band
  * key that is a MONOTONE coarsening of the total order; per-band
  * counts/sums aggregate distributedly (partial-agg, one shuffle); the
  * only orderBy-window runs over the band-count-sized table (bands are
  * chosen ~3 orders of magnitude smaller than the input — at exabyte
  * scale, recurse the banding once more); band offsets join back (the
  * broadcast hint gated by `maybeBroadcast` — the window is not the
  * only hazard at extreme scale, the forced broadcast is too) and
  * in-band rank/cumsum windows are bounded by the band width.
  *
  * Correctness contract: sorting bands by `bandSort` then rows within a
  * band by `rowSort` must reproduce the global `rowSort` order — i.e.
  * r1 <rowSort r2 implies band(r1) <=bandSort band(r2). Callers pick
  * band keys per column type: numeric tiebreak → `id div 1024`
  * (dense_ids), bounded-domain leading column → the column itself,
  * near-unique numeric value → `v div 2^k`, string order → a prefix.
  */
object RankOps {

  /** Integer division `a div b` on a COMPUTED column (`expr("a div b")`
    * only works on named ones): builds Catalyst IntegralDivide directly.
    * Truncating division ≡ DuckDB `//` for the non-negative operands all
    * callers use.
    */
  def idiv(a: Column, b: Long): Column =
    GraftColumns.column(
      IntegralDivide(GraftColumns.expression(a.cast("long")), Literal(b)))

  /** Broadcast gate for the band-offset table (round-8 verdict item 4 /
    * advisor item 4): the FORCED `broadcast()` hint — not the window —
    * is this core's residual scale hazard. Bands are ~1/1024 of input
    * by construction, so near 10¹³ input rows the band table passes
    * Spark's 8 GB broadcast hard limit and the hint turns a working
    * shuffle join into a driver OOM. `spark.graft.bandedRank.
    * broadcastMaxBands` (default 2²²) gates the hint: callers that can
    * bound their band count pass it via `bandCountHint`; a hint above
    * the conf — or the conf set to 0 — drops the hint entirely and the
    * plain shuffle join remains correct at any size (AQE still
    * broadcasts it at runtime when its actual shuffle size is small,
    * so dropping the hint costs nothing when the table IS small).
    * `bandCountHint < 0` means "caller did not bound it" and keeps the
    * hint unless the conf is 0 (the deployment kill-switch).
    */
  private def maybeBroadcast(t: DataFrame, bandCountHint: Long): DataFrame = {
    val maxBands = t.sparkSession.conf
      .getOption("spark.graft.bandedRank.broadcastMaxBands")
      .map(_.toLong).getOrElse(1L << 22)
    if (maxBands > 0 && (bandCountHint < 0 || bandCountHint <= maxBands)) broadcast(t)
    else t
  }

  /** Adds a global 1-based `rankName` column (row_number over `rowSort`)
    * and, per c in `cumCols`, a `cum_before_c` running pre-sum (frame
    * UNBOUNDED PRECEDING .. 1 PRECEDING — add the row's own value for an
    * inclusive running sum), without any input-sized single-partition
    * window. `bandCols` must already exist on `df` and satisfy the
    * monotone-coarsening contract above. `cumCols` must be LongType
    * (integer-exact sums; decimal/double callers pre-quantize).
    */
  def bandedRankCum(
      df: DataFrame,
      bandCols: Seq[String],
      bandSort: Seq[Column],
      rowSort: Seq[Column],
      cumCols: Seq[String] = Nil,
      rankName: String = "rank",
      bandCountHint: Long = -1L): DataFrame = {
    val aggs = count(lit(1)).cast("long").as("_bn") +:
      cumCols.map(c => sum(col(c)).cast("long").as(s"_b_$c"))
    val bands = df.groupBy(bandCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    // The ONLY unpartitioned window: band-count-sized, ~1/1024th of the
    // input by construction of the band keys.
    val wb = Window.orderBy(bandSort: _*).rowsBetween(Window.unboundedPreceding, -1)
    val withOffsets = cumCols.foldLeft(
      bands.withColumn("_off_rk", coalesce(sum("_bn").over(wb), lit(0L)))) { (acc, c) =>
      acc.withColumn(s"_off_$c", coalesce(sum(s"_b_$c").over(wb), lit(0L)))
    }
    val offCols = "_off_rk" +: cumCols.map(c => s"_off_$c")
    val wIn = Window.partitionBy(bandCols.map(col): _*).orderBy(rowSort: _*)
    val wInPre = wIn.rowsBetween(Window.unboundedPreceding, -1)
    val joined = df.join(
      maybeBroadcast(withOffsets.select((bandCols ++ offCols).map(col): _*),
        bandCountHint), bandCols)
    val ranked = joined
      .withColumn(rankName, (col("_off_rk") + row_number().over(wIn)).cast("long"))
    cumCols.foldLeft(ranked) { (acc, c) =>
      acc.withColumn(s"cum_before_$c",
        col(s"_off_$c") + coalesce(sum(col(c)).over(wInPre), lit(0L)))
    }.drop(offCols: _*)
  }

  /** Per-GROUP banded rank: like [[bandedRankCum]] but the rank restarts
    * for every `groupCols` value — the scale-safe replacement for
    * `Window.partitionBy(lowCardinalityKey).orderBy(...)` when one key
    * can hold a data-proportional slice (a single SOURCE of a 100 TB
    * corpus is a hot partition just like no-partition-at-all). The
    * offset window partitions by group over the BAND table (per-group
    * band-count-sized); in-band windows are bounded by band width.
    * Same monotone-coarsening contract as bandedRankCum, per group.
    */
  def groupedBandedRank(
      df: DataFrame,
      groupCols: Seq[String],
      bandCols: Seq[String],
      bandSort: Seq[Column],
      rowSort: Seq[Column],
      rankName: String = "rank",
      bandCountHint: Long = -1L,
      cumCols: Seq[String] = Nil): DataFrame = {
    val all = groupCols ++ bandCols
    val aggs = count(lit(1)).cast("long").as("_bn") +:
      cumCols.map(c => sum(col(c)).cast("long").as(s"_b_$c"))
    val bands = df.groupBy(all.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val wb = Window.partitionBy(groupCols.map(col): _*).orderBy(bandSort: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withOffsets = cumCols.foldLeft(
      bands.withColumn("_off_rk", coalesce(sum("_bn").over(wb), lit(0L)))) { (acc, c) =>
      acc.withColumn(s"_off_$c", coalesce(sum(s"_b_$c").over(wb), lit(0L)))
    }
    val offCols = "_off_rk" +: cumCols.map(c => s"_off_$c")
    val wIn = Window.partitionBy(all.map(col): _*).orderBy(rowSort: _*)
    val wInPre = wIn.rowsBetween(Window.unboundedPreceding, -1)
    val ranked = df.join(maybeBroadcast(withOffsets.select((all ++ offCols).map(col): _*),
        bandCountHint), all)
      .withColumn(rankName, (col("_off_rk") + row_number().over(wIn)).cast("long"))
    // per c in cumCols: `cum_before_c` = per-GROUP running pre-sum under
    // the same banded decomposition (add the row's own value for an
    // inclusive running sum) — bandedRankCum's cumsum, per group
    cumCols.foldLeft(ranked) { (acc, c) =>
      acc.withColumn(s"cum_before_$c",
        (col(s"_off_$c") + coalesce(sum(col(c)).over(wInPre), lit(0L))).cast("long"))
    }.drop(offCols: _*)
  }

  /** Standard-SQL `ntile(k)` in closed form from a global rank `i`
    * (1-based) and total count `n`: the first n mod k tiles take
    * `n div k + 1` rows, the rest `n div k` — identical to Spark's and
    * DuckDB's NTILE. All operands non-negative, so `div` (truncation)
    * matches `//` (floor) across engines. Pair with [[bandedRankCum]]
    * to replace a single-partition `ntile(k).over(Window.orderBy(...))`.
    */
  def ntileFromRank(i: Column, n: Column, k: Int): Column = {
    def idivC(a: Column, b: Column): Column =
      GraftColumns.column(IntegralDivide(
        GraftColumns.expression(a.cast("long")), GraftColumns.expression(b.cast("long"))))
    val q = idivC(n, lit(k))
    val r = n - q * lit(k)
    val cut = r * (q + lit(1))
    when(i <= cut, idivC(i + q, q + lit(1)))
      .otherwise(r + idivC(i - cut + q - lit(1), q))
      .cast("int")
  }
}
