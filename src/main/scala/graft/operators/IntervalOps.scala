package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval union / merge-overlaps per key (the "gaps and islands"
  * problem): collapse a set of possibly-overlapping [s, e) intervals
  * into maximal disjoint spans. The interval-flavored sibling of
  * gap-based sessionization (SessionOps): there the span is implied by
  * point gaps, here every row carries an explicit duration.
  *
  * Two implementations with identical semantics:
  *  - `mergeIntervals`: pure Column/window form — island id is the
  *    running count of "starts after every previous end" breaks, i.e.
  *    two window passes over ONE sort and a final aggregation (the
  *    shape that scales: one shuffle on the key, no state).
  *  - `mergeIntervalsTyped`: Dataset[Interval] + groupByKey/flatMapGroups
  *    (case-class Encoders) — the typed-API twin used where per-group
  *    imperative logic would otherwise grow un-expressible; kept
  *    result-identical by the cross-check spec.
  */
object IntervalOps {

  /** (key, island, s, e, n) per merged span; `sCol`/`eCol` must be
    * integral (epoch-µs style). Intervals touch-merge: [1,5) + [5,9)
    * becomes [1,9) (use e+1 semantics upstream if closed ends differ).
    */
  def mergeIntervals(df: DataFrame, keyCol: String, sCol: String, eCol: String): DataFrame = {
    val byStart = Window.partitionBy(keyCol).orderBy(col(sCol), col(eCol))
    val prevMaxE = max(col(eCol)).over(byStart.rowsBetween(Window.unboundedPreceding, -1))
    val tagged = df
      .withColumn("__new_island",
        when(col(sCol) > coalesce(prevMaxE, lit(Long.MinValue)), 1L).otherwise(0L))
      .withColumn("island", sum(col("__new_island")).over(
        byStart.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    tagged
      .groupBy(col(keyCol), col("island"))
      .agg(min(col(sCol)).as("s"), max(col(eCol)).as("e"), count(lit(1)).as("n"))
  }

  case class Interval(k: Long, s: Long, e: Long)
  case class MergedSpan(k: Long, island: Long, s: Long, e: Long, n: Long)

  /** Typed twin of `mergeIntervals` for Dataset users. */
  def mergeIntervalsTyped(ds: Dataset[Interval])(implicit spark: SparkSession): Dataset[MergedSpan] = {
    import spark.implicits._
    ds.groupByKey(_.k).flatMapGroups { (k, it) =>
      val sorted = it.toSeq.sortBy(iv => (iv.s, iv.e))
      val out = scala.collection.mutable.ArrayBuffer.empty[MergedSpan]
      var island = 0L
      for (iv <- sorted) {
        if (out.nonEmpty && iv.s <= out.last.e)
          out(out.length - 1) = out.last.copy(
            e = math.max(out.last.e, iv.e), n = out.last.n + 1)
        else {
          island += 1
          out += MergedSpan(k, island, iv.s, iv.e, 1L)
        }
      }
      out
    }
  }
}
