package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: per-key fixed-interval grids with
  * forward-filled values — the "resample + ffill" operation (pandas
  * asfreq/ffill, QuestDB SAMPLE BY, Timescale time_bucket_gapfill).
  *
  * Scale posture: the grid is generated FROM the per-key bounds row
  * (sequence + explode on an aggregated, key-sized frame), never by
  * cross-joining a calendar dimension against the full fact table; the
  * fact side contributes one pre-aggregated row per (key, bucket). Two
  * shuffles total (bucket agg, grid join) plus one window sort for the
  * fill — all partitioned by key, so a 1000-executor cluster spreads
  * keys evenly and no stage sees unaggregated events twice.
  */
object ResampleOps {

  /** Per-(key, bucket) aggregates on a dense integer bucket grid spanning
    * each key's [min, max] bucket, absent buckets forward-filled from the
    * last present one. `bucketCol` must be an integral bucket index
    * (e.g. epoch-hours). Output: key, bucket, n (0 on gap rows),
    * filled aggregate value, plus `gap` flag.
    *
    * @param aggs (alias → aggregate column) evaluated per (key, bucket);
    *             each is forward-filled independently.
    */
  /** @param maxBucketsPerKey guard against pathological keys whose
    *        [min, max] span would explode the grid (one stray 1970
    *        timestamp in an hourly resample = a 480k-element sequence
    *        per key). Keys over the cap are DROPPED from the output —
    *        the caller decides whether to clean or route them; silently
    *        truncating their grid would misreport gap structure. */
  def resampleFfill(
      df: DataFrame,
      keyCol: String,
      bucketCol: Column,
      aggs: Seq[(String, Column)],
      maxBucketsPerKey: Long = 1000000L
  ): DataFrame = {
    val perBucket = df
      .withColumn("bucket", bucketCol)
      .groupBy(col(keyCol), col("bucket"))
      .agg(count(lit(1)).as("n"), aggs.map { case (a, c) => c.as(a) }: _*)
    val grid = perBucket
      .groupBy(col(keyCol))
      .agg(min("bucket").as("lo"), max("bucket").as("hi"))
      .filter(col("hi") - col("lo") < maxBucketsPerKey)
      .select(col(keyCol), explode(sequence(col("lo"), col("hi"))).as("bucket"))
    val joined = grid.join(perBucket, Seq(keyCol, "bucket"), "left")
    val w = Window.partitionBy(keyCol).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = aggs.foldLeft(
      joined
        .withColumn("gap", col("n").isNull)
        .withColumn("n", coalesce(col("n"), lit(0L)))) { case (acc, (a, _)) =>
      acc.withColumn(a, last(col(a), ignoreNulls = true).over(w))
    }
    filled
  }
}
