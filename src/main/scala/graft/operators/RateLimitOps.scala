package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic token-bucket rate limiting / admission control — the
  * batch replay of the throttling decision an ingestion edge applies,
  * used to audit "what WOULD this limiter have dropped" over history.
  *
  * The bucket holds up to `capUs` token-µs and refills linearly with
  * elapsed event time (1 token-µs per µs); each admitted event costs
  * `costUs`. The admission sequence is an ORDER-DEPENDENT integer fold
  * (zero FP), expressed as the sequential-fold idiom an SQL oracle can
  * replay bit-identically (Spark aggregate() over the sorted per-user
  * array ≡ DuckDB list_reduce). Per-user arrays are bounded by user
  * activity, the same contract as every per-user events window; the
  * streaming twin of this shape is transformWithState with the same
  * 2-long state.
  */
object RateLimitOps {
  def tokenBucket(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      tieCol: String,
      capUs: Long,
      costUs: Long): DataFrame = {
    def refilled(acc: Column, e: Column): Column =
      least(lit(capUs), element_at(acc, 1) + (e.getField(tsCol) - element_at(acc, 2)))
    events
      .groupBy(userCol)
      .agg(count(lit(1)).cast("bigint").as("n_events"),
        sort_array(collect_list(struct(col(tsCol), col(tieCol)))).as("evs"))
      .withColumn("st", aggregate(col("evs"),
        array(lit(capUs), lit(0L), lit(0L)), // [tokens_us, last_ts, n_admitted]
        (acc, e) => array(
          when(refilled(acc, e) >= costUs, refilled(acc, e) - costUs)
            .otherwise(refilled(acc, e)),
          e.getField(tsCol),
          element_at(acc, 3) + when(refilled(acc, e) >= costUs, 1L).otherwise(0L))))
      .select(col(userCol), col("n_events"),
        element_at(col("st"), 3).as("n_admitted"),
        (col("n_events") - element_at(col("st"), 3)).cast("bigint").as("n_throttled"))
  }
}
