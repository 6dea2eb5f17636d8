package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization (batch). Streaming twin lives in
  * graft.streaming.StreamOps (flatMapGroupsWithState).
  *
  * One shuffle on the user key; two window passes over the same
  * partitioning (Spark reuses the sort). Timestamps are handled as integer
  * microseconds so results are engine-exact.
  */
object SessionOps {

  /** Assign a session index per key with a max-gap rule and aggregate one
    * row per session: (key, session_idx, n_events, start_us, end_us).
    *
    * @param gapSeconds new session when the gap to the previous event is
    *                   strictly greater than this many seconds
    */
  def sessionize(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      gapSeconds: Long
  ): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col("__us").asc)
    df.select(col(keyCol), unix_micros(col(tsCol)).as("__us"))
      .withColumn("__prev", lag(col("__us"), 1).over(w))
      .withColumn(
        "__new_session",
        when(col("__prev").isNull || col("__us") - col("__prev") > gapSeconds * 1000000L, 1).otherwise(0)
      )
      .withColumn("session_idx", sum(col("__new_session")).over(w))
      .groupBy(col(keyCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("__us")).as("start_us"),
        max(col("__us")).as("end_us")
      )
  }
}
