package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pre-training: place documents into fixed-size
  * token windows (contexts) by concatenation order — the step between
  * "curated documents" and "training batches". Concatenate-then-chop
  * packing (GPT-style): documents are laid out back to back within a
  * shard and the stream is cut every `windowTokens` tokens, so a document
  * may span adjacent windows; the packing PLAN (who lands where) is what
  * this operator computes, deterministically.
  *
  * Scale posture: packing is inherently sequential WITHIN a stream, so
  * the corpus is sharded first (hash of the id — deterministic, not
  * round-robin) and each shard packs independently: one shuffle to the
  * shard's reducer, one in-partition sort, a running-sum window. Shards
  * are the parallelism knob (set ≈ cluster cores); a single global
  * stream would serialize 100 TB through one task, which is exactly what
  * the shard dimension avoids — same trade every production packer
  * (sharded .bin writers) makes.
  */
object PackingOps {

  /** Packing plan: one row per document with its shard, within-shard
    * token offset, and the [first_win, last_win] context-window span.
    * Empty documents occupy zero tokens (first_win = last_win = the
    * window at their offset, n_windows = 1, purely positional).
    *
    * @param tokenCountCol per-document token count (integral)
    * @param windowTokens  context length in tokens (e.g. 2048)
    *
    * `idCol` must be unique (it is the within-shard concatenation order);
    * duplicate ids would make the layout nondeterministic across runs.
    * @param shardCol      deterministic shard assignment — pass an
    *                      engine-portable hash (e.g. `SplitOps.bucket16`)
    *                      so the layout is reproducible anywhere, never a
    *                      partition-dependent expression
    */
  def packSequences(
      docs: DataFrame,
      idCol: String,
      tokenCountCol: Column,
      windowTokens: Long,
      shardCol: Column
  ): DataFrame = {
    require(windowTokens > 0, "windowTokens must be positive")
    val w = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(idCol), tokenCountCol.cast("long").as("n_tok"), shardCol.as("shard"))
      .withColumn("end_off", sum("n_tok").over(w))
      .withColumn("start_off", col("end_off") - col("n_tok"))
      // integer `div`, not double division: at 100 TB offsets exceed 2^53
      // token positions' double precision and floor(x/y) could misplace a
      // window boundary (same lesson as rangeJoin's bucket arithmetic)
      .withColumn("first_win", expr(s"start_off div $windowTokens"))
      .withColumn("last_win",
        when(col("n_tok") === 0, expr(s"start_off div $windowTokens"))
          .otherwise(expr(s"(end_off - 1) div $windowTokens")))
      .withColumn("n_windows", col("last_win") - col("first_win") + lit(1L))
      .select(idCol, "shard", "n_tok", "start_off", "first_win", "last_win", "n_windows")
  }

  /** Padding-waste accounting for length-bucketed batching — the report
    * that decides between padding and packing (packSequences) for a
    * corpus: bucket documents by token length rounded UP to a multiple
    * of `step` (capped at `contextLen`; longer docs truncate to the cap,
    * so their overflow is TRUNCATION, not padding), then per bucket
    * report document count, real tokens, padded slots, waste, and the
    * waste a naive pad-everything-to-context policy would pay. All
    * integer arithmetic except the final rounded ratio. One projection
    * + one bucket-keyed aggregation (≤ contextLen/step groups).
    */
  def paddingWaste(
      tokenCounts: DataFrame,
      nTokCol: String,
      contextLen: Int,
      step: Int
  ): DataFrame = {
    require(contextLen > 0 && step > 0 && contextLen % step == 0,
      "need contextLen > 0, step > 0, contextLen a multiple of step")
    val eff = least(col(nTokCol).cast("long"), lit(contextLen.toLong))
    tokenCounts
      .select(eff.as("__eff"),
        least(greatest(expr(s"((cast(${nTokCol} as bigint) + ${step - 1}) div $step) * $step"),
          lit(step.toLong)), lit(contextLen.toLong)).as("bucket_len"))
      .groupBy("bucket_len")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__eff")).as("real_tokens"))
      .withColumn("padded_slots", col("n_docs") * col("bucket_len"))
      .withColumn("waste", col("padded_slots") - col("real_tokens"))
      .withColumn("waste_ratio",
        round(col("waste").cast("double") / col("padded_slots"), 4))
      .withColumn("naive_waste", col("n_docs") * lit(contextLen.toLong) - col("real_tokens"))
      .orderBy("bucket_len")
  }
}
