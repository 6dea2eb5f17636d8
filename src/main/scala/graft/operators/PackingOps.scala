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
}
