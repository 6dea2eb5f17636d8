package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketing helpers: pre-shuffle fact tables ONCE at write time so every
  * later equi-join / aggregation on the bucket key is shuffle-free.
  *
  * The 100 TB rationale: a fact table that is joined on the same key by
  * many downstream queries pays one write-time shuffle instead of one per
  * query. Two tables bucketed into the same bucket count on the same key
  * join with NO Exchange on either side (Spark picks SortMergeJoin over
  * co-located buckets); a groupBy on the bucket key likewise skips its
  * Exchange. Bucket count should target the per-task data a cluster
  * executor can sort in memory (e.g. 100 TB / 2048 buckets ≈ 50 GB — too
  * big; 16k buckets ≈ 6 GB — right order for 8-16 GB executors).
  *
  * Bucketed tables require the session catalog (`saveAsTable`): files are
  * laid out per bucket and the bucket spec lives in the table metadata.
  */
object BucketOps {

  /** Write `df` as a catalog table bucketed (and sorted) by `keys` into
    * `numBuckets` buckets. Sorting within buckets makes the later
    * SortMergeJoin skip its per-task sort too.
    *
    * `repartitionFirst` (default true) shuffles onto the bucket hash
    * before writing so each bucket is written by exactly ONE task → one
    * file per bucket. Without it a bucketed write emits up to
    * tasks×buckets files (100k tasks × 16k buckets at 100 TB is a
    * catastrophic small-file explosion, and every reader pays the
    * listing). The shuffle is the one-time write cost bucketing exists
    * to amortize; flip off only when the input is already co-partitioned.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      numBuckets: Int,
      keys: Seq[String],
      sortKeys: Seq[String] = Nil,
      repartitionFirst: Boolean = true
  ): Unit = {
    dropTable(df.sparkSession, table)
    val src = if (repartitionFirst) df.repartition(numBuckets, keys.map(df(_)): _*) else df
    val w0 = src.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
    val w = if (sortKeys.nonEmpty) w0.sortBy(sortKeys.head, sortKeys.tail: _*) else w0
    w.saveAsTable(table)
  }

  /** Append to an existing bucketed table with a MATCHING bucket spec:
    * new files land inside each bucket (Spark unions a bucket's files
    * into one scan partition, so later joins on the bucket key still
    * plan with no Exchange; the per-bucket sorted-scan guarantee holds
    * per file, so a join may re-sort in place — no shuffle either way).
    * A mismatched spec fails analysis rather than corrupting the layout.
    */
  def appendBucketed(
      df: DataFrame,
      table: String,
      numBuckets: Int,
      keys: Seq[String],
      sortKeys: Seq[String] = Nil,
      repartitionFirst: Boolean = true
  ): Unit = {
    val src = if (repartitionFirst) df.repartition(numBuckets, keys.map(df(_)): _*) else df
    val w0 = src.write.mode(SaveMode.Append).format("parquet")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
    val w = if (sortKeys.nonEmpty) w0.sortBy(sortKeys.head, sortKeys.tail: _*) else w0
    w.saveAsTable(table)
  }

  /** Drop `table` AND clear an orphaned managed-table location a previous
    * session may have left behind: the dir survives the JVM while the
    * in-memory catalog entry does not, and saveAsTable refuses to reuse
    * the location even in Overwrite mode (LOCATION_ALREADY_EXISTS).
    */
  def dropTable(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
    val loc = new org.apache.hadoop.fs.Path(wh, table.toLowerCase(java.util.Locale.ROOT))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** Join two same-bucketed catalog tables on their bucket key — with
    * matching bucket specs this plans with zero Exchange operators.
    */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      keys: Seq[String],
      joinType: String = "inner"
  ): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys, joinType)

  /** Number of Exchange (shuffle) operators in the executed plan — the
    * metric bucket-aware plans are graded on.
    */
  def countExchanges(df: DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.size
}
