package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-path layout operators: file sizing/compaction and multi-column
  * clustering (z-order) for data-skipping.
  *
  * Why this matters at 100 TB: readers prune with per-file min/max
  * statistics. A table written in arrival order has every file spanning
  * the whole key domain → zero pruning. Range-partitioning + in-file
  * sorting on ONE key gives perfect pruning on that key only; z-ordering
  * interleaves the bits of TWO keys so each file covers a small rectangle
  * of the (a, b) domain and selective filters on EITHER column skip most
  * files. The small-file problem is the dual: thousands of KB-sized files
  * overwhelm the driver's split enumeration — compaction rewrites to a
  * target file count/size.
  */
object WriteOps {

  /** Morton/z-value: bitwise interleave of two non-negative ints (a in
    * even bit positions, b in odd). Pure bit arithmetic — stays in
    * whole-stage codegen. Caller maps its domain onto [0, 2^bits). */
  def interleaveBits(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits)
      .map { i =>
        val abit = shiftleft(shiftright(a, i).bitwiseAND(lit(1)).cast("long"), 2 * i)
        val bbit = shiftleft(shiftright(b, i).bitwiseAND(lit(1)).cast("long"), 2 * i + 1)
        abit.bitwiseOR(bbit)
      }
      .reduce(_.bitwiseOR(_))
  }

  /** DataFrame clustered by the z-value of two int columns: range-
    * partitioned into `numFiles` z-ranges (disjoint per output file) and
    * sorted within each, so each written file covers a compact rectangle
    * of the (a, b) space. Write with `.write.parquet(...)` after this.
    * The helper column is dropped post-sort; range partitioning + the
    * in-partition sort survive the projection. */
  def zorderBy(df: DataFrame, a: String, b: String, numFiles: Int, bits: Int = 16): DataFrame =
    df.withColumn("__z", interleaveBits(col(a), col(b), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")

  /** Write with piggybacked metrics: named aggregates (row counts, null
    * counts, sums…) computed BY THE WRITE JOB itself via `observe` — no
    * second pass over the data, which at 100 TB is the difference between
    * "free observability" and "double the pipeline cost". Returns the
    * metric map after the write completes. */
  def writeWithMetrics(
      df: DataFrame,
      path: String,
      metrics: (String, Column)*
  ): Map[String, Any] = {
    require(metrics.nonEmpty, "pass at least one (name, aggregate) metric")
    val obs = new org.apache.spark.sql.Observation()
    val named = metrics.map { case (n, c) => c.as(n) }
    df.observe(obs, named.head, named.tail: _*)
      .write.mode("overwrite").parquet(path)
    obs.get
  }

  /** Idempotent daily-rerun write: DYNAMIC partition overwrite replaces
    * only the partitions present in `df` and leaves every other partition
    * untouched — the primitive that makes "re-run yesterday's failed
    * batch" safe. (Static overwrite mode — Spark's default — would drop
    * the ENTIRE table first; at 100 TB that is the difference between
    * rewriting one day and destroying three years.) The mode is set for
    * this write and restored after, so a session's other writes keep
    * their configured semantics.
    */
  def overwritePartitions(df: DataFrame, path: String, partCols: Seq[String]): Unit = {
    require(partCols.nonEmpty, "overwritePartitions needs at least one partition column")
    val spark = df.sparkSession
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try df.write.mode("overwrite").partitionBy(partCols: _*).parquet(path)
    finally prev.fold(spark.conf.unset(key))(v => spark.conf.set(key, v))
  }

  /** Rewrite to `numFiles` output files, optionally capping rows per file
    * (maxRecordsPerFile splits oversized partitions at write time — the
    * knob that keeps file sizes bounded when partition sizes are skewed).
    */
  def compact(
      df: DataFrame,
      path: String,
      numFiles: Int,
      maxRecordsPerFile: Long = 0L,
      sortCols: Seq[Column] = Nil
  ): Unit = {
    val arranged =
      if (sortCols.nonEmpty)
        df.repartitionByRange(numFiles, sortCols: _*).sortWithinPartitions(sortCols: _*)
      else df.repartition(numFiles)
    arranged.write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(path)
  }
}
