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

  /** Rendezvous (highest-random-weight) sharding plan (Thaler & Ravishankar
    * 1998): key → argmax over shards of md5(shard:key) — the consistent
    * routing scheme whose DEFINING property is minimal movement on
    * resharding (adding shard N+1 moves only ~1/(N+1) of keys, vs
    * ~N/(N+1) for mod-N). The report computes the assignment at
    * `nShards` AND `nShards+1` in one pass (argmax over the hex hash
    * string — no numeric conversion, ties impossible) and returns the
    * balance + the measured moved fraction, so the 1/(N+1) contract is
    * CHECKED ON DATA, not assumed. Shapes: one explode to keys×(N+1)
    * rows, one max_by aggregate per key, tiny shard-domain aggs.
    */
  def rendezvousPlan(keys: DataFrame, keyCol: String, nShards: Int): DataFrame = {
    val exploded = keys
      .select(col(keyCol).cast("string").as("k"))
      .select(col("k"), explode(sequence(lit(0), lit(nShards))).as("s"))
      .withColumn("h", md5(concat(lit("rz"), col("s"), lit(":"), col("k"))))
    val assigned = exploded.groupBy("k")
      .agg(
        max_by(col("s"), when(col("s") < nShards, col("h")).otherwise(lit("")))
          .as("shard_n"),
        max_by(col("s"), col("h")).as("shard_n1"))
      .transform(Ckpt.lazyCkpt) // feeds balance + movement once
    val moved = assigned.agg(
      count(lit(1)).cast("long").as("n_keys"),
      count(when(col("shard_n") =!= col("shard_n1"), 1)).cast("long").as("n_moved"))
    val balance = assigned.groupBy("shard_n").agg(count(lit(1)).cast("long").as("c"))
      .agg(min("c").cast("long").as("min_shard"), max("c").cast("long").as("max_shard"))
    moved.crossJoin(broadcast(balance)) // 1-row × 1-row
      .select(col("n_keys"), col("n_moved"),
        (col("n_moved").cast("double") / col("n_keys").cast("double")).as("moved_frac"),
        col("min_shard"), col("max_shard"),
        (col("max_shard").cast("double") / col("min_shard").cast("double")).as("balance"))
  }
}
