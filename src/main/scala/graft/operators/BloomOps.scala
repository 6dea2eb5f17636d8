package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Bloom-filter membership index: the "have we EVER kept this
  * document" primitive that complements the MinHash index
  * ([[IncrementalDedupOps]]) and the HLL sketch table ([[StatsOps]]).
  * A crawl pipeline asks exact-membership questions ("is this content
  * hash already in the corpus?") millions of times per daily batch;
  * answering them by anti-joining the 100 TB base table re-shuffles the
  * batch against the full corpus every day. A Bloom index answers the
  * same question from a table ~1/1000th the corpus size with a bounded
  * false-positive rate and ZERO false negatives — a "no" skips the doc
  * outright, a "yes" falls through to the (rare, now tiny) exact check.
  *
  * Representation — relational, not a driver-side bitmap: the filter is
  * a (word, bits) table, one row per non-zero 32-bit word of the bitmap.
  * That makes it
  *  - distributed end to end: build is explode + one map-side-combined
  *    `bit_or` groupBy; no executor ever holds the whole filter, no
  *    driver collect (Spark's own `might_contain` path materializes the
  *    filter in memory — this one never does);
  *  - persistable and MERGEABLE: daily shards union by word with
  *    `bit_or` ([[mergeIndexes]]), so append-only maintenance costs one
  *    tiny aggregation, never a rebuild (same contract as the HLL rows);
  *  - probe-able by join: a batch of probe values explodes to k
  *    (word, mask) lookups and left-joins the index on `word`. At
  *    production scale the index is written `bucketBy(word)`
  *    ([[BucketOps.writeBucketed]]) so the index side of that join needs
  *    no Exchange — only the small daily batch shuffles, the exact shape
  *    the MinHash probe already proves.
  *
  * Hashing is md5-prefix derived (15 hex chars → 60-bit positive value,
  * mod m) — slower than xxhash but bit-for-bit reproducible on ANY
  * engine, so the DuckDB oracle replays the whole filter exactly (same
  * idiom as SplitOps' md5 grains / hashedFeatures' buckets).
  *
  * Sizing: `bitsPerValue` = 16 with k = 7 gives FPR ≈ 7e-4. m is fixed
  * at index-creation time and is part of the index contract (like the
  * MinHash band parameters): pass `fixedBits` sized for the corpus the
  * index will GROW INTO — merging shards built with different m is
  * meaningless, and [[bloomProbe]] refuses mixed-m indexes at runtime.
  */
object BloomOps {

  /** k engine-portable bit positions for value `v`: position i =
    * md5("i:" + v) first 15 hex chars as a long, mod mBits. */
  private def positions(v: Column, k: Int, mBits: Column): Column =
    array((0 until k).map(i =>
      pmod(conv(substring(md5(concat(lit(s"$i:"), v)), 1, 15), 16, 10).cast("long"), mBits)): _*)

  /** Build a Bloom index over `values(valueCol)` → (word, bits, mbits).
    * Null values are skipped (membership of null is not a question this
    * structure answers). `fixedBits`, when given, pins the filter size
    * regardless of the batch's count — REQUIRED when the index will be
    * merged with other shards or appended to later; the count-derived
    * default (`bitsPerValue` × n, rounded up to whole words) is the
    * single-shot bootstrap. */
  def bloomIndex(
      values: DataFrame,
      valueCol: String,
      k: Int = 7,
      bitsPerValue: Int = 16,
      fixedBits: Option[Long] = None
  ): DataFrame = {
    require(k >= 1, "bloomIndex: k must be >= 1")
    require(bitsPerValue >= 1, "bloomIndex: bitsPerValue must be >= 1")
    val nz = values.filter(col(valueCol).isNotNull).select(col(valueCol).as("__v"))
    val params = fixedBits match {
      case Some(b) =>
        require(b >= 1, "bloomIndex: fixedBits must be >= 1")
        nz.sparkSession.range(1)
          .select(greatest(lit(32L), expr(s"(($b + 31) div 32) * 32")).as("mbits"))
      case None =>
        nz.agg(count(lit(1)).as("__n"))
          .select(greatest(lit(32L),
            expr(s"(($bitsPerValue * __n + 31) div 32) * 32")).as("mbits"))
    }
    nz.crossJoin(broadcast(params))
      .select(explode(positions(col("__v"), k, col("mbits"))).as("__pos"), col("mbits"))
      .groupBy(expr("__pos div 32").as("word"), col("mbits"))
      .agg(expr("bit_or(shiftleft(1L, cast(pmod(__pos, 32) as int)))").as("bits"))
      .select(col("word"), col("bits"), col("mbits"))
  }

  /** Union two index shards built with the SAME `mbits` (enforced at
    * probe time). One map-side-combined `bit_or` groupBy — the
    * append-only maintenance path: build today's shard from today's
    * batch, merge into the persisted table, never touch the base corpus. */
  def mergeIndexes(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("word", "mbits")
      .agg(expr("bit_or(bits)").as("bits"))
      .select("word", "bits", "mbits")

  /** Probe `probes(valueCol)` against an index → (idCol, might_contain).
    * `might_contain = false` is definitive (zero false negatives);
    * `true` is probabilistic at the index's FPR. A null probe value
    * yields a null verdict. k must equal the build-time k (index
    * contract, like MinHash band parameters). Refuses an index whose
    * rows carry mixed `mbits` (shards of different geometry merged by
    * mistake) via a runtime `raise_error`. */
  def bloomProbe(
      index: DataFrame,
      probes: DataFrame,
      idCol: String,
      valueCol: String,
      k: Int = 7
  ): DataFrame = {
    require(k >= 1, "bloomProbe: k must be >= 1")
    val params = index
      .agg(min("mbits").as("__lo"), max("mbits").as("__hi"))
      .select(
        when(col("__lo") === col("__hi"), col("__hi"))
          .otherwise(raise_error(lit("bloomProbe: index mixes shards with different mbits")))
          .as("mbits"))
    val lookups = probes
      .select(col(idCol), col(valueCol).as("__v"))
      .crossJoin(broadcast(params))
      .select(col(idCol), explode(positions(col("__v"), k, col("mbits"))).as("__pos"))
      .select(col(idCol), expr("__pos div 32").as("word"),
        expr("shiftleft(1L, cast(pmod(__pos, 32) as int))").as("__mask"))
    lookups
      .join(index.select("word", "bits"), Seq("word"), "left")
      .groupBy(col(idCol))
      .agg(bool_and(coalesce(col("bits"), lit(0L)).bitwiseAND(col("__mask")) =!= 0L)
        .as("might_contain"))
  }
}
