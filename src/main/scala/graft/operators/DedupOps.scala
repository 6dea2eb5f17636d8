package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for document corpora.
  *
  * Scale posture (100 TB): every near-dup path is
  * (1) one projection computing per-doc signatures (codegen, linear scan),
  * (2) one shuffle on a blocking/band key,
  * (3) pair generation ONLY within buckets, with a bucket-size cap so a
  *     degenerate key can't go quadratic,
  * (4) a cheap exact verify on candidate pairs only.
  * Nothing ever does an unblocked self-join.
  */
object DedupOps {

  /** Exact dedup by content hash: one row per distinct content with the
    * smallest id as the keeper and the duplicate count.
    * One shuffle (groupBy hash); map-side partial aggregation applies.
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(fingerprint(col(textCol)).as("content_hash"), col(idCol))
      .groupBy("content_hash")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Keep-first exact dedup: returns the deduplicated rows themselves. */
  def exactKeepFirst(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(fingerprint(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** MinHash signature: for permutation i, min over shingles of
    * xxhash64(shingle, i). k hash functions ≈ k permutations.
    */
  def minhashSignature(text: Column, shingleSize: Int, k: Int): Column =
    transform(
      sequence(lit(0), lit(k - 1)),
      i => array_min(transform(array_distinct(shingles(text, shingleSize)), s => xxhash64(s, i)))
    )

  /** Candidate near-dup pairs via MinHash banding.
    *
    * numBands bands of rowsPerBand rows; docs agreeing on any band hash are
    * candidates. Emits (a_id, b_id) with a < b, deduplicated. The band
    * shuffle is the only shuffle; buckets larger than maxBucketSize are
    * dropped (degenerate content — handled by exact dedup instead).
    */
  def minhashCandidates(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      numBands: Int = 8,
      rowsPerBand: Int = 4,
      maxBucketSize: Int = 64
  ): DataFrame = {
    val k = numBands * rowsPerBand
    val sigs = df
      .select(col(idCol).as("id"), minhashSignature(col(textCol), shingleSize, k).as("sig"))
      .withColumn(
        "band_key",
        explode(transform(sequence(lit(0), lit(numBands - 1)), b => xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b)))
      )
      .select("id", "band_key")
    val sized = sigs.withColumn("bucket_n", count(lit(1)).over(Window.partitionBy("band_key")))
      .filter(col("bucket_n") <= maxBucketSize)
      .drop("bucket_n")
    sized.as("a")
      .join(sized.as("b"), col("a.band_key") === col("b.band_key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .distinct()
  }

  /** Exact Jaccard similarity between distinct word n-gram sets. */
  def jaccard(aText: Column, bText: Column, n: Int): Column = {
    val (sa, sb) = (array_distinct(shingles(aText, n)), array_distinct(shingles(bText, n)))
    val inter = size(array_intersect(sa, sb)).cast("double")
    val union = size(array_union(sa, sb)).cast("double")
    when(union === 0, 0d).otherwise(inter / union)
  }

  /** MinHash LSH near-dup pairs, verified by exact shingle Jaccard ≥ τ.
    * Candidate generation is banded (see minhashCandidates); the verify
    * join re-attaches the two texts by id (shuffle on id) and filters.
    */
  def minhashDupPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      threshold: Double,
      shingleSize: Int = 3,
      numBands: Int = 8,
      rowsPerBand: Int = 4
  ): DataFrame = {
    val cands = minhashCandidates(df, textCol, idCol, shingleSize, numBands, rowsPerBand)
    val docs = df.select(col(idCol).as("id"), col(textCol).as("text"))
    cands
      .join(docs.as("da"), col("a_id") === col("da.id"))
      .join(docs.as("db"), col("b_id") === col("db.id"))
      .withColumn("jaccard", jaccard(col("da.text"), col("db.text"), shingleSize))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Docs to drop under greedy keep-smallest-id near-dup policy. */
  def minhashDropIds(df: DataFrame, textCol: String, idCol: String, threshold: Double): DataFrame =
    minhashDupPairs(df, textCol, idCol, threshold).select(col("b_id").as("drop_id")).distinct()

  /** 64-bit SimHash over whitespace tokens: bit j is the sign of the sum
    * over tokens of ±1 according to bit j of xxhash64(token).
    * Single projection; no shuffle.
    */
  def simhash(text: Column): Column = {
    val toks = tokens(text)
    val counters = aggregate(
      toks,
      array((0 until 64).map(_ => lit(0)): _*),
      (acc, t) =>
        zip_with(
          acc,
          array((0 until 64).map(i => when(shiftright(xxhash64(t), i).bitwiseAND(1) === 1, 1).otherwise(-1)): _*),
          (a, b) => a + b
        )
    )
    (0 until 64)
      .map(i => when(element_at(counters, i + 1) > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
  }

  /** SimHash near-dup pairs: band the 64-bit signature into 4×16-bit
    * chunks (any exact chunk match → candidate; guarantees recall for
    * hamming ≤ 3), then verify hamming distance ≤ maxHamming.
    */
  def simhashDupPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxHamming: Int = 3,
      maxBucketSize: Int = 256
  ): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sig"))
    val banded = sigs
      .withColumn("cx", explode(array((0 until 4).map(j =>
        struct(lit(j).as("chunk_idx"), shiftright(col("sig"), 16 * j).bitwiseAND(0xffffL).as("chunk"))): _*)))
      .select(col("id"), col("sig"), col("cx.chunk_idx").as("chunk_idx"), col("cx.chunk").as("chunk"))
    val sized = banded
      .withColumn("bucket_n", count(lit(1)).over(Window.partitionBy("chunk_idx", "chunk")))
      .filter(col("bucket_n") <= maxBucketSize)
      .drop("bucket_n")
    sized.as("a")
      .join(sized.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") && col("a.chunk") === col("b.chunk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"), col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("a_id", "b_id", "hamming")
  }

  /** Blocked n-gram Jaccard dedup (engine-portable variant): block on
    * (blockCols) — e.g. source + length bucket — generate within-block
    * pairs, verify Jaccard ≥ τ. Fully SQL-expressible for the oracle.
    */
  def blockedJaccardPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      blockCols: Seq[Column],
      threshold: Double,
      shingleSize: Int = 3
  ): DataFrame = {
    val blocked = df.select(col(idCol).as("id"), col(textCol).as("text"),
      struct(blockCols: _*).as("block"))
    blocked.as("a")
      .join(blocked.as("b"), col("a.block") === col("b.block") && col("a.id") < col("b.id"))
      .withColumn("jaccard", jaccard(col("a.text"), col("b.text"), shingleSize))
      .filter(col("jaccard") >= threshold)
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"), col("jaccard"))
  }
}
