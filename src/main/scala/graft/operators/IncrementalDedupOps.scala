package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental near-duplicate detection: a daily NEW BATCH probed against
  * a PERSISTED MinHash index of the already-kept corpus — the most common
  * production dedup shape (crawl delta vs 100 TB of base documents),
  * where re-signaturing the base corpus per batch is the cost to kill.
  *
  * Scale posture (100 TB base, ~GB-scale daily delta):
  *  - the base corpus is signatured ONCE, at index-build time; the index
  *    is two bucketed catalog tables — `<prefix>_bands` (band_key, id)
  *    bucketed by band_key and `<prefix>_sigs` (id, hashed shingle set)
  *    bucketed by id — so the daily probe job's band join needs NO
  *    Exchange on the index side (the 100 TB side): only the small new
  *    batch shuffles to meet the bucket layout (or broadcasts; AQE picks);
  *  - new×base candidates come from that one band-key join; new×new
  *    candidates reuse the in-bucket pair generation (`allBucketPairs`,
  *    overflow-safe) over the new batch's own band buckets;
  *  - verification joins PRECOMPUTED shingle sets by id (base side from
  *    the sigs table, new side from one localCheckpointed scan of the
  *    batch) — the base corpus TEXT is never read again.
  *
  * Band parameters are part of the index contract: a probe must use the
  * same (shingleSize, numBands, rowsPerBand) the index was built with —
  * [[DedupOps.bandKeys]] is shared by both paths so the keys agree.
  */
object IncrementalDedupOps {

  /** Catalog table names of a persisted MinHash index. */
  final case class IndexTables(bands: String, sigs: String)

  /** Signature one batch of documents: (id, sh) with sh = hashed distinct
    * shingle set. Shared by index build and probe. */
  private def signatured(df: DataFrame, textCol: String, idCol: String, shingleSize: Int): DataFrame = {
    require(idCol != "sh", "incremental dedup: id column may not be named 'sh' (reserved)")
    df.select(col(idCol).as("id"), DedupOps.hashedShingleSet(col(textCol), shingleSize).as("sh"))
  }

  /** Build (overwrite) the persisted index for `base`. One pass computes
    * shingle sets + signatures; two bucketed writes lay out the band table
    * (by band_key — the probe join key) and the signature table (by id —
    * the verify join key). `numBuckets` should target per-task sort memory
    * at the deployment's base-corpus size (see BucketOps scaladoc).
    */
  def buildIndex(
      base: DataFrame,
      textCol: String,
      idCol: String,
      prefix: String,
      numBuckets: Int,
      shingleSize: Int = 3,
      numBands: Int = 8,
      rowsPerBand: Int = 4
  ): IndexTables = {
    // the two writers below (bands, sigs) run CONCURRENTLY and would
    // each re-run (and race) the shingle scan under a lazy pin — EAGER
    // materializes the signatured frame once before either starts
    val docs = signatured(base, textCol, idCol, shingleSize).transform(Ckpt.eagerCkpt)
    buildIndexOf(docs, prefix, numBuckets, numBands, rowsPerBand)
  }

  /** [[buildIndex]] over a PRECOMPUTED `(id, sh)` signature frame (r15
    * shared-signature entry — composite queries that also pair-generate
    * over the same corpus slice pin the signatures once and feed both).
    * The two bucketed writes target INDEPENDENT tables over one
    * materialized frame, so they run concurrently (guide §2.6) instead
    * of serializing two staged swaps; callers must hand a CHECKPOINTED
    * frame (both writers race its materialization otherwise).
    */
  def buildIndexOf(
      docsSh: DataFrame,
      prefix: String,
      numBuckets: Int,
      numBands: Int,
      rowsPerBand: Int
  ): IndexTables = {
    val k = numBands * rowsPerBand
    val bands = docsSh.select(
      col("id"),
      explode(DedupOps.bandKeys(DedupOps.minhashSigCol(col("sh"), k), numBands, rowsPerBand))
        .as("band_key"))
    val t = IndexTables(s"${prefix}_bands", s"${prefix}_sigs")
    Par.concurrently(
      BucketOps.writeBucketed(bands.select("band_key", "id"), t.bands, numBuckets,
        keys = Seq("band_key"), sortKeys = Seq("band_key")),
      BucketOps.writeBucketed(docsSh, t.sigs, numBuckets, keys = Seq("id"), sortKeys = Seq("id")))
    t
  }

  /** Index maintenance — the other half of the daily job: after a batch
    * is probed and its keepers decided, fold it into the index so
    * TOMORROW's batch dedups against it too. Same signature pass as the
    * build; rows append WITH the tables' bucket spec (appendBucketed), so
    * the probe-side join stays Exchange-free on the index side after any
    * number of appends. Band parameters must match the original build.
    */
  def appendToIndex(
      batch: DataFrame,
      textCol: String,
      idCol: String,
      index: IndexTables,
      numBuckets: Int,
      shingleSize: Int = 3,
      numBands: Int = 8,
      rowsPerBand: Int = 4
  ): Unit = {
    // EAGER: the two concurrent appends below would race a lazy pin's
    // first materialization and re-run the batch shingle scan twice
    val docs = signatured(batch, textCol, idCol, shingleSize).transform(Ckpt.eagerCkpt)
    appendToIndexOf(docs, index, numBuckets, numBands, rowsPerBand)
  }

  /** [[appendToIndex]] over a precomputed `(id, sh)` frame — the daily
    * job's probe and append share one batch signature pass (r15). The
    * two appends target independent tables, so they run concurrently. */
  def appendToIndexOf(
      docsSh: DataFrame,
      index: IndexTables,
      numBuckets: Int,
      numBands: Int,
      rowsPerBand: Int
  ): Unit = {
    val k = numBands * rowsPerBand
    val bands = docsSh.select(
      col("id"),
      explode(DedupOps.bandKeys(DedupOps.minhashSigCol(col("sh"), k), numBands, rowsPerBand))
        .as("band_key"))
    Par.concurrently(
      BucketOps.appendBucketed(bands.select("band_key", "id"), index.bands, numBuckets,
        keys = Seq("band_key"), sortKeys = Seq("band_key")),
      BucketOps.appendBucketed(docsSh, index.sigs, numBuckets, keys = Seq("id"), sortKeys = Seq("id")))
  }

  /** Verified near-dup pairs (a_id < b_id, exact Jaccard ≥ threshold)
    * between `newBatch` and the indexed base corpus PLUS within the new
    * batch itself — i.e. every pair involving at least one new document.
    * Ids must be disjoint from base ids (same-id re-crawls are filtered
    * from the cross candidates; handle true updates by rebuilding or
    * compacting the index). Band parameters must match the index build.
    *
    * `enforceDisjointIds` (default true) actually checks that contract
    * instead of trusting it: the verify step coalesces the base-table
    * signature first, so a re-crawled id with CHANGED text would be
    * silently scored against its stale base signature — exactly the
    * failure that must surface loudly, not skew thresholds. The check is
    * one semi-join count of the small batch against the id-bucketed sigs
    * table (Exchange-free on the index side); flip off only when an
    * upstream gate already guarantees disjointness and the probe is in a
    * latency-critical path.
    */
  def probe(
      newBatch: DataFrame,
      textCol: String,
      idCol: String,
      index: IndexTables,
      threshold: Double,
      shingleSize: Int = 3,
      numBands: Int = 8,
      rowsPerBand: Int = 4,
      maxBucketSize: Int = 64,
      enforceDisjointIds: Boolean = true
  ): DataFrame = {
    // one scan of the (small) new batch feeds band keys + both verify sides
    val newDocs = signatured(newBatch, textCol, idCol, shingleSize).transform(Ckpt.lazyCkpt)
    probeOf(newDocs, index, threshold, numBands, rowsPerBand, maxBucketSize, enforceDisjointIds)
  }

  /** [[probe]] over a PRECOMPUTED `(id, sh)` signature frame of the new
    * batch (r15 shared-signature entry): the daily job signatures its
    * batch once for the probe AND the subsequent index append. The frame
    * should be checkpointed by the caller (it feeds band keys + both
    * verify sides + the disjointness guard). */
  def probeOf(
      newDocs: DataFrame,
      index: IndexTables,
      threshold: Double,
      numBands: Int,
      rowsPerBand: Int,
      maxBucketSize: Int = 64,
      enforceDisjointIds: Boolean = true
  ): DataFrame = {
    val spark = newDocs.sparkSession
    val k = numBands * rowsPerBand
    if (enforceDisjointIds) {
      val overlap = newDocs.select("id")
        .join(spark.table(index.sigs).select("id"), Seq("id"), "left_semi")
      val sample = overlap.limit(5).collect().map(_.get(0))
      require(sample.isEmpty,
        s"incremental probe: ${sample.length}+ new-batch ids already exist in index '${index.sigs}' " +
          s"(e.g. ${sample.mkString(", ")}) — re-crawled ids would be verified against their STALE " +
          "base signatures; rebuild or compact the index, or drop the overlapping ids upstream")
    }
    val newBands = newDocs.select(
      col("id"),
      explode(DedupOps.bandKeys(DedupOps.minhashSigCol(col("sh"), k), numBands, rowsPerBand))
        .as("band_key"))
    // new×base: ONE equi-join on band_key; the index side is bucketed on
    // band_key so its scan plans with no Exchange
    val crossCands = newBands.as("n")
      .join(spark.table(index.bands).as("b"), col("n.band_key") === col("b.band_key"))
      .filter(col("n.id") =!= col("b.id"))
      .select(least(col("n.id"), col("b.id")).as("a"), greatest(col("n.id"), col("b.id")).as("b"))
    // new×new: in-bucket pair generation over the batch's own band buckets
    val newBuckets = newBands.groupBy("band_key").agg(sort_array(collect_list(col("id"))).as("ids"))
    val newCands = DedupOps.allBucketPairs(newBuckets, Seq("band_key"), "ids", maxBucketSize)
    val cands = crossCands.unionByName(newCands.select(col("a"), col("b"))).distinct()
    // verify on precomputed shingle sets: base side from the sigs table,
    // new side from the checkpointed batch scan — base text is never
    // re-read. Ids are disjoint across the two sources, so each pair
    // column takes two LEFT joins + coalesce rather than one join against
    // a union: unioning newDocs with the sigs table would discard the
    // table's bucketing and shuffle the full index side per probe, while
    // the left joins keep the sigs scan Exchange-free (the small
    // candidate side shuffles to the bucket layout instead).
    val baseSh = spark.table(index.sigs)
    def attach(pairs: DataFrame, key: String, out: String): DataFrame =
      pairs
        .join(baseSh.select(col("id").as(s"__${key}bi"), col("sh").as(s"__${key}bs")),
          col(key) === col(s"__${key}bi"), "left")
        .join(newDocs.select(col("id").as(s"__${key}ni"), col("sh").as(s"__${key}ns")),
          col(key) === col(s"__${key}ni"), "left")
        .withColumn(out, coalesce(col(s"__${key}bs"), col(s"__${key}ns")))
        .drop(s"__${key}bi", s"__${key}bs", s"__${key}ni", s"__${key}ns")
    attach(attach(cands, "a", "sh_a"), "b", "sh_b")
      .withColumn("jaccard", DedupOps.jaccardSets(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("a").as("a_id"), col("b").as("b_id"), round(col("jaccard"), 4).as("jaccard"))
  }

  // ----- incremental winnowing (shared-PASSAGE) index -----
  // The same daily-delta posture applied to winnowing fingerprints
  // ([[DedupOps.winnowFingerprints]]): whole-doc MinHash misses a long
  // license block pasted into otherwise-unique docs; the fingerprint
  // index catches any shared run ≥ w+k−1 tokens against the ENTIRE kept
  // corpus without re-fingerprinting it. Index = one catalog table
  // `<prefix>_fps` (fp_hash, id) bucketed by fp_hash, so the probe's
  // hash join plans with no Exchange on the corpus side. (k, w,
  // minShared) are part of the index contract, exactly like the MinHash
  // band parameters.

  /** Fingerprint the base corpus once and persist the bucketed index.
    * Returns the fps table name. */
  def buildWinnowIndex(
      df: DataFrame,
      textCol: String,
      idCol: String,
      prefix: String,
      numBuckets: Int,
      k: Int = 4,
      w: Int = 4
  ): String = {
    val fps = DedupOps.winnowFingerprints(df, textCol, idCol, k, w)
      .select("fp_hash", "id").distinct()
    BucketOps.writeBucketed(fps, s"${prefix}_fps", numBuckets, Seq("fp_hash"),
      sortKeys = Seq("fp_hash"))
    s"${prefix}_fps"
  }

  /** Fold a batch's fingerprints into the index (bucket-spec-preserving
    * append — a mismatched spec is rejected loudly by appendBucketed). */
  def appendToWinnowIndex(
      df: DataFrame,
      textCol: String,
      idCol: String,
      fpsTable: String,
      numBuckets: Int,
      k: Int = 4,
      w: Int = 4
  ): Unit = {
    val fps = DedupOps.winnowFingerprints(df, textCol, idCol, k, w)
      .select("fp_hash", "id").distinct()
    BucketOps.appendBucketed(fps, fpsTable, numBuckets, Seq("fp_hash"),
      sortKeys = Seq("fp_hash"))
  }

  /** Probe a batch against the persisted fingerprint index: batch docs
    * sharing ≥ `minShared` distinct selected hashes with an INDEXED doc
    * (the MOSS link — guaranteed for any shared token run ≥ w+k−1 at
    * minShared = 1). Returns (idx_id, batch_id, n_shared). The batch's
    * fingerprints are computed once (checkpointed) and the index side
    * scans Exchange-free; within-batch pairs are the caller's
    * [[DedupOps.winnowDupPairs]] over the same batch. */
  def probeWinnowIndex(
      batch: DataFrame,
      textCol: String,
      idCol: String,
      fpsTable: String,
      minShared: Int = 2,
      k: Int = 4,
      w: Int = 4
  ): DataFrame = {
    val newFps = DedupOps.winnowFingerprints(batch, textCol, idCol, k, w)
      .select(col("fp_hash"), col("id"))
      .distinct()
      .transform(Ckpt.lazyCkpt)
    probeWinnowIndexOf(newFps, fpsTable, minShared)
  }

  /** [[probeWinnowIndex]] over a PRECOMPUTED `(fp_hash, id)` fingerprint
    * frame of the batch (r15 shared-fingerprint entry): winnowing
    * selection is a pure per-document function, so the daily job
    * fingerprints its batch once and feeds both this probe and the
    * within-batch [[DedupOps.winnowDupPairsOf]] pair generation. */
  def probeWinnowIndexOf(
      newFps: DataFrame,
      fpsTable: String,
      minShared: Int = 2
  ): DataFrame = {
    val spark = newFps.sparkSession
    newFps
      .select(col("fp_hash"), col("id").as("batch_id"))
      .join(spark.table(fpsTable).select(col("fp_hash"), col("id").as("idx_id")),
        Seq("fp_hash"))
      .filter(col("idx_id") =!= col("batch_id"))
      .groupBy("idx_id", "batch_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** STREAMING winnowing-index dedup + maintenance — the daily-delta
    * posture of [[buildWinnowIndex]]/[[probeWinnowIndex]] run as a
    * `foreachBatch` sink (the IVF-maintenance and CDC-apply exactly-once
    * precedents composed). Each micro-batch:
    *   1. probes the persisted fingerprint index — batch docs sharing
    *      ≥ `minShared` selected hashes with an indexed doc drop
    *      (index wins, the incremental contract);
    *   2. self-dedups the remainder (within-batch shared-passage pairs →
    *      keep-min-id components);
    *   3. lands survivor ROWS in the batch-keyed exactly-once parquet
    *      layout (`__batch_id=<n>` dynamic-partition overwrite —
    *      idempotent per batch);
    *   4. folds survivors' fingerprints into the index under the SAME
    *      bucket spec (appendBucketed rejects a mismatch loudly), so the
    *      next batch's probe still plans Exchange-free on the index side.
    *
    * Replayed batch ids are complete no-ops (commit marker written after
    * all writes). The crash window between the fingerprint append and
    * the marker can leave duplicate (fp_hash, id) rows on a replay; that
    * only INFLATES later probes' n_shared — over-dropping near-dup
    * candidates, never letting one through — and the batch-keyed
    * survivor write stays idempotent regardless (the IVF sink's
    * at-least-once note, with the failure direction made explicit).
    * Stream-maintained index ≡ the batch [[appendToWinnowIndex]] chain
    * over the same deltas — pinned in StreamingSpec.
    */
  def winnowIndexDedupSink(
      fpsTable: String,
      textCol: String,
      idCol: String,
      numBuckets: Int,
      outDir: String,
      commitDir: String,
      minShared: Int = 2,
      k: Int = 4,
      w: Int = 4
  ): (DataFrame, Long) => Unit =
    graft.streaming.StreamOps.idempotentForeachBatch(commitDir, { (batch, batchId) =>
      // eager checkpoint: the micro-batch frame feeds the probe, the
      // self-dedup pair gen, the survivor write AND the index append —
      // and the append must not evaluate a plan that still reads the
      // table being appended to (writeBucketed deadlock contract)
      val stable = batch.transform(Ckpt.eagerCkpt)
      val dropIdx = probeWinnowIndex(stable, textCol, idCol, fpsTable, minShared, k, w)
        .select(col("batch_id").as("__drop_id")).distinct()
      val clean = stable.join(dropIdx, stable(idCol) === col("__drop_id"), "left_anti")
      val pairs = DedupOps.winnowDupPairs(clean, textCol, idCol, k, w, minShared)
        .select(col("a_id"), col("b_id"))
      val kept = DedupOps.applyPairDedup(clean, idCol, pairs).transform(Ckpt.eagerCkpt)
      kept.withColumn("__batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__batch_id")
        .parquet(outDir)
      appendToWinnowIndex(kept, textCol, idCol, fpsTable, numBuckets, k, w)
    })
}
