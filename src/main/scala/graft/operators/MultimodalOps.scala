package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns plus a typed metadata struct
  * (`media_meta`): {mime, width, height, n_frames, sample_rate}. The
  * decode/feature kernels are container-STUBBED (no image/audio libs in
  * this environment): `fakeDecodeMeta` derives deterministic pseudo-metadata
  * from the bytes so the Spark-side plumbing — schema, batching,
  * partition-local decode via mapPartitions, column pruning before the
  * heavy stage — is real and testable. Swap `decodeKernel` for a JNI/lib
  * call in production; everything around it is unchanged.
  *
  * Scale notes: decode runs partition-local (mapPartitions — no shuffle,
  * no driver involvement); binary payloads are projected out BEFORE any
  * shuffle boundary so only small features move.
  */
object MultimodalOps {

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("sample_rate", IntegerType)
  ))

  /** Deterministic stand-in for a real decoder: derives metadata from byte
    * length + first bytes. Pure expressions → codegen, oracle-replicable.
    */
  def fakeDecodeMeta(df: DataFrame, binCol: String): DataFrame = {
    val n = length(col(binCol)) // byte length of binary
    df.withColumn(
      "media_meta",
      struct(
        lit("application/x-fake").as("mime"),
        (pmod(n, lit(640)) + 1).cast("int").as("width"),
        (pmod(n, lit(480)) + 1).cast("int").as("height"),
        (pmod(n, lit(30)) + 1).cast("int").as("n_frames"),
        lit(16000).as("sample_rate")
      )
    )
  }

  /** Partition-local decode via mapPartitions — the production shape for a
    * real codec (batch the bytes, call the native decoder, emit features).
    * The kernel here is the same deterministic fake as fakeDecodeMeta.
    */
  def decodePartitionLocal(df: DataFrame, binCol: String): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add("media_meta", mediaMetaSchema)
    val binIdx = inSchema.fieldIndex(binCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val meta = decodeKernel(bytes)
        Row.fromSeq(r.toSeq :+ meta)
      }
    }
  }

  /** STUB decode kernel — deterministic fake; replace with a real codec. */
  private def decodeKernel(bytes: Array[Byte]): Row = {
    val n = if (bytes == null) 0 else bytes.length
    Row("application/x-fake", n % 640 + 1, n % 480 + 1, n % 30 + 1, 16000)
  }

  /** "Resize": at this plumbing level, just rewrites target dims in the
    * metadata (a real implementation transforms the payload too).
    */
  def resizeMeta(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn(
      "media_meta",
      col("media_meta").withField("width", lit(w)).withField("height", lit(h))
    )

  /** Deterministic frame sampling plan: every `stride`-th frame index. */
  def frameSamplePlan(df: DataFrame, stride: Int): DataFrame =
    df.withColumn(
      "sampled_frames",
      sequence(lit(0), col("media_meta.n_frames") - 1, lit(stride))
    )

  /** aHash-style perceptual signature over a payload column: 126 "luma"
    * samples at evenly-spaced positions → threshold against the sample
    * mean → a 126-bit signature as TWO positive BIGINTs (sig_hi = bits
    * 0-62, sig_lo = bits 63-125; 63 bits per word keeps shifts/xors
    * sign-free in any engine). A small LOCAL edit to the payload moves
    * only the samples that land on it (plus mean-borderline bits), so
    * near-identical media land within a few hamming bits — the property
    * pHash-family image dedup runs on. 126 bits (not 63) is the
    * CANDIDATE-SELECTIVITY choice: banded lookup needs ≥9 bands for the
    * hamming-8 guarantee, and 14-bit bands are 128× more selective than
    * 7-bit ones — on the synthetic corpus's correlated bit distribution
    * that cut candidates 7.5M → the true-pair scale. The SAMPLER is the
    * env stub (codepoint at the sampled position — a real decoder
    * yields the luma grid); grid→threshold→signature is the production
    * shape.
    *
    * Shape: the sample array is computed ONCE per row and posexploded
    * (never an HOF that re-inlines the mean per element — the
    * UnitNormalize lesson); mean + bit-fold are two partial-agg
    * groupBys on the id, co-partitioned after the first shuffle.
    */
  def aHashSignatures(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    // native single-pass sampler (SampleCodepoints) — the Column form
    // ascii(substr(...)) re-scans the string to each position, O(126·n/2)
    // per row × two aggregate consumers; bit-identical replacement
    import org.apache.spark.sql.graft.GraftColumns
    val sample = GraftColumns.column(graft.functions.SampleCodepoints(
      GraftColumns.expression(col(payloadCol)), 126))
    val pix = df.select(col(idCol).as("id"), posexplode(sample).as(Seq("i", "pix")))
    val sums = pix.groupBy("id").agg(sum("pix").as("sp"))
    pix.join(sums, Seq("id"))
      .select(col("id"), col("i"),
        when(col("pix") * 126 > col("sp"), 1L).otherwise(0L).as("bit"))
      .groupBy("id")
      .agg(
        sum(when(col("i") < 63, expr("shiftleft(bit, i)")).otherwise(0L)).as("sig_hi"),
        sum(when(col("i") >= 63, expr("shiftleft(bit, i - 63)")).otherwise(0L)).as("sig_lo"))
  }

  /** Perceptual-hash near-dup pairs: (a_id, b_id, hamming ≤ maxHamming).
    * Candidates via 9 bands × 14 bits over the 126-bit signature — with
    * ≤ 8 differing bits at least one band is untouched, so recall at
    * maxHamming ≤ 8 is GUARANTEED, not probabilistic; verification is
    * two exact bit_count(xor) words on candidate pairs. One shuffle on
    * the (band, value) bucket, pair-gen inside buckets with the guarded
    * overflow join (a solid-color signature shared by half the corpus
    * never materializes m² structs in one task); signatures re-attach
    * by id from the lazily-checkpointed sig table (never recomputed).
    * Band 4 straddles the two words (bits 56-69) — extracted by the
    * same shift/mask CASE any engine replays.
    */
  def phashDupPairs(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      maxHamming: Int = 8,
      maxBucketSize: Int = 64
  ): DataFrame = {
    require(maxHamming <= 8, "9 bands × 14 bits guarantee recall only up to hamming 8")
    val sigs = aHashSignatures(df, idCol, payloadCol).transform(Ckpt.lazyCkpt)
    val bands = sigs.select(col("id"),
      explode(expr(
        """transform(sequence(0, 8), b -> struct(b,
          |  CASE WHEN b <= 3 THEN shiftright(sig_hi, b * 14) & 16383
          |       WHEN b = 4 THEN (shiftright(sig_hi, 56) & 127) | ((sig_lo & 127) * 128)
          |       ELSE shiftright(sig_lo, b * 14 - 63) & 16383 END AS v))""".stripMargin))
        .as("bk"))
    val buckets = bands
      .groupBy(col("bk.b").as("band"), col("bk.v").as("v"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
    DedupOps.boundedBucketPairs(buckets, Seq("band", "v"), "ids", maxBucketSize)
      .distinct()
      .join(sigs.select(col("id").as("a"), col("sig_hi").as("ha"), col("sig_lo").as("la")), Seq("a"))
      .join(sigs.select(col("id").as("b"), col("sig_hi").as("hb"), col("sig_lo").as("lb")), Seq("b"))
      .withColumn("hamming", expr("bit_count(ha ^ hb) + bit_count(la ^ lb)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("a").as("a_id"), col("b").as("b_id"), col("hamming").cast("int").as("hamming"))
  }

  /** Energy-based voice-activity detection (VAD) over an audio payload
    * column: per-frame energies → threshold → merge consecutive voiced
    * frames into segments (gaps-and-islands) → per-doc segmentation
    * report {n_frames, n_voiced, n_segments, longest_seg, voiced_ratio}.
    * The speech-vs-silence split is the audio twin of text quality
    * filtering — a curation pipeline drops silent clips and chunks the
    * rest at segment boundaries.
    *
    * The FRAME-ENERGY kernel is the env stub (energy = 16 bits of
    * md5(byte_len:frame) — a real decoder computes RMS over PCM
    * windows; deterministic, oracle-replayable). Everything around it
    * is the production shape: frames derive from a `sequence` (no
    * driver loop), the payload is projected out before the explode so
    * only (id, frame, energy) rows move, and the islands window
    * partitions BY DOC (per-doc frame counts are bounded by clip
    * length, so no hot partition at any corpus size).
    */
  /** Video shot-boundary detection (the classic histogram-difference
    * detector — Zhang et al. 1993): per-frame 8-bin color histograms,
    * L1 distance between CONSECUTIVE frames, a boundary where L1
    * exceeds the threshold; per clip {frames, shots, mean shot length,
    * max L1}. The decode kernel is the documented env STUB (no video
    * libs in this container): histograms are md5-derived but
    * SCENE-STRUCTURED — frames share a scene seed (scene = frame div
    * scene_len) plus small per-frame jitter, so within-scene L1 is
    * jitter-sized and scene cuts jump — giving the detector real
    * signal to find. The sequence/lag/threshold plumbing is the
    * production shape; swap `histBin` for a real decoder UDF at
    * deploy. All integers; one explode + one per-clip window. */
  def shotBoundaryReport(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      threshold: Int = 256): DataFrame = {
    val bl = length(col(payloadCol)).cast("long")
    val base = df.select(col(idCol).as("id"), bl.as("bl"),
      (pmod(bl, lit(60)) + 20).cast("int").as("n_frames"),
      (pmod(bl, lit(7)) + 5).cast("int").as("scene_len"))
    def histBin(b: Int) = {
      val scene = expr("frame_idx div scene_len").cast("int")
      (conv(substring(md5(concat(col("bl"), lit(":s"), scene, lit(":"), lit(b))), 1, 2),
        16, 10).cast("long") +
        pmod(conv(substring(md5(concat(col("bl"), lit(":f"), col("frame_idx"), lit(":"), lit(b))),
          1, 2), 16, 10).cast("long"), lit(16L))).as(s"h$b")
    }
    val frames = base
      .select(col("id"), col("bl"), col("n_frames"), col("scene_len"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
      .select(Seq(col("id"), col("n_frames"), col("frame_idx")) ++
        (0 until 8).map(histBin): _*)
    val w = Window.partitionBy("id").orderBy("frame_idx")
    val l1 = (0 until 8).map(b =>
      abs(col(s"h$b") - lag(s"h$b", 1).over(w))).reduce(_ + _)
    val scored = frames.withColumn("l1", l1)
    scored.groupBy("id")
      .agg(max("n_frames").cast("long").as("n_frames"),
        (sum(when(col("l1") > threshold, 1L).otherwise(0L)) + 1L).cast("long").as("n_shots"),
        max(coalesce(col("l1"), lit(0L))).cast("long").as("max_l1"))
      .withColumn("mean_shot_len_milli", expr("n_frames * 1000L div n_shots"))
  }

  def vadReport(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      threshold: Int = 32768): DataFrame = {
    val bl = length(col(payloadCol)).cast("long")
    val base = df.select(col(idCol).as("id"), bl.as("bl"),
      (pmod(bl, lit(40)) + 10).cast("int").as("n_frames"))
    val frames = base
      .select(col("id"), col("bl"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
      .withColumn("energy",
        conv(substring(md5(concat(col("bl").cast("string"), lit(":"),
          col("frame_idx").cast("string"))), 1, 4), 16, 10).cast("long"))
    val voiced = frames.filter(col("energy") >= threshold)
    val w = Window.partitionBy("id").orderBy("frame_idx")
    val segs = voiced
      .withColumn("island", col("frame_idx") - row_number().over(w))
      .groupBy("id", "island")
      .agg(count(lit(1)).cast("long").as("seg_len"))
      .groupBy("id")
      .agg(sum("seg_len").cast("long").as("n_voiced"),
        count(lit(1)).cast("long").as("n_segments"),
        max("seg_len").cast("long").as("longest_seg"))
    base
      .join(segs, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_frames").cast("long").as("n_frames"),
        coalesce(col("n_voiced"), lit(0L)).as("n_voiced"),
        coalesce(col("n_segments"), lit(0L)).as("n_segments"),
        coalesce(col("longest_seg"), lit(0L)).as("longest_seg"))
      .withColumn("voiced_ratio",
        col("n_voiced").cast("double") / col("n_frames").cast("double"))
  }
}
