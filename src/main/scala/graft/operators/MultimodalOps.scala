package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
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
}
