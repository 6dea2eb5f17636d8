package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-registry client seam. The Confluent client stack (registry
  * REST client, Abris) is not on this classpath (zero-egress container),
  * so — like `SolrSink.SolrClientFactory` — the one network seam is a
  * factory resolved by class name from
  * `spark.graft.schemaRegistry.clientFactory`: a deployment registers a
  * thin wrapper over CachedSchemaRegistryClient; tests register a fake.
  */
object SchemaRegistry {

  /** One connection to a schema registry. */
  trait RegistryClient extends AutoCloseable {
    /** Latest registered (schemaId, Avro schema JSON) for a subject. */
    def latestSchema(subject: String): (Int, String)
    def close(): Unit = ()
  }

  /** Opened with the `schema.registry.*` config map — each key is passed
    * both with its full name and with the `schema.registry.` prefix
    * stripped (reference AvroSchemaRegistrySerde.scala:34-40 does the
    * same because downstream clients expect some keys, e.g.
    * `basic.auth.*`, unprefixed). */
  trait RegistryClientFactory extends Serializable {
    def open(config: Map[String, String]): RegistryClient
  }
}

/** Confluent-style schema-registry Avro value serde — reference
  * semantics: serde/src/main/scala/dev/mauch/spark/dfio/
  * AvroSchemaRegistrySerde.scala:1-47 (latest-version reader/writer
  * schema via the TOPIC-NAME strategy, `schema.registry.*` +
  * `schema.topic.name` config) re-expressed without the Abris/Confluent
  * dependency chain. The registry lookup happens once on the driver at
  * plan time through the [[SchemaRegistry.RegistryClientFactory]] seam;
  * the Confluent wire format (magic byte 0x00 + int32-BE schema id +
  * Avro binary body) is pure column arithmetic, and the Avro body codec
  * delegates to [[AvroSchemaSerde]] (degrades to UnsupportedSourceInEnv
  * when the spark-avro module is absent, as all connector codecs here
  * do).
  *
  * Reader-schema semantics match the reference's
  * `downloadReaderSchemaByLatestVersion`: deserialization uses the
  * subject's LATEST schema, not the per-record writer id (the embedded
  * id is surfaced by [[AvroRegistrySerde.writerSchemaId]] for callers
  * that want to audit it).
  *
  * @param topicSpec topic from the serde spec (`avro-registry:<topic>`);
  *                  falls back to the `schema.topic.name` session conf.
  */
final class AvroRegistrySerde(topicSpec: Option[String]) extends Serde {
  import AvroRegistrySerde._

  private def topic(spark: SparkSession): String =
    topicSpec.orElse(spark.conf.getOption("schema.topic.name")).getOrElse(
      throw new IllegalArgumentException(
        "avro-registry: no topic — pass avro-registry:<topic> or set schema.topic.name"))

  /** Subject under the topic-name strategy (values of a topic). */
  def subject(spark: SparkSession): String = s"${topic(spark)}-value"

  /** Driver-side registry lookup: resolve the client factory from the
    * session conf, fetch the subject's latest (id, schema). */
  def fetchLatestSchema(spark: SparkSession): (Int, String) = {
    val fqcn = spark.conf.get(FactoryConfKey, "")
    if (fqcn.isEmpty)
      throw new UnsupportedSourceInEnv(
        s"serde=avro-registry (no registry client on classpath; set $FactoryConfKey)")
    val prefixed = spark.conf.getAll.filter { case (k, _) => k.startsWith(ConfigPrefix) }
    if (!prefixed.contains(s"${ConfigPrefix}url"))
      throw new IllegalArgumentException(s"avro-registry: ${ConfigPrefix}url is not set")
    val config = prefixed ++ prefixed.map { case (k, v) => k.stripPrefix(ConfigPrefix) -> v }
    val factory = Class.forName(fqcn).getDeclaredConstructor().newInstance()
      .asInstanceOf[SchemaRegistry.RegistryClientFactory]
    val client = factory.open(config)
    try client.latestSchema(subject(spark))
    finally client.close()
  }

  override def serialize(df: DataFrame): DataFrame = {
    val (schemaId, schemaJson) = fetchLatestSchema(df.sparkSession)
    val body = new AvroSchemaSerde(schemaJson).serialize(df)
    body.select(confluentWrap(schemaId, col("value")).as("value"))
  }

  override def deserialize(df: DataFrame): DataFrame = {
    val (_, schemaJson) = fetchLatestSchema(df.sparkSession)
    new AvroSchemaSerde(schemaJson)
      .deserialize(df.select(confluentPayload(col("value")).as("value")))
  }
}

object AvroRegistrySerde {
  val FactoryConfKey = "spark.graft.schemaRegistry.clientFactory"
  val ConfigPrefix = "schema.registry."

  private val Magic = Array(0.toByte)

  /** Confluent framing: 0x00 magic + int32 big-endian schema id + body. */
  def confluentWrap(schemaId: Int, body: Column): Column =
    concat(lit(Magic), lit(java.nio.ByteBuffer.allocate(4).putInt(schemaId).array()), body)

  /** Avro body of a Confluent-framed record; throws on a record that does
    * not start with the 0x00 magic byte (same contract as the Confluent
    * deserializer — silently decoding garbage is worse than failing).
    * A NULL record value is a Kafka tombstone (routine in compacted
    * topics) and passes through as NULL — without the short-circuit the
    * magic-byte comparison is NULL and assert_true would throw. */
  def confluentPayload(value: Column): Column = {
    val magicOk = assert_true(
      substring(value, 1, 1) === lit(Magic),
      lit("avro-registry: record does not start with Confluent magic byte 0x00"))
    // assert_true returns NULL (or throws): the `when` keeps it in the plan
    when(value.isNull, lit(null).cast("binary"))
      .otherwise(when(magicOk.isNull, substring(value, 6, Int.MaxValue)))
  }

  /** int32-BE writer schema id embedded at bytes 2-5 of a framed record. */
  def writerSchemaId(value: Column): Column =
    conv(hex(substring(value, 2, 4)), 16, 10).cast("int")
}
