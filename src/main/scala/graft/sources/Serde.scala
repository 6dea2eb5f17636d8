package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Kafka-style value serde: DataFrame ⇄ single binary/string `value` column.
  * Mirrors the reference surface (serde=none|json[:schemaJson]|avro) —
  * /root/reference/serde/src/main/scala/dev/mauch/spark/dfio/ValueSerde.scala,
  * JsonSerde.scala — re-expressed as declarative column transforms.
  */
trait Serde {
  def serialize(df: DataFrame): DataFrame
  def deserialize(df: DataFrame): DataFrame
}

object NoneSerde extends Serde {
  override def serialize(df: DataFrame): DataFrame = df
  override def deserialize(df: DataFrame): DataFrame = df
}

/** JSON value serde. With a schema: fully declarative from_json (streaming
  * safe). Without: batch-only sampling inference via spark.read.json.
  */
final class JsonSerde(schema: Option[StructType]) extends Serde {
  override def serialize(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col).toIndexedSeq: _*)).as("value"))
  override def deserialize(df: DataFrame): DataFrame = {
    val strs = df.select(col("value").cast("string").as("value"))
    schema match {
      case Some(s) => strs.select(from_json(col("value"), s).as("v")).select("v.*")
      case None =>
        val spark = df.sparkSession
        import spark.implicits._
        spark.read.json(strs.as[String])
    }
  }
}

object Serde {
  /** `json`, `json:<json-encoded StructType>`, `avro:<schema file or
    * inline JSON>`, `avro-registry[:<topic>]` (schema-registry lookup —
    * topic defaults to `schema.topic.name`), `none`. The avro schemas
    * parse and plan everywhere; the binary codecs need the spark-avro
    * connector module and degrade to UnsupportedSourceInEnv when absent. */
  def apply(name: String): Serde = name.split(":", 2) match {
    case Array("none")         => NoneSerde
    case Array("json")         => new JsonSerde(None)
    case Array("json", schema) =>
      new JsonSerde(Some(DataType.fromJson(graft.pipeline.Uris.decode(schema)).asInstanceOf[StructType]))
    case Array("avro", spec)   => AvroSchemaSerde(spec)
    case Array("avro") =>
      throw new IllegalArgumentException("serde=avro requires a schema: avro:<path.avsc|url-encoded json>")
    case Array("avro-registry")        => new AvroRegistrySerde(None)
    case Array("avro-registry", topic) =>
      new AvroRegistrySerde(Some(graft.pipeline.Uris.decode(topic)))
    case _ => throw new IllegalArgumentException(s"unknown serde '$name'")
  }
}
