package graft

import graft.sources.{AvroRegistrySerde, Serde, SchemaRegistry, SourceRegistry, UnsupportedSourceInEnv}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Schema-registry Avro serde: client-factory seam, Confluent framing,
  * topic/config precedence, and the kafka×serde composition. */
class AvroRegistrySpec extends SparkSpec {
  import spark.implicits._

  private val userSchema =
    """{"type":"record","name":"User","fields":[{"name":"id","type":"long"}]}"""

  private def withRegistryConf(topicConf: Option[String] = None)(body: => Unit): Unit = {
    FakeRegistryFactory.reset()
    spark.conf.set(AvroRegistrySerde.FactoryConfKey, classOf[FakeRegistryFactory].getName)
    spark.conf.set("schema.registry.url", "mock://registry:8081")
    spark.conf.set("schema.registry.basic.auth.user.info", "u:p")
    topicConf.foreach(spark.conf.set("schema.topic.name", _))
    try body
    finally {
      spark.conf.unset(AvroRegistrySerde.FactoryConfKey)
      spark.conf.unset("schema.registry.url")
      spark.conf.unset("schema.registry.basic.auth.user.info")
      spark.conf.unset("schema.topic.name")
    }
  }

  test("confluent framing roundtrips: magic byte, int32-BE schema id, body") {
    val payload = Array[Byte](1, 2, 3, 4, 5)
    val df = Seq(1).toDF("x").select(AvroRegistrySerde.confluentWrap(123456, lit(payload)).as("value"))
    val framed = df.select(col("value")).as[Array[Byte]].head()
    assert(framed.length == 5 + payload.length && framed(0) == 0.toByte)
    val back = df.select(
      AvroRegistrySerde.writerSchemaId(col("value")).as("id"),
      AvroRegistrySerde.confluentPayload(col("value")).as("body"))
      .as[(Int, Array[Byte])].head()
    assert(back._1 == 123456)
    assert(back._2.toSeq == payload.toSeq)
  }

  test("confluent payload extraction rejects a record without the magic byte") {
    val df = Seq(Array[Byte](7, 0, 0, 0, 1, 9)).toDF("value")
    val e = intercept[Exception](
      df.select(AvroRegistrySerde.confluentPayload(col("value"))).collect())
    assert(e.getMessage.contains("magic"))
  }

  test("NULL kafka value (tombstone) passes through confluentPayload as null, not an assert throw") {
    val framed = AvroRegistrySerde.confluentWrap(7, lit(Array[Byte](9)))
    val df = Seq(true, false).toDF("present")
      .select(when(col("present"), framed).as("value"))
    val out = df.select(AvroRegistrySerde.confluentPayload(col("value")).as("body"))
      .as[Option[Array[Byte]]].collect()
    assert(out.length == 2)
    assert(out.count(_.isEmpty) == 1)
    assert(out.flatten.head.toSeq == Seq(9.toByte))
  }

  test("registry lookup uses the topic-name strategy subject and passes both config key forms") {
    withRegistryConf() {
      val serde = Serde("avro-registry:events").asInstanceOf[AvroRegistrySerde]
      val (id, schema) = serde.fetchLatestSchema(spark)
      assert(id == FakeRegistryFactory.SchemaId && schema == FakeRegistryFactory.schemaJson)
      assert(FakeRegistryFactory.subjects.toSeq == Seq("events-value"))
      // reference AvroSchemaRegistrySerde.scala:34-40: prefixed AND truncated keys
      val cfg = FakeRegistryFactory.configs.head
      assert(cfg("schema.registry.url") == "mock://registry:8081" && cfg("url") == "mock://registry:8081")
      assert(cfg("basic.auth.user.info") == "u:p")
      assert(FakeRegistryFactory.closed.get() == 1)
    }
  }

  test("spec topic takes precedence over schema.topic.name; conf is the fallback") {
    withRegistryConf(topicConf = Some("conf-topic")) {
      Serde("avro-registry:spec-topic").asInstanceOf[AvroRegistrySerde].fetchLatestSchema(spark)
      Serde("avro-registry").asInstanceOf[AvroRegistrySerde].fetchLatestSchema(spark)
      assert(FakeRegistryFactory.subjects.toSeq == Seq("spec-topic-value", "conf-topic-value"))
    }
    // no spec topic and no conf → clear error
    val e = intercept[IllegalArgumentException](
      Serde("avro-registry").asInstanceOf[AvroRegistrySerde].subject(spark))
    assert(e.getMessage.contains("schema.topic.name"))
  }

  test("missing client factory / missing registry url degrade clearly") {
    val serde = Serde("avro-registry:t").asInstanceOf[AvroRegistrySerde]
    val e1 = intercept[UnsupportedSourceInEnv](serde.fetchLatestSchema(spark))
    assert(e1.getMessage.contains(AvroRegistrySerde.FactoryConfKey))
    spark.conf.set(AvroRegistrySerde.FactoryConfKey, classOf[FakeRegistryFactory].getName)
    try {
      val e2 = intercept[IllegalArgumentException](serde.fetchLatestSchema(spark))
      assert(e2.getMessage.contains("schema.registry.url"))
    } finally spark.conf.unset(AvroRegistrySerde.FactoryConfKey)
  }

  test("serialize fetches the schema from the registry, then the avro codec degrades honestly") {
    withRegistryConf() {
      val serde = Serde("avro-registry:users")
      val e = intercept[UnsupportedSourceInEnv](serde.serialize(Seq(1L).toDF("id")))
      assert(e.getMessage.contains("avro"))
      // the registry WAS consulted (framing id in hand) before the codec seam
      assert(FakeRegistryFactory.subjects.toSeq == Seq("users-value"))
    }
  }

  test("kafka uri composes the avro:file serde; connector-absent read degrades to UnsupportedSourceInEnv") {
    val f = java.nio.file.Files.createTempFile("graft", ".avsc")
    java.nio.file.Files.writeString(f, userSchema)
    val uri = graft.pipeline.Uris.ParsedUri(new java.net.URI(s"kafka://broker:9092/users?serde=avro:$f"))
    val endpoint = SourceRegistry.forUri(uri)(spark)
    // the serde resolved (schema parsed) at plan time; the kafka connector
    // jar is absent in this container, so I/O degrades with the scheme name
    val er = intercept[UnsupportedSourceInEnv](endpoint.read())
    assert(er.getMessage.contains("kafka"))
    val ew = intercept[UnsupportedSourceInEnv](endpoint.write(Seq(1L).toDF("id")))
    assert(ew.getMessage.toLowerCase.contains("kafka") || ew.getMessage.toLowerCase.contains("avro"))
  }

  test("CLI e2e: Pipeline.fromArgs kafka sink with serde=avro-registry runs the full uri→serde→framing path") {
    withRegistryConf() {
      val (p, _) = graft.pipeline.Pipeline.fromArgs(Seq(
        "--source", "values:///?header=id:long&values=1;2",
        "--sink", "kafka://broker:9092/orders?serde=avro-registry"))
      // run() materializes the sink: serialize → registry lookup (fake
      // factory) → Confluent framing → avro codec, which degrades
      // honestly in this connector-less container
      val e = intercept[UnsupportedSourceInEnv](p.run(spark))
      assert(e.getMessage.toLowerCase.contains("avro") || e.getMessage.toLowerCase.contains("kafka"))
      // the registry WAS consulted, with the subject derived from the
      // sink URI's topic under the topic-name strategy
      assert(FakeRegistryFactory.subjects.toSeq == Seq("orders-value"))
    }
  }

  test("kafka uri with bare serde=avro-registry adopts the uri topic (topic-name strategy)") {
    withRegistryConf() {
      val uri = graft.pipeline.Uris.ParsedUri(new java.net.URI("kafka://broker:9092/clicks?serde=avro-registry"))
      val endpoint = SourceRegistry.forUri(uri)(spark)
      // write → serde.serialize → registry lookup happens BEFORE the kafka
      // write, so the fake registry records the uri-derived subject
      intercept[UnsupportedSourceInEnv](endpoint.write(Seq(1L).toDF("id")))
      assert(FakeRegistryFactory.subjects.toSeq == Seq("clicks-value"))
    }
  }
}

/** Recording fake registry client (test seam for AvroRegistrySerde). */
class FakeRegistryFactory extends SchemaRegistry.RegistryClientFactory {
  override def open(config: Map[String, String]): SchemaRegistry.RegistryClient = {
    FakeRegistryFactory.synchronized(FakeRegistryFactory.configs += config)
    new SchemaRegistry.RegistryClient {
      override def latestSchema(subject: String): (Int, String) = {
        FakeRegistryFactory.synchronized(FakeRegistryFactory.subjects += subject)
        (FakeRegistryFactory.SchemaId, FakeRegistryFactory.schemaJson)
      }
      override def close(): Unit = FakeRegistryFactory.closed.incrementAndGet()
    }
  }
}

object FakeRegistryFactory {
  val SchemaId = 7
  val schemaJson =
    """{"type":"record","name":"User","fields":[{"name":"id","type":"long"}]}"""
  val subjects: mutable.Buffer[String] = mutable.Buffer.empty
  val configs: mutable.Buffer[Map[String, String]] = mutable.Buffer.empty
  val closed = new java.util.concurrent.atomic.AtomicInteger(0)
  def reset(): Unit = synchronized { subjects.clear(); configs.clear(); closed.set(0) }
}
