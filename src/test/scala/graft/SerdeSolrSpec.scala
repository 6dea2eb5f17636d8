package graft

import graft.sources.{AvroSchemaSerde, Serde, SolrSink, UnsupportedSourceInEnv}
import graft.pipeline.Pipeline
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Avro schema serde + Solr sink plumbing (the two round-1 gaps). */
class SerdeSolrSpec extends SparkSpec {

  private val userSchema =
    """{"type":"record","name":"User","fields":[
      | {"name":"id","type":"long"},
      | {"name":"name","type":["null","string"],"default":null},
      | {"name":"scores","type":{"type":"array","items":"double"}},
      | {"name":"tags","type":{"type":"map","values":"int"}},
      | {"name":"kind","type":{"type":"enum","name":"Kind","symbols":["A","B"]}},
      | {"name":"blob","type":"bytes"}
      |]}""".stripMargin

  test("avro serde parses a schema file and maps it to the Spark schema") {
    val f = java.nio.file.Files.createTempFile("graft", ".avsc")
    java.nio.file.Files.writeString(f, userSchema)
    val serde = Serde(s"avro:$f").asInstanceOf[AvroSchemaSerde]
    assert(serde.sparkSchema == StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("scores", ArrayType(DoubleType, containsNull = false), nullable = false),
      StructField("tags", MapType(StringType, IntegerType, valueContainsNull = false), nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("blob", BinaryType, nullable = false)
    )))
  }

  test("avro serde accepts inline url-encoded schema JSON") {
    val enc = java.net.URLEncoder.encode(userSchema, "UTF-8")
    assert(Serde(s"avro:$enc").asInstanceOf[AvroSchemaSerde].avroSchema.getName == "User")
  }

  test("avro serde rejects malformed schemas eagerly") {
    intercept[Exception](Serde("avro:{\"type\":\"recorf\"}"))
  }

  test("avro codec degrades clearly when spark-avro is absent") {
    import spark.implicits._
    val serde = Serde(s"avro:${java.net.URLEncoder.encode(userSchema, "UTF-8")}")
    val e = intercept[UnsupportedSourceInEnv](serde.serialize(Seq(1L).toDF("id")))
    assert(e.getMessage.contains("avro"))
  }

  test("solr sink batches per partition through the pluggable client") {
    import spark.implicits._
    FakeSolrFactory.reset()
    val df = (1 to 25).map(i => (i.toLong, s"doc$i")).toDF("id", "title").repartition(2)
    assert(SolrSink.write(df, "col1", batchSize = 10, new FakeSolrFactory))
    val docs = FakeSolrFactory.docs
    assert(docs.size == 25)
    assert(docs.map(_("id").asInstanceOf[Long]).toSet == (1 to 25).map(_.toLong).toSet)
    // 2 partitions × batches of ≤10 over ~12-13 rows → 4 batches total, none over limit
    assert(FakeSolrFactory.batchSizes.forall(_ <= 10))
    assert(FakeSolrFactory.opened.get() == 2 && FakeSolrFactory.closed.get() == 2)
  }

  test("solr sink renders timestamps as UTC ISO-8601 with literal Z") {
    val schema = StructType(Seq(StructField("ts", TimestampType), StructField("x", IntegerType)))
    val row = org.apache.spark.sql.Row(java.sql.Timestamp.from(java.time.Instant.parse("2026-01-02T03:04:05.678Z")), 7)
    val doc = SolrSink.rowToDoc(schema, row)
    assert(doc("ts") == "2026-01-02T03:04:05.678Z" && doc("x") == 7)
  }

  test("solr URI without a configured client factory degrades clearly") {
    val (p, _) = Pipeline.fromArgs(Seq(
      "--source", "values:///?header=a:int&values=1",
      "--sink", "solr:///mycollection"))
    intercept[UnsupportedSourceInEnv](p.run(spark))
  }

  test("solr URI writes through a factory registered in spark conf") {
    FakeSolrFactory.reset()
    spark.conf.set("spark.graft.solr.clientFactory", classOf[FakeSolrFactory].getName)
    try {
      val (p, _) = Pipeline.fromArgs(Seq(
        "--source", "values:///?header=a:int&values=1;2;3",
        "--sink", "solr:///mycollection?batchSize=2"))
      assert(p.run(spark))
      assert(FakeSolrFactory.docs.map(_("a")).toSet == Set(1, 2, 3))
      assert(FakeSolrFactory.collections.toSet == Set("mycollection"))
    } finally spark.conf.unset("spark.graft.solr.clientFactory")
  }

  test("values source rejects rows whose arity disagrees with the header") {
    val (p, _) = Pipeline.fromArgs(Seq("--source", "values:///?header=a:int,b,c&values=1,x"))
    val e = intercept[IllegalArgumentException](p.resultView(spark, "sink").collect())
    assert(e.getMessage.contains("declares 3"))
  }

  test("file sink write failure returns false instead of crashing the pipeline") {
    import spark.implicits._
    val uri = graft.pipeline.Uris.ParsedUri(new java.net.URI("parquet:///proc/graft-definitely-not-writable/x"))
    val sink = graft.sources.SourceRegistry.forUri(uri)(spark)
    assert(!sink.write(Seq(1).toDF("a")))
  }
}

/** Collecting fake Solr client (test seam for SolrSink). */
class FakeSolrFactory extends SolrSink.SolrClientFactory {
  override def open(collection: String): SolrSink.SolrCollectionClient = {
    FakeSolrFactory.opened.incrementAndGet()
    FakeSolrFactory.collections.synchronized(FakeSolrFactory.collections += collection)
    new SolrSink.SolrCollectionClient {
      override def upsertBatch(docs: Seq[Map[String, Any]]): Unit = FakeSolrFactory.synchronized {
        FakeSolrFactory.docs ++= docs
        FakeSolrFactory.batchSizes += docs.size
      }
      override def close(): Unit = FakeSolrFactory.closed.incrementAndGet()
    }
  }
}

object FakeSolrFactory {
  val docs: mutable.Buffer[Map[String, Any]] = mutable.Buffer.empty
  val batchSizes: mutable.Buffer[Int] = mutable.Buffer.empty
  val collections: mutable.Buffer[String] = mutable.Buffer.empty
  val opened = new java.util.concurrent.atomic.AtomicInteger(0)
  val closed = new java.util.concurrent.atomic.AtomicInteger(0)
  def reset(): Unit = synchronized { docs.clear(); batchSizes.clear(); collections.clear(); opened.set(0); closed.set(0) }
}
