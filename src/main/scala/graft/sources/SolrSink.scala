package graft.sources

import graft.pipeline.Uris.ParsedUri
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Solr sink plumbing — reference semantics: solr/src/main/scala/dev/
  * mauch/spark/dfio/SolrDataFrameSourceSink.scala:1-94 (per-partition
  * client, batched UpdateRequests, UTC-ISO timestamp rendering, read()
  * unimplemented in the reference too).
  *
  * The SolrJ/Kerberos client itself is not on this classpath (zero-egress
  * container), so the one network seam is a `SolrClientFactory` resolved
  * by class name from `spark.graft.solr.clientFactory` — a deployment
  * registers a thin factory wrapping CloudSolrClient; tests register a
  * fake. Everything else (row→document conversion, partition iteration,
  * batching, commit-per-batch) is real and unit-tested.
  */
object SolrSink {

  /** One open connection to a collection; implementations wrap the real
    * client (e.g. CloudSolrClient + UpdateRequest per batch). */
  trait SolrCollectionClient extends AutoCloseable {
    /** Upsert one batch of documents (field → value maps) and commit. */
    def upsertBatch(docs: Seq[Map[String, Any]]): Unit
    def close(): Unit
  }

  /** Serializable factory opened once per partition on the executor. */
  trait SolrClientFactory extends Serializable {
    def open(collection: String): SolrCollectionClient
  }

  private val tsFormat = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")

  /** Row → Solr document: timestamps rendered as UTC ISO-8601 with literal
    * Z (reference convertTimeStamp), everything else passed through. */
  def rowToDoc(schema: StructType, row: Row): Map[String, Any] =
    schema.fields.zipWithIndex.map { case (f, i) =>
      val v =
        if (row.isNullAt(i)) null
        else f.dataType match {
          case TimestampType =>
            tsFormat.format(
              java.time.LocalDateTime.ofInstant(row.getTimestamp(i).toInstant, java.time.ZoneId.of("UTC")))
          case _ => row.get(i)
        }
      f.name -> v
    }.toMap

  /** Batched per-partition upsert: one client per partition, documents
    * grouped into `batchSize` update batches (each committed), client
    * closed at partition end. Distributed (no driver collect). */
  def write(df: DataFrame, collection: String, batchSize: Int, factory: SolrClientFactory): Boolean = {
    val schema = df.schema
    df.foreachPartition { (rows: Iterator[Row]) =>
      val client = factory.open(collection)
      try rows.map(rowToDoc(schema, _)).grouped(batchSize).foreach(b => client.upsertBatch(b))
      finally client.close()
    }
    true
  }
}

/** solr:///collection?batchSize=n — batched foreachPartition upsert; the
  * client factory comes from `spark.graft.solr.clientFactory` (class name
  * of a SolrSink.SolrClientFactory with a no-arg constructor). */
object SolrProvider extends SchemeProvider {
  val schemes = Seq("solr")
  override def apply(uri: ParsedUri): org.apache.spark.sql.SparkSession => DfSource with DfSink = { spark =>
    val collection = uri.pathParts.lastOption.filter(_.nonEmpty).orElse(uri.host).getOrElse("collection")
    val batchSize = uri.queryParams.get("batchSize").map(_.toInt).getOrElse(10000)
    new DfSource with DfSink {
      override def read(): DataFrame =
        throw new UnsupportedSourceInEnv("solr (read is sink-only, as in the reference)")
      override def write(df: DataFrame): Boolean = {
        val fqcn = spark.conf.get("spark.graft.solr.clientFactory", "")
        if (fqcn.isEmpty)
          throw new UnsupportedSourceInEnv("solr (no client on classpath; set spark.graft.solr.clientFactory)")
        val factory = Class.forName(fqcn).getDeclaredConstructor().newInstance()
          .asInstanceOf[SolrSink.SolrClientFactory]
        SolrSink.write(df, collection, batchSize, factory)
      }
    }
  }
}
