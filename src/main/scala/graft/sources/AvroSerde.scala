package graft.sources

import org.apache.avro.Schema
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro value serde with an explicit schema (file path or inline JSON) —
  * reference semantics: serde/src/main/scala/dev/mauch/spark/dfio/
  * AvroSchemaSerde.scala:1-54 (schema file) re-expressed over Spark's own
  * `spark-avro` functions instead of a third-party Avro bridge.
  *
  * The schema is parsed and validated eagerly with the Apache Avro parser
  * (always on the classpath) and mapped to the Spark schema, so URI/plan
  * validation works everywhere; the binary encode/decode needs the
  * `spark-avro` connector module and degrades to UnsupportedSourceInEnv
  * with a clear message when absent (zero-egress container).
  */
final class AvroSchemaSerde(schemaJson: String) extends Serde {

  /** Parsed Avro schema (throws early on malformed schemas). */
  val avroSchema: Schema = new Schema.Parser().parse(schemaJson)

  /** Spark-side schema for the deserialized value. */
  val sparkSchema: StructType = AvroSchemaSerde.toSparkType(avroSchema) match {
    case s: StructType => s
    case other         => StructType(Seq(StructField("value", other)))
  }

  private def avroFn(name: String, args: Object*): Column =
    try {
      val cls = Class.forName("org.apache.spark.sql.avro.functions$")
      val module = cls.getField("MODULE$").get(null)
      val method = cls.getMethods.find(m => m.getName == name && m.getParameterCount == args.length)
        .getOrElse(throw new NoSuchMethodException(s"$name/${args.length}"))
      method.invoke(module, args: _*).asInstanceOf[Column]
    } catch {
      case e @ (_: ClassNotFoundException | _: NoClassDefFoundError) =>
        throw new UnsupportedSourceInEnv("serde=avro (spark-avro connector not on classpath)", e)
    }

  // Spark 4 exposes from_avro/to_avro in the Column API even without the
  // spark-avro module: the call resolves but ANALYSIS fails when the avro
  // expression classes are absent — treat that the same as class-not-found
  private def wrapMissing[T](f: => T): T =
    try f
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if Option(e.getMessage).exists(_.toLowerCase.contains("avro")) =>
        throw new UnsupportedSourceInEnv("serde=avro (spark-avro connector not on classpath)", e)
    }

  override def serialize(df: DataFrame): DataFrame =
    wrapMissing(df.select(avroFn("to_avro", struct(df.columns.map(col).toIndexedSeq: _*)).as("value")))

  override def deserialize(df: DataFrame): DataFrame =
    wrapMissing(df.select(avroFn("from_avro", col("value"), schemaJson).as("v")).select("v.*"))
}

object AvroSchemaSerde {

  /** Resolve `avro:<spec>`: a filesystem path to an .avsc file, or the
    * (url-encoded) schema JSON itself. */
  def apply(spec: String): AvroSchemaSerde = {
    val decoded = graft.pipeline.Uris.decode(spec)
    val json =
      if (decoded.trim.startsWith("{") || decoded.trim.startsWith("\"")) decoded
      else new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(decoded)), "UTF-8")
    new AvroSchemaSerde(json)
  }

  /** Avro → Spark type mapping (unions with null → nullable member;
    * enum/fixed → string/binary; logical types resolved structurally). */
  def toSparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.RECORD =>
      StructType(s.getFields.asScala.map { f =>
        val (dt, nullable) = memberType(f.schema())
        StructField(f.name(), dt, nullable)
      }.toSeq)
    case Schema.Type.ARRAY =>
      val (dt, nullable) = memberType(s.getElementType)
      ArrayType(dt, containsNull = nullable)
    case Schema.Type.MAP =>
      val (dt, nullable) = memberType(s.getValueType)
      MapType(StringType, dt, valueContainsNull = nullable)
    case Schema.Type.UNION   => memberType(s)._1
    case Schema.Type.STRING  => StringType
    case Schema.Type.ENUM    => StringType
    case Schema.Type.BYTES   => BinaryType
    case Schema.Type.FIXED   => BinaryType
    case Schema.Type.INT     => IntegerType
    case Schema.Type.LONG    => LongType
    case Schema.Type.FLOAT   => FloatType
    case Schema.Type.DOUBLE  => DoubleType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.NULL    => NullType
    case other => throw new IllegalArgumentException(s"unsupported avro type $other")
  }

  /** (sparkType, nullable) of a possibly-union member schema. */
  private def memberType(s: Schema): (DataType, Boolean) =
    if (s.getType == Schema.Type.UNION) {
      val members = s.getTypes.asScala.toSeq
      val nonNull = members.filterNot(_.getType == Schema.Type.NULL)
      val nullable = members.exists(_.getType == Schema.Type.NULL)
      nonNull match {
        case Seq(one) => (toSparkType(one), nullable)
        case many     => // general unions land as a struct of alternatives
          (StructType(many.zipWithIndex.map { case (m, i) =>
            StructField(s"member$i", toSparkType(m), nullable = true)
          }), nullable)
      }
    } else (toSparkType(s), s.getType == Schema.Type.NULL)
}
