package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-flattening operators.
  *
  * Semantics follow the reference transformers
  * (/root/reference/core/src/main/scala/dev/mauch/spark/dfio/TransformerParser.scala:36-148):
  * `flatten` turns nested struct fields into top-level `a_b_c` columns;
  * `flattenExplode` additionally explodes arrays (arrays-of-structs are
  * exploded then flattened), repeating until the schema is flat.
  *
  * Both are single projections / generator nodes — fully codegen'd, no
  * shuffle, safe at any scale (explode multiplies rows, which is the
  * requested semantics).
  */
object FlattenOps {

  /** (selector column, flat alias) pairs for every leaf under `schema`. */
  private def leaves(schema: StructType, prefix: Vector[String]): Seq[(Column, Vector[String])] =
    schema.fields.toSeq.flatMap { f =>
      val path = prefix :+ f.name
      f.dataType match {
        case st: StructType => leaves(st, path)
        case _ =>
          val selector = path.map(p => s"`$p`").mkString(".")
          Seq(col(selector) -> path)
      }
    }

  /** Recursively flatten struct columns; arrays and maps are left as-is. */
  def flatten(df: DataFrame): DataFrame = {
    val cols = leaves(df.schema, Vector.empty).map { case (c, path) => c.as(path.mkString("_")) }
    if (cols.isEmpty) df else df.select(cols: _*)
  }

  /** Flatten structs and explode arrays until the schema has neither. */
  @scala.annotation.tailrec
  def flattenExplode(df: DataFrame): DataFrame = {
    val next = df.schema.fields.find(f =>
      f.dataType.isInstanceOf[StructType] || f.dataType.isInstanceOf[ArrayType])
    next match {
      case None => df
      case Some(f) =>
        val others = df.schema.fieldNames.toIndexedSeq.filterNot(_ == f.name).map(c => col(s"`$c`"))
        val transformed = f.dataType match {
          case st: StructType =>
            val flattened = leaves(st, Vector(f.name)).map { case (c, path) => c.as(path.mkString("_")) }
            df.select(others ++ flattened: _*)
          case at: ArrayType =>
            at.elementType match {
              case st: StructType =>
                val tmp = s"__x_${f.name}"
                val inner = leaves(st, Vector(tmp)).map { case (c, path) =>
                  c.as((f.name +: path.tail).mkString("_"))
                }
                df.withColumn(tmp, explode(col(s"`${f.name}`")))
                  .select(others ++ inner: _*)
              case _ =>
                df.withColumn(f.name, explode(col(s"`${f.name}`")))
            }
        }
        flattenExplode(transformed)
    }
  }
}
