package graft.sources.v2

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2: a deterministic synthetic table for scale testing.
  *
  * `spark.read.format("graft.sources.v2.SyntheticTableProvider")
  *   .option("rows", 10_000_000_000L).option("partitions", 10000).load()`
  *
  * yields `rows` rows of (id, bucket, value, tag) computed purely from
  * `id` — no storage, no I/O, any scale. The point for a 100 TB engine:
  * shuffle/agg/join plans can be load-tested at cluster scale without
  * first materializing a 100 TB input.
  *
  * Spark-native integration (what a real connector must do):
  *  - `SupportsPushDownRequiredColumns`: only requested columns are
  *    generated (a `select(bucket)` never computes tag strings);
  *  - `SupportsPushDownFilters`: id-range predicates (`> >= < <= =`)
  *    are absorbed into the generator bounds, so `WHERE id < 1000` over
  *    a trillion-row table plans only the input partitions intersecting
  *    [0, 1000) — partition pruning at the source, observable as a
  *    smaller `planInputPartitions` result. Non-id filters are left as
  *    residuals for Spark to evaluate.
  */
class SyntheticTableProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = SyntheticTable.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val rows = Option(properties.get("rows")).map(_.toLong).getOrElse(1000L)
    val parts = Option(properties.get("partitions")).map(_.toInt).getOrElse(8)
    new SyntheticTable(rows, parts)
  }
  override def supportsExternalMetadata(): Boolean = false
}

object SyntheticTable {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", IntegerType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("tag", StringType, nullable = false)))

  /** Row values as a pure function of id (engine-portable, replay-stable). */
  def bucketOf(id: Long): Int = (id % 32).toInt
  def valueOf(id: Long): Double = java.lang.Long.remainderUnsigned(id * 2654435761L, 10000L) / 10.0
  def tagOf(id: Long): String = "t" + (id % 10)
}

class SyntheticTable(rows: Long, parts: Int) extends Table with SupportsRead {
  override def name(): String = s"synthetic($rows rows, $parts partitions)"
  override def schema(): StructType = SyntheticTable.schema
  override def capabilities(): util.Set[TableCapability] = util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticScanBuilder(rows, parts)
}

class SyntheticScanBuilder(rows: Long, parts: Int)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {
  import org.apache.spark.sql.connector.expressions.NamedReference
  import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}

  private var lo: Long = 0L
  private var hi: Long = rows // exclusive
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SyntheticTable.schema
  private var pushedAgg: Option[Aggregation] = None

  private def fieldName(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case nr: NamedReference if nr.fieldNames.length == 1 => Some(nr.fieldNames()(0))
      case _ => None
    }

  /** Aggregate pushdown (partial): COUNT(*)/COUNT(col)/MIN(id)/MAX(id),
    * optionally grouped by `bucket`, are answered in CLOSED FORM from
    * the id range — a trillion-row `GROUP BY bucket COUNT(*)` plans
    * O(partitions × 32) arithmetic rows and never generates data. Spark
    * still runs the final merge aggregate over the per-partition rows
    * (supportCompletePushDown = false) — exactly the partial/final
    * split a real columnar source (parquet footers, etc.) exploits.
    */
  override def supportCompletePushDown(aggregation: Aggregation): Boolean = false

  override def pushAggregation(aggregation: Aggregation): Boolean = {
    val groupOk = aggregation.groupByExpressions.length <= 1 &&
      aggregation.groupByExpressions.forall(e => fieldName(e).contains("bucket"))
    val aggsOk = aggregation.aggregateExpressions.nonEmpty &&
      aggregation.aggregateExpressions.forall {
        case _: CountStar => true
        case c: Count => !c.isDistinct && fieldName(c.column).isDefined // all cols non-null
        case m: Min => fieldName(m.column).contains("id")
        case m: Max => fieldName(m.column).contains("id")
        case _ => false
      }
    if (groupOk && aggsOk) { pushedAgg = Some(aggregation); true } else false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (absorbed, residual) = filters.partition {
      case GreaterThan("id", _: Long) | GreaterThanOrEqual("id", _: Long) |
          LessThan("id", _: Long) | LessThanOrEqual("id", _: Long) | EqualTo("id", _: Long) => true
      case _ => false
    }
    absorbed.foreach {
      case GreaterThan("id", v: Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case LessThan("id", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("id", v: Long) => hi = math.min(hi, v + 1)
      case EqualTo("id", v: Long) => lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case _ => ()
    }
    pushed = absorbed
    residual // Spark re-evaluates residuals (and may re-check absorbed ones)
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def build(): Scan = pushedAgg match {
    case Some(a) => new SyntheticAggScan(lo, hi, rows, parts, a)
    case None    => new SyntheticScan(lo, hi, rows, parts, required)
  }
}

/** Scan produced when an aggregation was pushed: per input partition it
  * emits the ≤32 (bucket, partial-agg…) rows computed arithmetically
  * from the partition's id range. Output schema = group columns then one
  * field per aggregate, positionally — the V2ScanRelationPushDown
  * contract.
  */
class SyntheticAggScan(
    lo: Long, hi: Long, rows: Long, parts: Int,
    agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
    extends Scan with Batch {
  import org.apache.spark.sql.connector.expressions.aggregate.{Count, CountStar, Max, Min}

  private val grouped = agg.groupByExpressions.nonEmpty

  override def readSchema(): StructType = {
    val g = if (grouped) Seq(StructField("bucket", IntegerType, nullable = false)) else Nil
    val as = agg.aggregateExpressions.zipWithIndex.map {
      case (_: CountStar, i) => StructField(s"agg_$i", LongType, nullable = false)
      case (_: Count, i)     => StructField(s"agg_$i", LongType, nullable = false)
      case (_: Min, i)       => StructField(s"agg_$i", LongType, nullable = true)
      case (_: Max, i)       => StructField(s"agg_$i", LongType, nullable = true)
      case (other, _) => throw new IllegalStateException(s"unpushable aggregate $other")
    }
    StructType(g ++ as)
  }
  override def toBatch: Batch = this
  override def description(): String =
    s"SyntheticAggScan[lo=$lo, hi=$hi, grouped=$grouped, aggs=${agg.aggregateExpressions.length}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + parts - 1) / parts)
    val live: Array[InputPartition] = (0 until parts).iterator
      .map(p => SyntheticRange(math.max(lo, p * per), math.min(hi, (p + 1) * per)))
      .filter(r => r.start < r.end)
      .toArray
    // An ungrouped aggregate must still see ONE partial row when the
    // pushed filter empties the range: Spark rewrites the final merge of
    // a pushed COUNT to SUM(partial), and SUM over zero rows is NULL —
    // diverging from COUNT()=0 row-scan semantics. Emit one empty-range
    // partition (count 0, min/max NULL) instead of zero partitions.
    if (live.isEmpty && !grouped) Array[InputPartition](SyntheticRange(lo, lo)) else live
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticAggReaderFactory(agg, grouped)
}

class SyntheticAggReaderFactory(
    agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation,
    grouped: Boolean) extends PartitionReaderFactory {
  import org.apache.spark.sql.connector.expressions.aggregate.{Count, CountStar, Max, Min}

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[SyntheticRange]
    val aggs = agg.aggregateExpressions
    // closed-form per-bucket stats over the contiguous id range
    def bucketRows: Iterator[InternalRow] =
      (0 until 32).iterator.flatMap { b =>
        val first = r.start + (((b - (r.start % 32).toInt) % 32 + 32) % 32)
        if (first >= r.end) Iterator.empty
        else {
          val cnt = (r.end - 1 - first) / 32 + 1
          val last = first + (cnt - 1) * 32
          val vals = aggs.map {
            case _: CountStar => cnt
            case _: Count     => cnt
            case _: Min       => first
            case _: Max       => last
          }
          Iterator.single(new GenericInternalRow(Array[Any](b) ++ vals))
        }
      }
    def globalRow: Iterator[InternalRow] = {
      val empty = r.end <= r.start // the empty-range partial: count 0, min/max NULL
      val vals: Array[Any] = aggs.map {
        case _: CountStar => r.end - r.start
        case _: Count     => r.end - r.start
        case _: Min       => if (empty) null else r.start
        case _: Max       => if (empty) null else r.end - 1
      }
      Iterator.single(new GenericInternalRow(vals))
    }
    val it = if (grouped) bucketRows else globalRow
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean = { if (it.hasNext) { cur = it.next(); true } else false }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}

case class SyntheticRange(start: Long, end: Long) extends InputPartition

class SyntheticScan(lo: Long, hi: Long, rows: Long, parts: Int, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"SyntheticScan[lo=$lo, hi=$hi, rows=$rows, partitions=$parts, columns=${required.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + parts - 1) / parts)
    // only partitions intersecting the pushed id range are planned
    (0 until parts).iterator
      .map(p => SyntheticRange(math.max(lo, p * per), math.min(hi, (p + 1) * per)))
      .filter(r => r.start < r.end)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new SyntheticReaderFactory(required)
}

class SyntheticReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[SyntheticRange]
    // generate ONLY the pruned columns
    val gens: Array[Long => Any] = required.fields.map(_.name).map {
      case "id" => (id: Long) => id
      case "bucket" => (id: Long) => SyntheticTable.bucketOf(id)
      case "value" => (id: Long) => SyntheticTable.valueOf(id)
      case "tag" => (id: Long) => UTF8String.fromString(SyntheticTable.tagOf(id))
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
    new PartitionReader[InternalRow] {
      private var cur = r.start - 1
      override def next(): Boolean = { cur += 1; cur < r.end }
      override def get(): InternalRow = new GenericInternalRow(gens.map(g => g(cur)))
      override def close(): Unit = ()
    }
  }
}
