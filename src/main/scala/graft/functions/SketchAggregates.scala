package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.graft.GraftColumns
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** Misra-Gries heavy-hitters summary as a native mergeable aggregate
  * (TypedImperativeAggregate): `misra_gries(col, k)` returns a
  * map<key,long> of at most k candidate keys with residual counts.
  *
  * Contracts (Misra & Gries '82; merge rule from Agarwal et al.,
  * "Mergeable Summaries", PODS'12 — combine counts, then subtract the
  * (k+1)-th largest count from all and drop non-positives):
  *   - every key with true frequency > n/(k+1) IS in the map (zero false
  *     negatives above the threshold — the property heavy-hitter
  *     pipelines rely on);
  *   - for every key in the map:  true − n/(k+1) ≤ count ≤ true.
  * The summary is a CANDIDATE set: callers verify with one exact counting
  * pass over the candidates (see SparkEntry `text_heavy_tokens`) — the
  * classic two-scan pattern that finds frequent keys without ever
  * shuffling the full distinct-key domain (a groupBy over 100 TB of
  * tokens shuffles billions of distinct grams; the sketch ships k
  * counters per partition).
  *
  * Key types: STRING and integral (stored as the evaluated Long/Int).
  * UTF8String keys are CLONED on first insert — the row buffer backing an
  * evaluated UTF8String is reused by the scanner.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Any, Long]] with UnaryLike[Expression] {

  require(k >= 1, "misra_gries needs k >= 1")

  override def prettyName: String = "graft_misra_gries"
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(child.dataType, LongType, valueContainsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[Any, Long] = mutable.HashMap.empty

  override def update(buf: mutable.HashMap[Any, Long], input: InternalRow): mutable.HashMap[Any, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    buf.get(v) match {
      case Some(c) => buf(v) = c + 1
      case None if buf.size < k =>
        val key = v match { case s: UTF8String => s.clone(); case other => other }
        buf(key) = 1L
      case None =>
        // decrement-all: consumes one count from k+1 distinct keys at once
        // — amortized O(1) per input since each decrement retires k+1
        // prior increments
        val dead = mutable.ArrayBuffer.empty[Any]
        buf.foreach { case (key, c) => if (c == 1L) dead += key else buf(key) = c - 1 }
        dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(b1: mutable.HashMap[Any, Long], b2: mutable.HashMap[Any, Long]): mutable.HashMap[Any, Long] = {
    b2.foreach { case (key, c) => b1(key) = b1.getOrElse(key, 0L) + c }
    if (b1.size <= k) b1
    else {
      val counts = b1.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(b1.size - (k + 1)) // (k+1)-th largest
      val kept = b1.iterator.collect { case (key, c) if c > cut => key -> (c - cut) }
      mutable.HashMap.from(kept)
    }
  }

  override def eval(buf: mutable.HashMap[Any, Long]): Any = {
    // deterministic key order in the emitted map (callers explode it; a
    // stable order keeps plans and tests replay-identical)
    val entries = buf.toArray.sortBy {
      case (s: UTF8String, _) => s.toString
      case (l: java.lang.Long, _) => f"$l%020d"
      case (i: java.lang.Integer, _) => f"${i.longValue()}%020d"
      case (other, _) => String.valueOf(other)
    }
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(_._1)),
      new GenericArrayData(entries.map(_._2)))
  }

  override def serialize(buf: mutable.HashMap[Any, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, c) =>
      key match {
        case s: UTF8String =>
          val b = s.getBytes; out.writeInt(b.length); out.write(b)
        case l: java.lang.Long => out.writeLong(l)
        case i: java.lang.Integer => out.writeInt(i)
        case other => throw new IllegalStateException(s"unsupported MG key: ${other.getClass}")
      }
      out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Any, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[Any, Long]
    var i = 0
    while (i < n) {
      val key: Any = child.dataType match {
        case StringType =>
          val len = in.readInt(); val b = new Array[Byte](len); in.readFully(b)
          UTF8String.fromBytes(b)
        case LongType => java.lang.Long.valueOf(in.readLong())
        case IntegerType => java.lang.Integer.valueOf(in.readInt())
        case other => throw new IllegalStateException(s"unsupported MG key type: $other")
      }
      buf(key) = in.readLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}

object SketchAggregates {
  /** Heavy-hitter candidate map (≤ k entries) — see [[MisraGries]]. */
  def misraGries(c: Column, k: Int): Column =
    GraftColumns.column(MisraGries(GraftColumns.expression(c), k).toAggregateExpression())
}
