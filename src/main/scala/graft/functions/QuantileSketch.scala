package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.graft.GraftColumns
import org.apache.spark.sql.types._

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** Q-digest: a DETERMINISTIC mergeable quantile summary over an integer
  * universe [0, 2^W) (Shrivastava et al., SenSys'04; merge analysis in
  * Agarwal et al., "Mergeable Summaries", PODS'12).
  *
  * Unlike KLL/random-sampling sketches there is no coin flip anywhere —
  * the same input always yields the same sketch, so cross-run replay and
  * oracle checks are exact. Contracts:
  *   - size ≤ 3k nodes after compression;
  *   - any quantile read off the sketch has rank error ≤ W·n/k, and the
  *     bound SURVIVES arbitrary merge trees (the mergeability theorem) —
  *     build per-partition/per-day sketches, union them in any order,
  *     and the merged estimate still honors ε = W/k.
  *
  * Node layout: heap numbering over the complete binary tree — root 1,
  * node x at depth d (x ∈ [2^d, 2^{d+1})) covers the value range
  * [(x − 2^d) << (W−d), (x − 2^d + 1) << (W−d)); leaves are 2^W + v.
  * The emitted sketch is a map<bigint,bigint> of node→count in sorted
  * node order (replay-stable output).
  */
object QDigestKernel {
  /** threshold-driven bottom-up compression, in place; deterministic
    * (descending depth, ascending node id). */
  def compress(buf: mutable.HashMap[Long, Long], w: Int, k: Int): Unit = {
    val n = buf.valuesIterator.sum
    val t = n / k
    if (t <= 0) return
    var depth = w
    while (depth >= 1) {
      val lo = 1L << depth
      val hi = lo << 1
      val ids = buf.keysIterator.filter(id => id >= lo && id < hi).toArray
      java.util.Arrays.sort(ids)
      var i = 0
      while (i < ids.length) {
        val id = ids(i)
        if (buf.contains(id)) { // sibling may have been consumed already
          val sib = id ^ 1L
          val parent = id >> 1
          val combined = buf.getOrElse(id, 0L) + buf.getOrElse(sib, 0L) +
            buf.getOrElse(parent, 0L)
          if (combined <= t) {
            buf.remove(id); buf.remove(sib)
            if (combined > 0) buf(parent) = combined else buf.remove(parent)
          }
        }
        i += 1
      }
      depth -= 1
    }
  }

  def leaf(v: Long, w: Int): Long = {
    val clamped = math.min(math.max(v, 0L), (1L << w) - 1)
    (1L << w) + clamped
  }

  /** node id → (value range lo, hi-exclusive) */
  def range(id: Long, w: Int): (Long, Long) = {
    val depth = 63 - java.lang.Long.numberOfLeadingZeros(id)
    val span = 1L << (w - depth)
    val lo = (id - (1L << depth)) * span
    (lo, lo + span)
  }

  /** quantile estimate: nodes in post-order (ascending hi, deeper-first
    * on ties), accumulate until ⌈q·n⌉, report that node's inclusive
    * upper value. */
  def quantile(ids: Array[Long], counts: Array[Long], q: Double, w: Int): Long = {
    val order = ids.indices.sortBy { i =>
      val (lo, hi) = range(ids(i), w)
      (hi, java.lang.Long.MAX_VALUE - (hi - lo)) // hi asc, smaller span first
    }
    val n = counts.sum
    val target = math.max(1L, math.ceil(q * n).toLong)
    var cum = 0L
    var last = 0L
    for (i <- order) {
      cum += counts(i)
      last = range(ids(i), w)._2 - 1
      if (cum >= target) return last
    }
    last
  }

  def serialize(buf: mutable.HashMap[Long, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (id, c) => out.writeLong(id); out.writeLong(c) }
    out.flush(); bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): mutable.HashMap[Long, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[Long, Long]
    var i = 0
    while (i < n) { buf(in.readLong()) = in.readLong(); i += 1 }
    buf
  }

  def toMap(buf: mutable.HashMap[Long, Long]): ArrayBasedMapData = {
    val entries = buf.toArray.sortBy(_._1)
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(_._1)),
      new GenericArrayData(entries.map(_._2)))
  }
}

/** `qdigest(longCol, w, k)` → map<bigint,bigint> q-digest sketch. */
case class QDigest(
    child: Expression,
    w: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Long, Long]] with UnaryLike[Expression] {

  require(w >= 1 && w <= 62 && k >= 2, "qdigest needs 1 <= w <= 62, k >= 2")

  override def prettyName: String = "graft_qdigest"
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(LongType, LongType, valueContainsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[Long, Long] = mutable.HashMap.empty

  override def update(buf: mutable.HashMap[Long, Long], input: InternalRow): mutable.HashMap[Long, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val leaf = QDigestKernel.leaf(v.asInstanceOf[Number].longValue(), w)
    buf(leaf) = buf.getOrElse(leaf, 0L) + 1L
    if (buf.size > 6 * k) QDigestKernel.compress(buf, w, k)
    buf
  }

  override def merge(b1: mutable.HashMap[Long, Long], b2: mutable.HashMap[Long, Long]): mutable.HashMap[Long, Long] = {
    b2.foreach { case (id, c) => b1(id) = b1.getOrElse(id, 0L) + c }
    // compress lazily (same 6k high-water mark as update): an eager
    // compress per partial-merge is O(size*W) x thousands of merges and
    // dominated the 20M-row scale probe; the bound only needs compression
    // to happen SOMETIME before eval
    if (b1.size > 6 * k) QDigestKernel.compress(b1, w, k)
    b1
  }

  override def eval(buf: mutable.HashMap[Long, Long]): Any = {
    QDigestKernel.compress(buf, w, k)
    QDigestKernel.toMap(buf)
  }

  override def serialize(buf: mutable.HashMap[Long, Long]): Array[Byte] =
    QDigestKernel.serialize(buf)
  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Long, Long] =
    QDigestKernel.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QDigest =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QDigest =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QDigest =
    copy(child = newChild)
}

/** `qdigest_merge(mapCol, w, k)` → union of q-digest sketches (the
  * mergeable half: per-slice sketch ROWS combine without rescanning
  * source data; error stays ≤ W·n/k under any merge tree). */
case class QDigestMerge(
    child: Expression,
    w: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Long, Long]] with UnaryLike[Expression] {

  override def prettyName: String = "graft_qdigest_merge"
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(LongType, LongType, valueContainsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[Long, Long] = mutable.HashMap.empty

  override def update(buf: mutable.HashMap[Long, Long], input: InternalRow): mutable.HashMap[Long, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val m = v.asInstanceOf[MapData]
    val ids = m.keyArray.toLongArray()
    val counts = m.valueArray.toLongArray()
    var i = 0
    while (i < ids.length) { buf(ids(i)) = buf.getOrElse(ids(i), 0L) + counts(i); i += 1 }
    if (buf.size > 6 * k) QDigestKernel.compress(buf, w, k)
    buf
  }

  override def merge(b1: mutable.HashMap[Long, Long], b2: mutable.HashMap[Long, Long]): mutable.HashMap[Long, Long] = {
    b2.foreach { case (id, c) => b1(id) = b1.getOrElse(id, 0L) + c }
    // compress lazily (same 6k high-water mark as update): an eager
    // compress per partial-merge is O(size*W) x thousands of merges and
    // dominated the 20M-row scale probe; the bound only needs compression
    // to happen SOMETIME before eval
    if (b1.size > 6 * k) QDigestKernel.compress(b1, w, k)
    b1
  }

  override def eval(buf: mutable.HashMap[Long, Long]): Any = {
    QDigestKernel.compress(buf, w, k)
    QDigestKernel.toMap(buf)
  }

  override def serialize(buf: mutable.HashMap[Long, Long]): Array[Byte] =
    QDigestKernel.serialize(buf)
  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Long, Long] =
    QDigestKernel.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QDigestMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QDigestMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QDigestMerge =
    copy(child = newChild)
}

/** `qdigest_quantile(sketch, q, w)` → BIGINT value estimate. Scalar over
  * a sketch column; runs on slice-count-sized frames (one row per
  * sketch), so CodegenFallback costs nothing measurable. */
case class QDigestQuantile(child: Expression, q: Double, w: Int)
  extends UnaryExpression with CodegenFallback {
  require(q > 0.0 && q < 1.0, "quantile must be in (0,1)")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_qdigest_quantile"
  override def nullSafeEval(input: Any): Any = {
    val m = input.asInstanceOf[MapData]
    QDigestKernel.quantile(m.keyArray.toLongArray(), m.valueArray.toLongArray(), q, w)
  }
  override protected def withNewChildInternal(newChild: Expression): QDigestQuantile =
    copy(child = newChild)
}

object QuantileSketch {
  /** q-digest sketch of a BIGINT column over universe [0, 2^w). */
  def qdigest(c: Column, w: Int, k: Int): Column =
    GraftColumns.column(QDigest(GraftColumns.expression(c), w, k).toAggregateExpression())
  /** union of q-digest sketch rows. */
  def qdigestMerge(c: Column, w: Int, k: Int): Column =
    GraftColumns.column(QDigestMerge(GraftColumns.expression(c), w, k).toAggregateExpression())
  /** quantile estimate (rank error ≤ w·n/k) from a sketch column. */
  def qdigestQuantile(c: Column, q: Double, w: Int): Column =
    GraftColumns.column(QDigestQuantile(GraftColumns.expression(c), q, w))
}
