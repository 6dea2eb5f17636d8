package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.GraftColumns
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Count-min sketch (Cormode & Muthukrishnan '05) over BIGINT keys as a
  * native mergeable aggregate: d independent hash rows × w counters,
  * est(key) = min over rows — NEVER an underestimate (the deterministic
  * CMS guarantee: every row counts the key fully, collisions only add),
  * and over-estimates are bounded by ~e·n/w per row w.h.p. Merging is
  * element-wise addition, so per-slice sketch ROWS combine into corpus
  * frequencies without rescanning source data — the shape that answers
  * "how often does key X appear in 100 TB" from kilobytes of state.
  *
  * Fully deterministic: hashes are Murmur3_x86_32 with row-index seeds;
  * same data → same sketch bits, so specs and oracles replay exactly.
  * Emitted as array<bigint> of length d·w (row-major).
  *
  * Cost model: the buffer is DENSE (d·w longs, ~64 KB at 4×2048)
  * regardless of how few rows a group saw, and map-side partial
  * aggregation keeps one buffer per (task × group). Build sketch rows
  * over coarse slices (days, shards — tens to hundreds of groups), not
  * fine keys; for per-key frequencies, the sketch IS the index — probe
  * it, don't group by key.
  */
object CmsKernel {
  def bucket(key: Long, row: Int, w: Int): Int = {
    val h = Murmur3_x86_32.hashLong(key, 0x9747b28c + row * 0x5bd1e995)
    java.lang.Math.floorMod(h, w)
  }

  def estimate(counters: Array[Long], key: Long, d: Int, w: Int): Long = {
    var min = Long.MaxValue
    var r = 0
    while (r < d) {
      val c = counters(r * w + bucket(key, r, w))
      if (c < min) min = c
      r += 1
    }
    min
  }

  def serialize(arr: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(arr.length)
    var i = 0
    while (i < arr.length) { out.writeLong(arr(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val arr = new Array[Long](n)
    var i = 0
    while (i < n) { arr(i) = in.readLong(); i += 1 }
    arr
  }
}

/** `cms(longCol, d, w)` → array<bigint> count-min sketch. */
case class Cms(
    child: Expression,
    d: Int,
    w: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(d >= 1 && w >= 2, "cms needs d >= 1 rows and w >= 2 counters")

  override def prettyName: String = "graft_cms"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val key = v.asInstanceOf[Number].longValue()
    var r = 0
    while (r < d) { buf(r * w + CmsKernel.bucket(key, r, w)) += 1L; r += 1 }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = CmsKernel.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = CmsKernel.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): Cms =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): Cms =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Cms =
    copy(child = newChild)
}

/** `cms_merge(arrayCol)` → element-wise sum of sketch rows. */
case class CmsMerge(
    child: Expression,
    d: Int,
    w: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def prettyName: String = "graft_cms_merge"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData].toLongArray()
    require(arr.length == buf.length, s"cms_merge: sketch size ${arr.length} != ${buf.length}")
    var i = 0
    while (i < buf.length) { buf(i) += arr(i); i += 1 }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = CmsKernel.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = CmsKernel.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsMerge =
    copy(child = newChild)
}

/** `cms_estimate(sketch, key)` → BIGINT frequency upper estimate (min
  * over rows; ≥ true count, always). Probe side runs on key-list-sized
  * frames, so CodegenFallback is free. */
case class CmsEstimate(left: Expression, right: Expression, d: Int, w: Int)
  extends BinaryExpression with BinaryLike[Expression] with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_estimate"
  override def nullSafeEval(sketch: Any, key: Any): Any =
    CmsKernel.estimate(sketch.asInstanceOf[ArrayData].toLongArray(),
      key.asInstanceOf[Number].longValue(), d, w)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

/** `cms_inner_product(sketchA, sketchB)` → BIGINT estimate of the
  * equi-join cardinality |A ⋈ B| = Σ_key freqA(key)·freqB(key), taken
  * as min over rows of the per-row counter dot product (Cormode &
  * Muthukrishnan §4.2). NEVER an underestimate (collisions only add
  * cross terms); expected overshoot ≤ n_A·n_B/w per row. This is the
  * planner-statistics primitive: join sizes for any pair of 100 TB
  * tables from kilobyte sketch rows, no scan of either side. */
case class CmsInnerProduct(left: Expression, right: Expression, d: Int, w: Int)
  extends BinaryExpression with BinaryLike[Expression] with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_inner_product"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toLongArray()
    val y = b.asInstanceOf[ArrayData].toLongArray()
    require(x.length == d * w && y.length == d * w, "sketch shape mismatch")
    var min = Long.MaxValue
    var r = 0
    while (r < d) {
      var dot = 0L
      var c = 0
      while (c < w) { dot += x(r * w + c) * y(r * w + c); c += 1 }
      if (dot < min) min = dot
      r += 1
    }
    min
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsInnerProduct =
    copy(left = newLeft, right = newRight)
}

object CountMinSketch {
  def cms(c: Column, d: Int, w: Int): Column =
    GraftColumns.column(Cms(GraftColumns.expression(c), d, w).toAggregateExpression())
  def cmsMerge(c: Column, d: Int, w: Int): Column =
    GraftColumns.column(CmsMerge(GraftColumns.expression(c), d, w).toAggregateExpression())
  def cmsEstimate(sketch: Column, key: Column, d: Int, w: Int): Column =
    GraftColumns.column(CmsEstimate(
      GraftColumns.expression(sketch), GraftColumns.expression(key), d, w))
  def cmsInnerProduct(a: Column, b: Column, d: Int, w: Int): Column =
    GraftColumns.column(CmsInnerProduct(
      GraftColumns.expression(a), GraftColumns.expression(b), d, w))
}
