package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** [[SampleK]] with DISTINCT-on-insert semantics: the k smallest
  * DISTINCT `(hash, id)` pairs per group, duplicates collapsing inside
  * the bounded buffer instead of in a separate `.distinct()` exchange.
  *
  * Why it exists: the shape `stream.distinct().groupBy(key).agg(...)`
  * shuffles the full stream twice — once on (key, value) for the
  * distinct, once on key for the aggregate. When the aggregate's state
  * is bounded anyway (a k-sample, a doc-frequency probe), folding the
  * dedup INTO the aggregate halves the exchanges: one map-side-combined
  * pass, k+epsilon state per key. q97's per-gram carrier probe is the
  * canonical use: with k = maxDf + 1, a full buffer proves df > maxDf
  * (drop the gram), and a non-full buffer IS the exact distinct carrier
  * set (size = exact df), so one aggregate answers both questions the
  * r8 plan paid a distinct + a window for.
  *
  * State is a TreeSet (log k insert, max eviction, natural dedup) of at
  * most k pairs; partials merge associatively. Deterministic for any
  * partitioning — the result is a pure function of the input SET.
  */
case class SampleKDistinct(
    hash: Expression,
    id: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[(UTF8String, Long)]]
  with ImplicitCastInputTypes {

  require(k > 0, s"k must be positive, got $k")

  private implicit val ord: Ordering[(UTF8String, Long)] =
    Ordering.fromLessThan { (x, y) =>
      val c = x._1.compareTo(y._1)
      if (c != 0) c < 0 else x._2 < y._2
    }

  override def createAggregationBuffer(): mutable.TreeSet[(UTF8String, Long)] =
    mutable.TreeSet.empty

  private def add(buf: mutable.TreeSet[(UTF8String, Long)],
      h: UTF8String, i: Long): Unit = {
    val pair = (h.clone(), i)
    if (buf.size < k) {
      buf += pair // TreeSet ignores an exact duplicate
    } else if (ord.lt(pair, buf.last) && !buf.contains(pair)) {
      buf -= buf.last
      buf += pair
    }
  }

  override def update(buf: mutable.TreeSet[(UTF8String, Long)],
      input: InternalRow): mutable.TreeSet[(UTF8String, Long)] = {
    val h = hash.eval(input)
    val i = id.eval(input)
    if (h != null && i != null)
      add(buf, h.asInstanceOf[UTF8String], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: mutable.TreeSet[(UTF8String, Long)],
      other: mutable.TreeSet[(UTF8String, Long)])
      : mutable.TreeSet[(UTF8String, Long)] = {
    other.foreach { case (h, i) => add(buf, h, i) }
    buf
  }

  override def eval(buf: mutable.TreeSet[(UTF8String, Long)]): Any =
    new GenericArrayData(
      buf.toArray.map { case (h, i) => InternalRow(h, i) })

  override def serialize(buf: mutable.TreeSet[(UTF8String, Long)])
      : Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (h, i) =>
      val bytes = h.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(i)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.TreeSet[(UTF8String, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf += ((UTF8String.fromBytes(b), in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SampleKDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SampleKDistinct =
    copy(inputAggBufferOffset = newOffset)

  override def children: Seq[Expression] = Seq(hash, id)
  override def nullable: Boolean = false
  override def dataType: DataType = SampleK.resultType
  override def inputTypes = GraftBridge.inputTypes(StringType, LongType)
  override def prettyName: String = "sample_k_distinct"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SampleKDistinct =
    copy(hash = newChildren(0), id = newChildren(1))
}

object SampleKDistinct {
  /** Column-level helper: `sample_k_distinct(hashCol, idCol, k)`. */
  def apply(hash: Column, id: Column, k: Int): Column =
    GraftBridge.column(
      SampleKDistinct(GraftBridge.expression(hash),
        GraftBridge.expression(id), k).toAggregateExpression())
}
