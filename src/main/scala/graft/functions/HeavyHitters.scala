package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Misra-Gries heavy-hitters sketch as a native
  * `TypedImperativeAggregate` — bounded-memory frequent-items summary
  * (SURVEY.md §7.6's "streaming-friendly term-frequency sketch").
  *
  * Why it exists: the exact `explode → groupBy(term) → count` plan's
  * aggregation state is the FULL vocabulary (billions of keys at 100 TB).
  * Misra-Gries keeps at most `k` counters per partial aggregate, is
  * map-side combinable (mergeable summaries: merge = counter sum + reduce
  * back to k by subtracting the (k+1)-largest count), and guarantees every
  * term with true frequency > n/k survives with estimate error ≤ n/k.
  * The sketch output is a candidate SUPERSET of the true heavy hitters —
  * pair it with an exact recount of the candidates (two cheap passes, the
  * classic scale recipe, q57) for exact results with bounded memory.
  *
  * The per-row update is the canonical MG step: increment an existing
  * counter, insert while < k counters are held, otherwise decrement all
  * counters (amortized O(1), occasional O(k) sweep dropping zeros).
  */
case class MisraGries(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  require(k > 0, s"k must be positive, got $k")

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String], 1L)
    buf
  }

  private def add(buf: mutable.HashMap[UTF8String, Long],
      term: UTF8String, c: Long): Unit = {
    buf.get(term) match {
      case Some(cur) => buf.update(term, cur + c)
      case None if buf.size < k => buf.update(term.clone(), c)
      case None =>
        // Decrement-all by c (clipped): the MG "pay one token from every
        // counter" step, batched for weighted adds.
        val dead = mutable.ArrayBuffer.empty[UTF8String]
        buf.mapValuesInPlace((_, cnt) => cnt - c)
        buf.foreach { case (t, cnt) => if (cnt <= 0) dead += t }
        dead.foreach(buf.remove)
    }
  }

  override def merge(buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long])
      : mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (t, c) =>
      buf.update(t, buf.getOrElse(t, 0L) + c)
    }
    if (buf.size > k) {
      // Reduce back to k counters: subtract the (k+1)-largest count from
      // all (the mergeable-summaries reduction; keeps the ≤ n/k error).
      val cut = buf.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      buf.mapValuesInPlace((_, cnt) => cnt - cut)
      buf.foreach { case (t, cnt) => if (cnt <= 0) dead += t }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val entries = buf.toArray.sortBy { case (t, c) => (-c, t.toString) }
    new GenericArrayData(entries.map { case (t, c) =>
      InternalRow(t, c)
    })
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long])
      : Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val bytes = t.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = MisraGries.resultType
  override def prettyName: String = "misra_gries"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)
}

object MisraGries {
  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)

  /** Column-level helper: `misra_gries(termCol, k)` aggregate. */
  def apply(c: Column, k: Int): Column =
    GraftBridge.column(
      MisraGries(GraftBridge.expression(c), k).toAggregateExpression())
}
