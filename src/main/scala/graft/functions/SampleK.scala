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

/** Exact seeded k-sample per group as a native
  * `TypedImperativeAggregate`: keeps the k smallest `(hash, id)` pairs —
  * equivalently, the first k rows of the group under the deterministic
  * md5 shuffle order (q81's convention).
  *
  * Why it exists: the textbook per-stratum sample is
  * `row_number() OVER (PARTITION BY stratum ORDER BY md5(id)) <= k` —
  * a full SORT of every stratum, shuffling the whole corpus to rank
  * rows of which only k per stratum survive. This aggregate is the
  * bounded-state alternative: each partial holds at most k pairs (a
  * max-heap, evict-largest), partials merge associatively, so the
  * corpus crosses ONE map-side-combinable aggregate and only
  * `k × strata` pairs ever ship. Same recipe as [[MisraGries]] (q57)
  * but for sampling instead of frequency.
  *
  * Determinism: md5 keys are distinct in practice; the id breaks the
  * (never-observed) tie so the result is a pure function of the input
  * set either way. The DuckDB oracle replays the ROW_NUMBER form —
  * both compute "k smallest hashes per stratum" exactly.
  */
case class SampleK(
    hash: Expression,
    id: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(UTF8String, Long)]]
  with ImplicitCastInputTypes {

  require(k > 0, s"k must be positive, got $k")

  // Natural ascending ordering: the queue's head is the LARGEST kept
  // pair, i.e. the eviction candidate.
  private implicit val ord: Ordering[(UTF8String, Long)] =
    Ordering.fromLessThan { (x, y) =>
      val c = x._1.compareTo(y._1)
      if (c != 0) c < 0 else x._2 < y._2
    }

  override def createAggregationBuffer()
      : mutable.PriorityQueue[(UTF8String, Long)] =
    mutable.PriorityQueue.empty

  private def add(buf: mutable.PriorityQueue[(UTF8String, Long)],
      h: UTF8String, i: Long): Unit = {
    if (buf.size < k) {
      buf.enqueue((h.clone(), i))
    } else if (ord.lt((h, i), buf.head)) {
      buf.dequeue()
      buf.enqueue((h.clone(), i))
    }
  }

  override def update(buf: mutable.PriorityQueue[(UTF8String, Long)],
      input: InternalRow): mutable.PriorityQueue[(UTF8String, Long)] = {
    val h = hash.eval(input)
    val i = id.eval(input)
    if (h != null && i != null)
      add(buf, h.asInstanceOf[UTF8String], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(UTF8String, Long)],
      other: mutable.PriorityQueue[(UTF8String, Long)])
      : mutable.PriorityQueue[(UTF8String, Long)] = {
    other.foreach { case (h, i) => add(buf, h, i) }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(UTF8String, Long)]): Any = {
    val entries = buf.toArray.sorted(ord)
    new GenericArrayData(entries.map { case (h, i) => InternalRow(h, i) })
  }

  override def serialize(buf: mutable.PriorityQueue[(UTF8String, Long)])
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
      : mutable.PriorityQueue[(UTF8String, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.enqueue((UTF8String.fromBytes(b), in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SampleK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SampleK =
    copy(inputAggBufferOffset = newOffset)

  override def children: Seq[Expression] = Seq(hash, id)
  override def nullable: Boolean = false
  override def dataType: DataType = SampleK.resultType
  // Declared input types so a mismatched call site (e.g. an INT id)
  // coerces or fails at analysis time instead of ClassCastException
  // inside update().
  override def inputTypes = GraftBridge.inputTypes(StringType, LongType)
  override def prettyName: String = "sample_k"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SampleK =
    copy(hash = newChildren(0), id = newChildren(1))
}

object SampleK {
  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  /** Column-level helper: `sample_k(hashCol, idCol, k)` aggregate. */
  def apply(hash: Column, id: Column, k: Int): Column =
    GraftBridge.column(
      SampleK(GraftBridge.expression(hash), GraftBridge.expression(id), k)
        .toAggregateExpression())
}
