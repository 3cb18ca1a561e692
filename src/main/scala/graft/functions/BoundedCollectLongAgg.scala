package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Exact row count plus a BOUNDED sorted collection of long values in
  * one aggregate: `struct(n: long, ids: array<long>)`, where `n`
  * counts every input row (null child included — the df accounting)
  * and `ids` holds at most `bound` non-null child values, sorted
  * ascending at eval.
  *
  * Built for [[graft.ml.Dedup.containmentPairs]]' inverted index: a
  * gram's posting list is only ever USED when its document frequency
  * is ≤ maxDf (boilerplate grams are dropped by the `n` filter), so
  * collecting past the bound is pure waste — and an UNBOUNDED
  * `collect_list` would buffer the full posting list of every hot
  * gram (stopword shingles at web scale put 10⁸+ ids in one
  * aggregation buffer, the classic collect-skew OOM). The bound makes
  * every buffer O(maxDf) by construction while staying EXACT for
  * every gram that survives the df filter: a list is truncated only
  * when `n` has already disqualified the gram. The buffer grows
  * geometrically from 8 slots, so the Zipf-tail df-1 grams (most of
  * the vocabulary) pay 64 bytes, not `bound`.
  */
case class BoundedCollectLongAgg(child: Expression, bound: Int,
                                 mutableAggBufferOffset: Int = 0,
                                 inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BoundedCollectLongAgg.Buf]
    with UnaryLike[Expression] {
  require(bound >= 1, s"bound must be >= 1, got $bound")

  import BoundedCollectLongAgg.Buf

  override def createAggregationBuffer(): Buf = new Buf(0L, 0, null)

  override def update(buf: Buf, input: InternalRow): Buf = {
    buf.n += 1
    val v = child.eval(input)
    if (v != null && buf.size < bound) {
      buf.reserve(buf.size + 1, bound)
      buf.ids(buf.size) = v.asInstanceOf[Long]
      buf.size += 1
    }
    buf
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    b1.n += b2.n
    val take = math.min(b2.size, bound - b1.size)
    if (take > 0) {
      b1.reserve(b1.size + take, bound)
      System.arraycopy(b2.ids, 0, b1.ids, b1.size, take)
      b1.size += take
    }
    b1
  }

  override def eval(buf: Buf): Any = {
    val out = new Array[Long](buf.size)
    if (buf.size > 0) System.arraycopy(buf.ids, 0, out, 0, buf.size)
    java.util.Arrays.sort(out)
    new GenericInternalRow(Array[Any](buf.n, new GenericArrayData(out)))
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + buf.size * 8)
    bb.putLong(buf.n).putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getLong()
    val size = bb.getInt()
    val ids = new Array[Long](size)
    var i = 0
    while (i < size) { ids(i) = bb.getLong(); i += 1 }
    new Buf(n, size, ids)
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("ids", ArrayType(LongType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectLongAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectLongAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedCollectLongAgg =
    copy(child = newChild)
}

object BoundedCollectLongAgg {
  /** Mutable aggregation state: exact count + capped value store. */
  final class Buf(var n: Long, var size: Int, var ids: Array[Long]) {
    /** Ensure capacity for `need` slots, growing geometrically from 8
      * and never past `bound`.
      */
    def reserve(need: Int, bound: Int): Unit = {
      if (ids == null) ids = new Array[Long](math.min(math.max(8, need), bound))
      else if (ids.length < need) {
        val cap = math.min(math.max(ids.length * 2, need), bound)
        val bigger = new Array[Long](cap)
        System.arraycopy(ids, 0, bigger, 0, size)
        ids = bigger
      }
    }
  }
}
