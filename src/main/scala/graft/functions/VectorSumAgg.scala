package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Elementwise vector-sum aggregate: `array<double>` rows fold into one
  * `dim`-length sum array. Replaces the per-dimension `sum(v[i])` column
  * fan-out in `Similarity.trainCentroids`/`pqTrain`, whose aggregate
  * carried `dim` separate expressions — plan size grew linearly with
  * embedding width (fine at 64, a thousand-expression plan at 1024+).
  * One aggregate expression makes plan width constant in dim while the
  * data path stays identical: partial buffers combine map-side, and the
  * additions run per dimension in row order, exactly the order the
  * per-dimension `sum()` columns applied (bit-gated in
  * CentroidTrainSpec).
  *
  * Rows shorter than `dim` contribute their prefix, null/malformed rows
  * contribute nothing — callers (the trainers) already filter those;
  * the guard here keeps a stray row from NPEing the executor.
  */
case class VectorSumAgg(child: Expression, dim: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]]
    with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Double] = new Array[Double](dim)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(dim, arr.numElements())
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) buf(i) += arr.getDouble(i)
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    var i = 0
    while (i < dim) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(dim * 8)
    var i = 0
    while (i < dim) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Double](dim)
    var i = 0
    while (i < dim) { buf(i) = bb.getDouble(); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorSumAgg =
    copy(child = newChild)
}

/** Outer-product-sum aggregate: `array<double>` rows fold into one
  * row-major `dim × dim` array `Σ v·vᵀ` — the Gram accumulator of
  * covariance/PCA. One aggregate expression, dim² doubles per buffer,
  * partial buffers combine map-side: the covariance of a 100 TB corpus
  * reaches the driver as a single dim²-double row, the same
  * constant-plan-width shape as [[VectorSumAgg]].
  *
  * Unlike the sum aggregate, a PARTIAL row would corrupt the pairing
  * between entries, so rows that are null, shorter than `dim`, or carry
  * null elements contribute NOTHING (the callers filter those; the
  * guard keeps a stray row from skewing the matrix silently).
  */
case class OuterProductSumAgg(child: Expression, dim: Int,
                              mutableAggBufferOffset: Int = 0,
                              inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]]
    with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Double] =
    new Array[Double](dim * dim)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() >= dim) {
        var i = 0
        while (i < dim) {
          if (arr.isNullAt(i)) return buf
          i += 1
        }
        i = 0
        while (i < dim) {
          val x = arr.getDouble(i)
          var j = 0
          while (j < dim) {
            buf(i * dim + j) += x * arr.getDouble(j)
            j += 1
          }
          i += 1
        }
      }
    }
    buf
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    var i = 0
    while (i < dim * dim) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(dim * dim * 8)
    var i = 0
    while (i < dim * dim) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Double](dim * dim)
    var i = 0
    while (i < dim * dim) { buf(i) = bb.getDouble(); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): OuterProductSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): OuterProductSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): OuterProductSumAgg =
    copy(child = newChild)
}
