package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Count-Min sketch as a custom aggregate: one `depth × width` counter
  * matrix per group, updated imperatively, merged by elementwise addition.
  * Input is the row's precomputed bucket-index array (one index per sketch
  * row, derived OUTSIDE the aggregate from the pluggable hash family), so
  * the aggregate itself is hash-agnostic and the portable Md5Hash variant
  * is exactly reproducible by an external engine.
  *
  * CMS is a LINEAR sketch: the counter at (r, b) is exactly
  * `Σ count(token) over tokens with bucket_r(token) = b` — plain group-by
  * sums, which is what makes the estimate (`min_r` of the token's counters)
  * oracle-checkable bit-for-bit rather than tolerance-gated. The estimate
  * never undercounts; it overcounts by bucket collisions (≤ εN with
  * ε = e/width at the usual bounds).
  *
  * Scale shape: the classic sketch-aggregate contract — map-side partial
  * aggregation reduces every partition to one `depth·width·8`-byte buffer
  * (8 KB at 4×256), so the shuffle is one buffer per partition regardless
  * of input size; weighted inserts ride the same buffer.
  */
case class CountMinAgg(
    buckets: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]]
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  require(depth > 0 && width > 0, s"need positive depth/width, got $depth x $width")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "countmin_agg"

  override def children: Seq[Expression] = Seq(buckets)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = buckets.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var r = 0
      while (r < depth) {
        val b = arr.getLong(r)
        require(b >= 0 && b < width, s"bucket index $b out of [0, $width)")
        buffer(r * width + b.toInt) += 1L
        r += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb  = ByteBuffer.wrap(bytes)
    val out = new Array[Long](depth * width)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(buckets = newChildren.head)
}

object CountMinAgg {
  /** Column-level entry: the flattened depth×width sketch of the aggregated
    * bucket-index arrays.
    */
  def countMinAgg(buckets: Column, depth: Int, width: Int): Column =
    NativeColumn.toColumn(
      CountMinAgg(NativeColumn.toExpr(buckets), depth, width).toAggregateExpression())
}
