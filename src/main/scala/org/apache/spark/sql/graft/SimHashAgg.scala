package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/** SimHash as a custom aggregate: accumulates the 64 per-bit majority votes
  * of the input token hashes in one mutable buffer and emits the 64-bit
  * signature.
  *
  * Why a TypedImperativeAggregate: the pure-Column formulation needs 64
  * separate conditional `sum()` aggregates plus a 64-term reassembly
  * expression — a very wide codegen surface (measured multi-second compile
  * at sf0.1) and 64 aggregation buffers per group. This operator keeps one
  * `Array[Int](64)` buffer per group, updates it imperatively, and merges
  * partial buffers — the classic sketch-aggregate shape
  * (map-side partial aggregation works as usual, so the shuffle carries one
  * 256-byte buffer per group instead of 64 longs).
  *
  * Bit semantics match [[graft.ops.Dedup.simhash]] exactly: vote +1 when
  * bit i of the token hash is set, −1 otherwise; signature bit i set iff
  * the vote is strictly positive. Null inputs are ignored.
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Int]]
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash_agg"

  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buffer: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) buffer(i) += 1 else buffer(i) -= 1
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Int], other: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Int]): Any = {
    var sig = 0L
    var i = 0
    while (i < 64) { if (buffer(i) > 0) sig |= (1L << i); i += 1 }
    sig
  }

  override def serialize(buffer: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 4)
    buffer.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb  = ByteBuffer.wrap(bytes)
    val out = new Array[Int](64)
    var i = 0
    while (i < 64) { out(i) = bb.getInt(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren.head)
}

object SimHashAgg {
  /** Column-level entry: simhash of the aggregated token-hash column. */
  def simhashAgg(tokenHash: Column): Column =
    NativeColumn.toColumn(
      SimHashAgg(NativeColumn.toExpr(tokenHash)).toAggregateExpression())
}
