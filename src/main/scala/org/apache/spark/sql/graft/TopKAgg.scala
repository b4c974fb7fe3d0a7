package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k state for [[TopKAgg]]: a binary min-heap of (score, id)
  * pairs whose ROOT is the weakest element kept — an insert against a full
  * heap either replaces the root (when stronger) or is dropped, so the
  * state can never exceed k entries. "Stronger" = higher score, ties to
  * the SMALLER id (the deterministic orientation every ranked operator
  * here uses).
  */
final class TopKBuffer(val k: Int) {
  var n: Int = 0
  val scores = new Array[Double](k)
  val ids    = new Array[Long](k)

  // true iff (s1, id1) is weaker than (s2, id2) in keep-order
  private def weaker(s1: Double, id1: Long, s2: Double, id2: Long): Boolean =
    s1 < s2 || (s1 == s2 && id1 > id2)

  private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0 && weaker(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
      swap(i, (i - 1) / 2); i = (i - 1) / 2
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    var done = false
    while (!done) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var weakest = i
      if (l < n && weaker(scores(l), ids(l), scores(weakest), ids(weakest))) weakest = l
      if (r < n && weaker(scores(r), ids(r), scores(weakest), ids(weakest))) weakest = r
      if (weakest == i) done = true else { swap(i, weakest); i = weakest }
    }
  }

  def insert(s: Double, id: Long): Unit =
    if (n < k) { scores(n) = s; ids(n) = id; n += 1; siftUp(n - 1) }
    else if (weaker(scores(0), ids(0), s, id)) { scores(0) = s; ids(0) = id; siftDown() }

  /** Entries strongest-first: (score desc, id asc). */
  def sortedDesc: Array[(Double, Long)] =
    (0 until n).map(i => (scores(i), ids(i))).toArray
      .sortBy { case (s, id) => (-s, id) }
}

/** Partial top-k as a custom aggregate: per group, keep the k highest
  * (score, id) pairs — ties to the smaller id — and emit them strongest-
  * first as `array<struct<score double, neighbor_id bigint>>`.
  *
  * Why a TypedImperativeAggregate: the window formulation
  * (`row_number() over (partition by g order by score desc) <= k`)
  * shuffles EVERY scored row to the group's reducer before discarding all
  * but k — for a batch k-NN join that is |corpus| × |queries| rows through
  * the exchange. This aggregate's partial phase runs map-side, so each map
  * partition contributes at most one k-entry heap per group to the
  * shuffle: the exchange carries O(partitions × groups × k) bounded
  * buffers instead of the full scored cross product. The classic bounded
  * sketch-aggregate shape ([[SimHashAgg]]); merge is a heap-into-heap
  * fold, eval a final sort of ≤ k entries.
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[TopKBuffer]
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  require(k > 0, s"k must be positive, got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, LongType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("neighbor_id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_agg"

  override def children: Seq[Expression] = Seq(score, id)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) buffer.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.n) { buffer.insert(other.scores(i), other.ids(i)); i += 1 }
    buffer
  }

  override def eval(buffer: TopKBuffer): Any =
    new GenericArrayData(buffer.sortedDesc.map { case (s, id) =>
      InternalRow(s, id)
    }.asInstanceOf[Array[Any]])

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.n * 16)
    bb.putInt(buffer.n)
    var i = 0
    while (i < buffer.n) { bb.putDouble(buffer.scores(i)); bb.putLong(buffer.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb  = ByteBuffer.wrap(bytes)
    val n   = bb.getInt()
    val out = new TopKBuffer(k)
    var i = 0
    while (i < n) { out.insert(bb.getDouble(), bb.getLong()); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKAgg {
  /** Column-level entry: the k strongest (score, id) pairs of the group,
    * strongest-first, ties to the smaller id.
    */
  def topKAgg(score: Column, id: Column, k: Int): Column =
    NativeColumn.toColumn(
      TopKAgg(NativeColumn.toExpr(score), NativeColumn.toExpr(id), k).toAggregateExpression())
}
