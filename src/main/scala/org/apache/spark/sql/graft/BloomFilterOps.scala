package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.types.BinaryType

/** Semi-join runtime filtering made explicit: build a bloom filter over a
  * small key set and apply it map-side to a huge probe side — the pattern
  * Spark's own `InjectRuntimeFilter` rule applies automatically to shuffle
  * joins, exposed here as a library primitive so operators can prune a
  * 100-TB side *before* its shuffle with a filter derived from a small
  * batch (e.g. today's crawl vs the accumulated corpus).
  *
  * Uses Spark's internal [[BloomFilterAggregate]] (distributed build —
  * map-side partial filters OR-merged, no driver-side item collection) and
  * the codegen'd [[BloomFilterMightContain]] predicate, both keyed on
  * xxhash64 of the key columns exactly like the built-in runtime filters.
  *
  * Guarantee: `mightContain` has NO false negatives — filtering a probe side
  * with it before an (anti/semi/inner) join on the same keys never changes
  * the join result, only the bytes shuffled. False positives (rate set by
  * `numBits` vs distinct items) cost only wasted probe rows.
  */
object BloomFilterOps {

  /** Aggregates the key columns of `df` into a serialized bloom filter.
    * One distributed aggregation; the result is `numBits/8` bytes (1 MiB at
    * the default) — broadcast-sized, not data-sized. Returns None when `df`
    * is empty (the aggregate yields null).
    */
  def build(
      df: DataFrame,
      keys: Seq[Column],
      expectedItems: Long = 1000000L,
      numBits: Long = 8388608L
  ): Option[Array[Byte]] = {
    val agg = new BloomFilterAggregate(
      NativeColumn.toExpr(xxhash64(keys: _*)), Literal(expectedItems), Literal(numBits))
    Option(df.select(NativeColumn.toColumn(agg.toAggregateExpression())).head.get(0))
      .map(_.asInstanceOf[Array[Byte]])
  }

  /** Membership predicate against serialized filter bytes: false ⇒ the key
    * set definitely did not contain these keys; true ⇒ probably did. The
    * bytes ride into the plan as a literal (shipped once per task with the
    * serialized plan, deserialized lazily once per task, like Spark's own
    * runtime-filter subquery results).
    */
  def mightContain(bloom: Array[Byte], keys: Seq[Column]): Column =
    NativeColumn.toColumn(new BloomFilterMightContain(
      Literal.create(bloom, BinaryType), NativeColumn.toExpr(xxhash64(keys: _*))))
}
