package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval join: pair each left row (a point in time) with the
  * right rows (intervals) of the same key that contain it.
  *
  * The naive encoding — `join(points, start <= t && t <= end)` — has no
  * equi-conjunct beyond the key, so Spark plans a per-key nested loop that
  * goes quadratic on hot keys. This implementation bucketizes time:
  *
  *   - each interval explodes to one row per `bucketWidth`-sized bucket it
  *     overlaps (codegen `explode(sequence(...))` — the minhash-postings
  *     shape);
  *   - each point maps to exactly ONE bucket, so the join is an equi-join
  *     on (key, bucket) with the `between` predicate as a residual filter —
  *     and no pair dedup is needed: a (point, interval) pair can only meet
  *     in the point's bucket.
  *
  * Cost: one hash shuffle of |points| + |interval postings| where postings
  * = Σ ceil(span/bucketWidth) — linear for any bucketWidth of the order of
  * the typical span. Too-small widths inflate postings, too-large widths
  * inflate residual-filter fanout; either way correctness is unaffected
  * (spec-asserted vs brute force), so the knob is purely a perf trade.
  */
object IntervalJoin {

  /** @param points     left frame carrying `tsCol`
    * @param intervals  right frame carrying `startCol`/`endCol` (inclusive)
    * @param keyCols    equi-key columns present in both frames
    * @param bucketWidth time-bucket size in the (integral) time unit of the
    *                    three time columns
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long
  ): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val p = points.withColumn("_bucket", floor(col(tsCol) / bucketWidth))
    val i = intervals.withColumn(
      "_bucket",
      explode(sequence(floor(col(startCol) / bucketWidth), floor(col(endCol) / bucketWidth))))
    p.join(i, keyCols :+ "_bucket")
      .where(col(tsCol).between(col(startCol), col(endCol)))
      .drop("_bucket")
  }
}
