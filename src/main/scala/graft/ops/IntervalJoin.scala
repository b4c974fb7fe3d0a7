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

  /** Interval-OVERLAP join: pair each left interval with the right
    * intervals of the same key that overlap it (inclusive ends) — session
    * co-occurrence, exposure windows, schedule conflicts. Same bucket
    * discipline as [[pointInInterval]], plus the exactly-once trick an
    * interval×interval join needs: a pair can share MANY buckets, so each
    * pair is claimed only in the bucket of `max(start_l, start_r)` (the
    * first bucket where both are live — always a shared bucket for an
    * overlapping pair). A residual filter, not a dedup shuffle.
    *
    * Caller contract: the four bound columns are distinct names and the
    * frames share only `keyCols` (as in the other two-table joins).
    * Cost: one hash shuffle of both sides' bucket postings
    * (Σ ceil(span/bucketWidth) each) — never the per-key cross product a
    * `lStart <= rEnd AND rStart <= lEnd` theta join would nested-loop.
    */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftStart: String,
      leftEnd: String,
      rightStart: String,
      rightEnd: String,
      bucketWidth: Long
  ): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    def explodeBuckets(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn("_bucket",
        explode(sequence(floor(col(s) / bucketWidth), floor(col(e) / bucketWidth))))
    explodeBuckets(left, leftStart, leftEnd)
      .join(explodeBuckets(right, rightStart, rightEnd), keyCols :+ "_bucket")
      .where(col(leftStart) <= col(rightEnd) && col(rightStart) <= col(leftEnd))
      .where(col("_bucket") === floor(greatest(col(leftStart), col(rightStart)) / bucketWidth))
      .drop("_bucket")
  }
}
