package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream joins — the correlation face of the
  * streaming surface ([[StreamingIngest]] covers windowed aggregation,
  * [[StreamingFpDedup]] / [[StreamingDedupIngest]] stateful dedup; this
  * covers "which click followed which impression" style event
  * correlation as the events arrive).
  *
  * Structured Streaming executes an equi-key + time-range join between
  * two streams with BOUNDED state when (a) both sides carry watermarks
  * and (b) the join condition constrains the two event times against
  * each other — the engine derives, per side, how long a row can still
  * find a match and evicts state past it. Without the range conjunct the
  * state grows forever; without the watermarks nothing can ever be
  * declared late. This helper assembles exactly that triple and nothing
  * else, so callers cannot accidentally build the unbounded variant.
  *
  * The SAME call works on batch frames (watermarks are no-ops there), so
  * a batch backfill and the live stream share one code path — and the
  * batch face is what the replay-equality spec pins.
  */
object StreamJoins {

  /** Pairs of (left row, right row) with equal `keyCol` where the right
    * event time falls in `[leftTs, leftTs + window]` — "right follows
    * left within the window" (impression → click, view → purchase).
    * Column names of the two sides must be disjoint apart from `keyCol`
    * (the usual two-table contract); `window` and `watermark` are SQL
    * interval strings (e.g. "1 hour", "30 minutes").
    */
  def follows(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTs: String,
      rightTs: String,
      window: String,
      watermark: String
  ): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r, l(keyCol) === r(keyCol) &&
      col(rightTs) >= col(leftTs) &&
      col(rightTs) <= col(leftTs) + expr(s"interval $window"))
      .drop(r(keyCol))
  }
}
