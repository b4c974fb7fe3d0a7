package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization: assigns a session id per (user, gap-bounded burst
  * of events) — the standard segmentation step of event-stream training
  * pipelines (beyond-reference surface, same family as q14/q15).
  *
  * Implementation is two stacked window functions over one shuffle on the
  * user key: `lag` marks gap starts, a running `sum` turns marks into
  * per-user session ordinals. No joins, no state — scales as a single
  * hash-partitioned sort (the Exchange on `userCol` is reused by both
  * windows since they share partitioning and ordering).
  */
object Sessionize {

  /** Adds `session_seq` (0-based per-user ordinal) and a globally unique
    * `session_id` string `<user>#<seq>`.
    *
    * @param gap maximum intra-session gap, in the same unit as `tsCol`
    *            (nano-epoch longs in this engine's events table)
    */
  def byGap(
      df: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      gap: Long
  ): DataFrame = {
    val w       = Window.partitionBy(userCol).orderBy(tsCol)
    val prev    = lag(col(tsCol), 1).over(w)
    val isStart = when(prev.isNull || col(tsCol) - prev > gap, 1).otherwise(0)
    df.withColumn("_start", isStart)
      .withColumn("session_seq", sum(col("_start")).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1)
      .drop("_start")
      .withColumn("session_id", concat(col(userCol).cast("string"), lit("#"), col("session_seq").cast("string")))
  }

  /** Per-session aggregate: bounds, event count, value sum. */
  def sessionStats(
      sessionized: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      valueCol: Column = col("value")
  ): DataFrame =
    sessionized
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(valueCol), 4).as("sum_value"))
}
