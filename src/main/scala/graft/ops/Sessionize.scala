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

  /** Session-relative FEATURE columns for sequence-model training — the
    * standard per-event engineering a behavioral model consumes: the
    * event's 1-based ordinal inside its session, time since session
    * start, the session's event count, and an is-last flag (the
    * next-event-prediction label mask). Input is [[byGap]]'s output (the
    * frame must carry `session_seq`); ties inside a session break on
    * `idCol`.
    *
    * All four columns ride windows PARTITIONED by `(user, session_seq)`
    * sharing one sort — a single per-user shuffle that reuses [[byGap]]'s
    * partitioning, nothing global.
    */
  def sessionFeatures(
      sessionized: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      idCol: String = "event_id"
  ): DataFrame = {
    val w = Window.partitionBy(col(userCol), col("session_seq"))
      .orderBy(col(tsCol), col(idCol))
    val wAll = Window.partitionBy(col(userCol), col("session_seq"))
    sessionized
      .withColumn("event_index", row_number().over(w))
      .withColumn("dt_since_start", col(tsCol) - min(col(tsCol)).over(wAll))
      .withColumn("session_events", count(lit(1)).over(wAll))
      .withColumn("is_last", col("event_index") === col("session_events"))
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
