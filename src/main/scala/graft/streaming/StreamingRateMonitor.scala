package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.ops.EventAnalytics

/** Incremental rate-anomaly monitoring over an event stream — the
  * streaming face of [[EventAnalytics.anomalies]].
  *
  * The batch operator's insight is that the z-score needs only the
  * per-`(series, bucket)` COUNTS, and counts are mergeable sums. So the
  * monitor maintains exactly that table per micro-batch (each batch's
  * contribution written to its own `ingest_batch=<id>` partition —
  * dynamic-partition overwrite makes a replayed batch rewrite itself, not
  * double-count, the [[StreamingDedupIngest]] recovery contract), and the
  * read face merges |series|×|buckets| partial rows and re-runs only the
  * z window. Events are never rescanned; the monitor's serving query is
  * O(buckets), not O(events) — at 100 TB of history the dashboard reads a
  * few thousand count rows.
  *
  * A bucket whose events straddle micro-batches is naturally handled: its
  * partial counts sit in several `ingest_batch` partitions and the read
  * face sums them.
  */
case class StreamingRateMonitor(
    spark: SparkSession,
    countsPath: String,
    bucketTs: Long,
    seriesCol: String = "event_type",
    tsCol: String = "ts") {

  require(bucketTs > 0, s"bucketTs must be positive, got $bucketTs")

  /** Adds one micro-batch's bucket counts under its own batch partition
    * (replay-idempotent: a restarted batch overwrites its prior attempt).
    */
  def ingestBatch(batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return
    batch
      .groupBy(col(seriesCol), expr(s"`$tsCol` div $bucketTs").as("bucket"))
      .agg(count(lit(1)).as("n"))
      .withColumn("ingest_batch", lit(batchId))
      .write
      .partitionBy("ingest_batch")
      .option("partitionOverwriteMode", "dynamic")
      .mode(SaveMode.Overwrite)
      .parquet(countsPath)
  }

  /** Starts the monitor over a file-source stream of events. */
  def start(schema: StructType, basePath: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream.schema(schema).parquet(basePath)
      .writeStream
      .foreachBatch(ingestBatch _)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** The merged count table `(seriesCol, bucket, n)` — partial rows from
    * straddling batches summed.
    */
  def currentCounts(): DataFrame =
    spark.read.parquet(countsPath)
      .groupBy(col(seriesCol), col("bucket"))
      .agg(sum(col("n")).as("n"))

  /** Current anomaly report — ≡ [[EventAnalytics.anomalies]] over the
    * whole replayed stream (spec-pinned), computed without touching it.
    */
  def currentAnomalies(trailing: Int, threshold: Double = 3.0,
      minPrior: Int = 3): DataFrame =
    EventAnalytics.anomaliesFromCounts(
      currentCounts(), trailing, threshold, minPrior, seriesCol)
}
