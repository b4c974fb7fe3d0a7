package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Incremental trending-terms monitoring over a document/event stream —
  * the streaming face of the vocabulary / heavy-hitter ops, on the
  * [[StreamingRateMonitor]] state discipline: per micro-batch, only the
  * `(bucket, token, n)` partial counts land (in the batch's own
  * `ingest_batch` partition — dynamic-partition overwrite makes a replayed
  * batch rewrite itself, never double-count), and every serving query is a
  * merge of those bounded partials. The stream itself is never rescanned:
  * "top terms this hour" reads |buckets|·|vocab| count rows at any corpus
  * scale.
  *
  * Two serving faces: [[trending]] (top-k per bucket by merged count,
  * deterministic greatest-token ties) and [[rising]] (top-k by count DELTA
  * vs the previous present bucket — the "what's new" screen that a plain
  * top-k misses because stopwords dominate every bucket).
  */
case class StreamingTrending(
    spark: SparkSession,
    countsPath: String,
    bucketTs: Long,
    tsCol: String = "ts",
    textCol: String = "text") {

  require(bucketTs > 0, s"bucketTs must be positive, got $bucketTs")

  /** Adds one micro-batch's `(bucket, token)` counts under its own batch
    * partition (replay-idempotent).
    */
  def ingestBatch(batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return
    batch
      .select(expr(s"`$tsCol` div $bucketTs").as("bucket"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("token"))
      .where(col("token") =!= "")
      .groupBy(col("bucket"), col("token"))
      .agg(count(lit(1)).as("n"))
      .withColumn("ingest_batch", lit(batchId))
      .write
      .partitionBy("ingest_batch")
      .option("partitionOverwriteMode", "dynamic")
      .mode(SaveMode.Overwrite)
      .parquet(countsPath)
  }

  /** Starts the monitor over a file-source stream. */
  def start(schema: StructType, basePath: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream.schema(schema).parquet(basePath)
      .writeStream
      .foreachBatch(ingestBatch _)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** State compaction — bounds the counts table in BOTH growth
    * dimensions, which plain ingest never does (per-batch partitions
    * accumulate forever, and straddling batches keep a bucket's counts
    * split across many partial rows):
    *
    *   - partials merge into ONE consolidated row per `(bucket, token)`,
    *     stored under the reserved `ingest_batch = -1` partition;
    *   - buckets more than `retentionBuckets` behind the max observed
    *     bucket are dropped entirely (the [[StreamingFpDedup]] retention
    *     discipline applied to the count state).
    *
    * Every serving face reads MERGED counts, so compaction never changes
    * a served result within retention (spec-pinned). Whole-table atomic
    * swap under the maintenance lock ([[graft.io.AtomicSwap]]): a crash
    * mid-compaction leaves the previous state intact, and a concurrent
    * compaction fails fast instead of corrupting.
    *
    * Replay contract: a batch replayed AFTER its rows were consolidated
    * would re-add them under its own partition id — run compaction only
    * once the stream's checkpoint has committed the batches being folded
    * (between runs for `Trigger.AvailableNow` jobs), the same maintenance
    * window the IdManager compactor documents.
    */
  def compact(retentionBuckets: Long = Long.MaxValue): Unit = {
    require(retentionBuckets > 0, s"retentionBuckets must be positive, got $retentionBuckets")
    val dir = new org.apache.hadoop.fs.Path(countsPath)
    val fs  = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return
    graft.io.AtomicSwap.withMaintenanceLock(fs, dir) {
      graft.io.AtomicSwap.heal(fs, dir)
      val cur = currentCounts()
      val maxRow = cur.agg(max(col("bucket"))).head()
      if (!maxRow.isNullAt(0)) {
        val floor = maxRow.getLong(0) - (retentionBuckets - 1)
        val merged = cur.where(col("bucket") >= floor)
          .withColumn("ingest_batch", lit(-1L))
        val scratch = graft.io.AtomicSwap.scratch(dir)
        merged.write.partitionBy("ingest_batch")
          .mode(SaveMode.Overwrite).parquet(scratch.toString)
        graft.io.AtomicSwap.swapIn(fs, dir)
      }
    }
  }

  /** The merged count table `(bucket, token, n)` — straddling batches'
    * partial rows summed.
    */
  def currentCounts(): DataFrame =
    spark.read.parquet(countsPath)
      .groupBy(col("bucket"), col("token"))
      .agg(sum(col("n")).as("n"))

  /** Top-`k` tokens per bucket by merged count, ties toward the greatest
    * token — deterministic, and the per-bucket window ranks |vocab| rows,
    * never the stream.
    */
  def trending(k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("n").desc, col("token").desc)
    currentCounts()
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** Top-`k` tokens per bucket by count DELTA against the previous
    * CALENDAR bucket (a token absent there counts 0 — brand-new terms
    * get their full count as delta). Sorted by delta, ties toward the
    * greatest token.
    */
  def rising(k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val cur = currentCounts()
    val prev = cur.select((col("bucket") + 1).as("bucket"),
      col("token"), col("n").as("_prev"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("delta").desc, col("token").desc)
    cur.join(prev, Seq("bucket", "token"), "left")
      .withColumn("delta", col("n") - coalesce(col("_prev"), lit(0L)))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("bucket"), col("token"), col("n"), col("delta"), col("rank"))
  }
}
