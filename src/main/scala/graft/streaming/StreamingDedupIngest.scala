package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.ops.{Dedup, HashFamily, TextAnalysis, XxHash}

/** Streaming dedup-on-ingest: every micro-batch of documents is deduped
  * against itself and against the accumulated corpus; only novel documents
  * enter the corpus, and each detected duplicate is recorded with the
  * document it duplicates.
  *
  * The streaming face of [[graft.ops.Dedup.incrementalMinhash]] — the shape
  * a training-data pipeline actually runs ("dedup today's crawl against
  * everything ever kept"), with the corpus as the only cross-batch state:
  *
  *  1. '''intra-batch exact dedup''': one representative (min id) per
  *     content fingerprint — a batch-local groupBy;
  *  2. '''cross-corpus near-dup''': band equi-join against the corpus with
  *     the corpus side bloom-pruned map-side (see `incrementalMinhash` —
  *     the corpus is read once per batch but only bucket-matching rows
  *     shuffle);
  *  3. '''idempotent writes''': outputs are partitioned by `ingest_batch`
  *     and written with dynamic partition overwrite, so a replayed batch
  *     (checkpoint recovery) overwrites its own partition instead of
  *     double-appending — exactly-once corpus contents on at-least-once
  *     batch delivery.
  *
  * State is the corpus table itself (like [[StreamingIngest]]'s vertex
  * table), so the query is restart-safe with no custom state store.
  */
class StreamingDedupIngest(
    spark: SparkSession,
    corpusPath: String,
    dupsPath: String,
    textCol: String = "text",
    idCol: String = "doc_id",
    numHashes: Int = 16,
    bands: Int = 4,
    shingleWidth: Int = 3,
    verifyThreshold: Double = 0.7,
    hash: HashFamily = XxHash
) {

  /** The accumulated corpus, or an empty same-schema frame before the first
    * batch lands (the reference's empty-with-id fallback pattern,
    * IdManager.scala).
    */
  private def readCorpus(like: DataFrame): DataFrame =
    try spark.read.parquet(corpusPath).drop("ingest_batch")
    catch { case _: org.apache.spark.sql.AnalysisException => like.limit(0) }

  /** Runs one micro-batch through dedup; usable directly in tests and from
    * batch jobs (same contract as [[StreamingIngest.ingestBatch]]).
    */
  def ingestBatch(batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return

    // 1. intra-batch exact dedup: min-id representative per fingerprint
    val w = Window.partitionBy(col("_fp")).orderBy(col(idCol))
    val reps = batch
      .withColumn("_fp", TextAnalysis.fingerprint(col(textCol)))
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_fp", "_rn")

    // 2. near-dups of the accumulated corpus
    val corpus = readCorpus(batch)
    val dupPairs = Dedup.incrementalMinhash(
      reps, corpus, textCol, idCol, numHashes, bands, shingleWidth, verifyThreshold, hash)

    val novel = reps.join(
      dupPairs.select(col("new_id")).distinct(),
      reps(idCol) === col("new_id"), "left_anti")

    // 3. idempotent batch-partitioned writes (dynamic overwrite: a replayed
    // batch rewrites only partition ingest_batch=<batchId>)
    def writeBatchPartition(df: DataFrame, path: String): Unit =
      df.withColumn("ingest_batch", lit(batchId))
        .write
        .partitionBy("ingest_batch")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(path)

    writeBatchPartition(novel, corpusPath)
    writeBatchPartition(dupPairs, dupsPath)
    graft.Caches.clear() // drop the operator's tracked band-frame persists
  }

  /** Starts the streaming ingest over a file-source directory. */
  def start(schema: StructType, inputPath: String, checkpointDir: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream.schema(schema).parquet(inputPath)
      .writeStream
      .foreachBatch(ingestBatch _)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
