package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end streaming integration: the training-data pipeline's
  * streaming components wired IN SEQUENCE over multi-batch MemoryStreams,
  * asserting the corpus / quarantine / session TABLES after straddling and
  * replayed batches — the cross-component contract the per-component specs
  * can't see:
  *
  *   docs ──▶ [[StreamingFpDedup.verdicts]] (stateful exact dedup, state
  *   straddles batches) ──▶ decontaminate gate
  *   ([[graft.ops.Decontaminate.overlap]] inside foreachBatch — the
  *   [[StreamingDedupIngest]] discipline) ──▶ batch-partitioned corpus +
  *   quarantine tables (dynamic partition overwrite ⇒ replay-idempotent);
  *   events ──▶ [[StreamingSessionize.sessions]] ──▶ closed-session table.
  */
class StreamingPipelineSpec extends SparkSpec {

  private val evalText =
    "the forbidden benchmark passage that must never reach the training corpus verbatim"

  test("docs: fp-dedup state straddles batches, contaminated novels divert, replay is idempotent") {
    import spark.implicits._
    val work = tempDir("graft-spipe")
    val corpusPath = s"$work/corpus"
    val quarantinePath = s"$work/quarantine"
    val evalSet = Seq((900L, evalText)).toDF("doc_id", "text")

    // All docs the stream will carry — the foreachBatch gate joins the
    // verdict batch back to text through this static frame (id → text is
    // deterministic; in production the verdict stream carries text along).
    val allDocs = Seq(
      (1L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"),
      (2L, "kilo lima mike november oscar papa quebec romeo sierra tango"),
      (3L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"), // intra-batch dup of 1
      (10L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"), // cross-BATCH dup of 1
      (11L, evalText + " padded with extra trailing context tokens"),          // contaminated novel
      (12L, "uniform unique utterly unrelated content about something else entirely wholly")
    ).toDF("doc_id", "text")

    def gate(batch: Dataset[FpVerdict], batchId: Long): Unit = {
      val novel = batch.where(col("novel"))
        .join(allDocs, Seq("doc_id"))
        .select(col("doc_id"), col("text"))
      if (!novel.isEmpty) {
        val verdict = graft.ops.Decontaminate.overlap(
          novel, evalSet, n = 8, minShared = 1L)
        def writeSlice(df: DataFrame, path: String): Unit =
          df.withColumn("ingest_batch", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch").parquet(path)
        writeSlice(
          novel.join(verdict.where(!col("contaminated")).select("doc_id"), Seq("doc_id")),
          corpusPath)
        writeSlice(
          novel.join(verdict.where(col("contaminated")).select("doc_id"), Seq("doc_id")),
          quarantinePath)
      }
    }

    val docs = MemoryStream[(Long, String)](spark)
    val q = StreamingFpDedup.verdicts(spark, docs.toDF().toDF("doc_id", "text"))
      .writeStream
      .foreachBatch(gate _)
      .option("checkpointLocation", s"$work/ckpt")
      .outputMode("append")
      .start()
    try {
      // batch 0: docs 1/2/3 — 3 is an intra-batch dup of 1
      docs.addData((1L, textOf(allDocs, 1L)), (2L, textOf(allDocs, 2L)), (3L, textOf(allDocs, 3L)))
      q.processAllAvailable()
      val c0 = spark.read.parquet(corpusPath).select("doc_id").collect().map(_.getLong(0)).toSet
      assert(c0 == Set(1L, 2L), s"intra-batch dup must lose to the min id: $c0")

      // batch 1 STRADDLES the dedup state: 10 duplicates batch-0's doc 1;
      // 11 is novel but contaminated; 12 is novel and clean
      docs.addData((10L, textOf(allDocs, 10L)), (11L, textOf(allDocs, 11L)), (12L, textOf(allDocs, 12L)))
      q.processAllAvailable()
      val corpus = spark.read.parquet(corpusPath).select("doc_id").collect().map(_.getLong(0)).toSet
      assert(corpus == Set(1L, 2L, 12L),
        s"cross-batch dup 10 suppressed by state, contaminated 11 diverted: $corpus")
      val quarantine = spark.read.parquet(quarantinePath)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(quarantine == Set(11L), s"quarantine holds exactly the contaminated novel: $quarantine")
    } finally q.stop()

    // REPLAY batch 1's gate outputs (checkpoint-recovery shape): same
    // verdicts, same batch id — dynamic partition overwrite must leave
    // every table unchanged instead of double-appending
    import spark.implicits._
    val replayVerdicts = Seq(
      FpVerdict(10L, "x", novel = false),
      FpVerdict(11L, "y", novel = true),
      FpVerdict(12L, "z", novel = true)).toDS()
    gate(replayVerdicts, 1L)
    val corpusAfter = spark.read.parquet(corpusPath).select("doc_id")
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(corpusAfter == Seq(1L, 2L, 12L), s"replayed batch must not duplicate rows: $corpusAfter")
    val quarantineAfter = spark.read.parquet(quarantinePath).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(quarantineAfter == Seq(11L), s"replayed quarantine unchanged: $quarantineAfter")
  }

  test("events of the surviving docs: sessions close across batch boundaries downstream") {
    import spark.implicits._
    // the user-activity leg of the same pipeline: reading sessions for the
    // crawl that produced the corpus — gap rule must close across batches
    val events = MemoryStream[(Long, Long, Long, Double)](spark)
    val q = StreamingSessionize.sessions(
        spark, events.toDF().toDF("user_id", "ts", "event_id", "value"), gapMs = 50L)
      .writeStream.format("memory").queryName("pipe_sessions").outputMode("append").start()
    try {
      events.addData((7L, 0L, 1L, 1.0), (7L, 30L, 2L, 1.0))
      q.processAllAvailable()
      assert(spark.table("pipe_sessions").count() == 0, "open session must not emit")
      // straddle: t=60 continues the session (gap 30 ≤ 50) across the
      // batch boundary; t=500 exceeds the gap and closes it
      events.addData((7L, 60L, 3L, 1.0), (7L, 500L, 4L, 1.0))
      q.processAllAvailable()
      val closed = spark.table("pipe_sessions").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      assert(closed.toSeq == Seq((7L, 0, 0L, 60L, 3L)),
        s"one session, three events, closed by the 500ms burst: ${closed.toSeq}")
    } finally q.stop()
  }

  private def textOf(docs: DataFrame, id: Long): String =
    docs.where(col("doc_id") === id).collect().head.getString(1)
}
