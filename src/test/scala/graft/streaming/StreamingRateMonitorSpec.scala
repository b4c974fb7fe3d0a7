package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

import graft.ops.EventAnalytics

class StreamingRateMonitorSpec extends SparkSpec {

  private def events(rows: (String, Long)*) = {
    import spark.implicits._
    rows.toDF("event_type", "ts")
  }

  // buckets (bucketTs=10): counts 2,3,2,3,2 (varying — constant priors
  // would zero the variance and NULL the spike's z), then a 10-spike in 5
  private def batchA = events(
    (0 to 4).flatMap(b =>
      (0 until (2 + b % 2)).map(i => ("t", b * 10L + 1 + i))): _*)
  private def batchB = events(Seq.fill(9)(("t", 51L)) :+ (("t", 52L)): _*)

  test("merged incremental counts ≡ whole-stream batch operator; straddling buckets sum") {
    val work = tempDir("graft-ratemon")
    val mon = StreamingRateMonitor(spark, s"$work/counts", bucketTs = 10L)
    mon.ingestBatch(batchA, 0L)
    mon.ingestBatch(batchB, 1L) // bucket 5 gets 1 row in A? no — all of B; bucket 5 spans B only
    val whole = EventAnalytics.anomalies(
      batchA.unionByName(batchB), bucketTs = 10L, trailing = 4,
      threshold = 2.0, minPrior = 3)
      .collect().map(_.toString).sorted.toSeq
    val inc = mon.currentAnomalies(trailing = 4, threshold = 2.0, minPrior = 3)
      .collect().map(_.toString).sorted.toSeq
    assert(inc == whole && inc.nonEmpty)
    // the spike bucket is flagged with the exact closed-form z
    val spike = mon.currentAnomalies(4, 2.0, 3)
      .where(col("bucket") === 5L).collect().head
    assert(spike.getLong(2) == 10L && spike.getBoolean(4))
  }

  test("a bucket straddling two batches merges its partial counts") {
    val work = tempDir("graft-ratemon2")
    val mon = StreamingRateMonitor(spark, s"$work/counts", bucketTs = 10L)
    mon.ingestBatch(events(("t", 11L), ("t", 12L)), 0L)
    mon.ingestBatch(events(("t", 13L), ("t", 14L), ("t", 15L)), 1L)
    val got = mon.currentCounts().collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 5L))
  }

  test("replaying a batch id overwrites its prior attempt, never double-counts") {
    val work = tempDir("graft-ratemon3")
    val mon = StreamingRateMonitor(spark, s"$work/counts", bucketTs = 10L)
    mon.ingestBatch(batchA, 0L)
    mon.ingestBatch(batchB, 1L)
    val before = mon.currentCounts().collect().map(_.toString).sorted.toSeq
    mon.ingestBatch(batchB, 1L) // crash-recovery replay
    val after = mon.currentCounts().collect().map(_.toString).sorted.toSeq
    assert(after == before)
  }
}
