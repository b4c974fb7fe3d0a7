package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamingTrendingSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("ts", "text")
  }

  test("trending: merged per-batch counts, top-k per bucket, straddling batches sum") {
    val work = tempDir("graft-trending")
    val mon = StreamingTrending(spark, s"$work/counts", bucketTs = 10L)
    // bucket 0: spark×3, data×2, ok×1 — split across two batches
    mon.ingestBatch(docs((1L, "spark data spark"), (2L, "ok")), 0L)
    mon.ingestBatch(docs((3L, "spark data"), (11L, "fresh fresh new")), 1L)
    val top = mon.trending(k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(3)) -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(top((0L, 1L)) == (("spark", 3L)))
    assert(top((0L, 2L)) == (("data", 2L)))
    assert(top((1L, 1L)) == (("fresh", 2L)))
    assert(top((1L, 2L)) == (("new", 1L)))
  }

  test("rising: deltas vs the previous calendar bucket; new terms rise by their full count") {
    val work = tempDir("graft-trending2")
    val mon = StreamingTrending(spark, s"$work/counts", bucketTs = 10L)
    // bucket 0: spark×5 ok×1; bucket 1: spark×5 (flat), surge×3 (new)
    mon.ingestBatch(docs(
      (1L, "spark spark spark spark spark ok"),
      (11L, "spark spark spark spark spark surge surge surge")), 0L)
    val rising = mon.rising(k = 1).where(col("bucket") === 1L).collect().head
    // spark's delta is 0; surge's is +3 — surge must outrank the stopword
    assert(rising.getString(1) == "surge" && rising.getLong(3) == 3L)
  }

  test("replaying a batch id overwrites its prior attempt, never double-counts") {
    val work = tempDir("graft-trending3")
    val mon = StreamingTrending(spark, s"$work/counts", bucketTs = 10L)
    mon.ingestBatch(docs((1L, "a a b")), 0L)
    mon.ingestBatch(docs((2L, "b c")), 1L)
    val before = mon.currentCounts().collect().map(_.toString).sorted.toSeq
    mon.ingestBatch(docs((2L, "b c")), 1L) // crash-recovery replay
    val after = mon.currentCounts().collect().map(_.toString).sorted.toSeq
    assert(after == before)
  }
}
