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

  test("compact: bounds state — partials consolidate, stale buckets drop, serving unchanged") {
    val work = tempDir("graft-trending4")
    val mon = StreamingTrending(spark, s"$work/counts", bucketTs = 10L)
    // buckets 0..3 across four batches; bucket 0 split over two batches
    mon.ingestBatch(docs((1L, "spark data spark"), (11L, "data ok")), 0L)
    mon.ingestBatch(docs((2L, "spark ok"), (21L, "fresh new")), 1L)
    mon.ingestBatch(docs((31L, "fresh fresh surge")), 2L)
    mon.ingestBatch(docs((35L, "surge surge")), 3L)
    val fullBefore = mon.currentCounts().collect().map(_.toString).sorted.toSeq
    val trendBefore = mon.trending(k = 2).collect().map(_.toString).sorted.toSeq
    // unlimited retention: pure consolidation — every serving face identical
    mon.compact()
    assert(mon.currentCounts().collect().map(_.toString).sorted.toSeq == fullBefore)
    assert(mon.trending(k = 2).collect().map(_.toString).sorted.toSeq == trendBefore)
    // state is now bounded: one consolidated row per (bucket, token), all
    // under the reserved partition — no per-batch partials left
    val raw = spark.read.parquet(s"$work/counts")
    assert(raw.select(col("ingest_batch").cast("long")).distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(-1L))
    assert(raw.count() == raw.select(col("bucket"), col("token")).distinct().count())
    // retention: keep the last 2 buckets behind max (buckets 2..3);
    // in-retention serving rows are unchanged, older buckets are gone
    val inRetention = mon.trending(k = 2).where(col("bucket") >= 2L)
      .collect().map(_.toString).sorted.toSeq
    mon.compact(retentionBuckets = 2L)
    assert(mon.currentCounts().agg(min(col("bucket"))).head.getLong(0) == 2L)
    assert(mon.trending(k = 2).collect().map(_.toString).sorted.toSeq == inRetention)
    // further batches keep landing after compaction (partition -1 coexists)
    mon.ingestBatch(docs((41L, "post compact")), 4L)
    assert(mon.currentCounts().where(col("bucket") === 4L).count() == 2L)
  }
}
