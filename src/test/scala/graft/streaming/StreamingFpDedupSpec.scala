package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamingFpDedupSpec extends SparkSpec {

  test("stateful dedup: cross-batch state survives, intra-batch min-id wins, normalization-invariant") {
    import spark.implicits._
    val stream = MemoryStream[(Long, String)](spark)
    val docs = stream.toDF().toDF("doc_id", "text")
    val q = StreamingFpDedup.verdicts(spark, docs)
      .writeStream.format("memory").queryName("fp_verdicts").outputMode("append").start()
    try {
      // batch 1: 1 and 3 share a fingerprint (case/whitespace-normalized);
      // min doc_id (1) is the novel one
      stream.addData((1L, "hello world"), (2L, "other text"), (3L, "hello   WORLD"))
      q.processAllAvailable()
      val b1 = spark.table("fp_verdicts")
        .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      assert(b1 == Map(1L -> true, 2L -> true, 3L -> false))

      // batch 2: 4 duplicates batch 1's fingerprint (STATE, not intra-batch,
      // must catch it); 5 is genuinely new; 6/7 collide intra-batch
      stream.addData((4L, "Hello World"), (5L, "fresh content"),
        (7L, "twin doc"), (6L, "twin doc"))
      q.processAllAvailable()
      val all = spark.table("fp_verdicts")
        .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      assert(all(4L) == false && all(5L) == true && all(6L) == true && all(7L) == false)
    } finally q.stop()
  }

  test("bloom variant: cross-batch dups caught, verdicts match exact at tiny fpp") {
    import spark.implicits._
    val stream = MemoryStream[(Long, String)](spark)
    val docs = stream.toDF().toDF("doc_id", "text")
    val q = StreamingFpDedup.verdictsBloom(spark, docs, numBuckets = 4,
        expectedItemsPerBucket = 1000, fpp = 1e-9)
      .writeStream.format("memory").queryName("bloom_verdicts").outputMode("append").start()
    try {
      stream.addData((1L, "alpha"), (2L, "beta"), (3L, "ALPHA"))
      q.processAllAvailable()
      stream.addData((4L, "beta"), (5L, "gamma"))
      q.processAllAvailable()
      val got = spark.table("bloom_verdicts")
        .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      // identical to the exact operator's verdicts on this data: at fpp
      // 1e-9 over 5 items a false positive would be a test-environment bug
      assert(got == Map(1L -> true, 2L -> true, 3L -> false, 4L -> false, 5L -> true))
    } finally q.stop()
  }

  test("retention-windowed dedup: dup inside the window, novel again past it, state pruned") {
    import spark.implicits._
    val stream = MemoryStream[(Long, String, Long)](spark)
    val docs = stream.toDF().toDF("doc_id", "text", "ts")
    val q = StreamingFpDedup.verdictsWithin(spark, docs,
        timeCol = "ts", retentionMs = 1000L)
      .writeStream.format("memory").queryName("ttl_verdicts").outputMode("append").start()
    try {
      // t=0 first sighting; t=500 inside the window (dup, re-stamps);
      // t=1400 is 900ms after the re-stamp → still dup; unrelated doc novel
      stream.addData((1L, "story", 0L), (2L, "other", 100L))
      q.processAllAvailable()
      stream.addData((3L, "story", 500L), (4L, "story", 1400L))
      q.processAllAvailable()
      // t=3000: "story" is 1600ms past its last sighting (1400) and
      // "other" 2900ms past its only one (100) — both novel again
      stream.addData((5L, "story", 3000L), (6L, "other", 3000L))
      q.processAllAvailable()
      val got = spark.table("ttl_verdicts")
        .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      assert(got == Map(1L -> true, 2L -> true, 3L -> false, 4L -> false,
        5L -> true, 6L -> true))
    } finally q.stop()
  }

  test("retention-windowed dedup: an over-window gap INSIDE one batch re-admits the fingerprint") {
    import spark.implicits._
    val docs = Seq(
      (1L, "doc", 0L), (2L, "doc", 800L), (3L, "doc", 5000L), (4L, "doc", 5100L)
    ).toDF("doc_id", "text", "ts")
    val got = StreamingFpDedup.verdictsWithin(spark, docs,
        timeCol = "ts", retentionMs = 1000L)
      .collect().map(v => v.doc_id -> v.novel).toMap
    // 0 novel; 800 within window; 5000 past the window → novel again;
    // 5100 within the refreshed window
    assert(got == Map(1L -> true, 2L -> false, 3L -> true, 4L -> false))
  }

  test("retention-windowed dedup: engine expires idle fingerprints (state rows shrink)") {
    import spark.implicits._
    val stream = MemoryStream[(Long, String, Long)](spark)
    val docs = stream.toDF().toDF("doc_id", "text", "ts")
    val q = StreamingFpDedup.verdictsWithin(spark, docs,
        timeCol = "ts", retentionMs = 1000L)
      .writeStream.format("memory").queryName("ttl_expiry").outputMode("append").start()
    try {
      stream.addData((1L, "aa", 0L))
      q.processAllAvailable()
      // advance the watermark far past aa's window (wm = 10000 - 1000)
      stream.addData((2L, "bb", 10000L))
      q.processAllAvailable()
      // aa's timeout (~1000) is behind the watermark by now → it expires;
      // the trailing watermark-advance batch after this one also expires
      // bb (its timeout ~11000 < the final watermark 20000-2000), so the
      // quiesced state holds exactly one fingerprint: cc
      stream.addData((3L, "cc", 20000L))
      q.processAllAvailable()
      val stateRows = q.lastProgress.stateOperators(0).numRowsTotal
      assert(stateRows == 1, s"expected aa+bb expired leaving cc, got $stateRows state rows")
      // and all three were novel (distinct fingerprints)
      val got = spark.table("ttl_expiry")
        .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      assert(got == Map(1L -> true, 2L -> true, 3L -> true))
    } finally q.stop()
  }

  test("batch face equals the min-doc_id-per-fingerprint contract") {
    import spark.implicits._
    val docs = Seq(
      (10L, "aaa bbb"), (11L, "AAA  bbb"), (12L, "ccc"), (13L, "ccc"), (14L, "unique")
    ).toDF("doc_id", "text")
    val got = StreamingFpDedup.verdicts(spark, docs)
      .collect().map(v => v.doc_id -> v.novel).toMap
    assert(got == Map(10L -> true, 11L -> false, 12L -> true, 13L -> false, 14L -> true))
    // every fingerprint has exactly one novel holder
    val perFp = StreamingFpDedup.verdicts(spark, docs)
      .groupBy("fp").agg(sum(when(col("novel"), 1).otherwise(0)).as("n"))
      .collect().map(_.getLong(1))
    assert(perFp.forall(_ == 1L))
  }
}
