package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamingSessionizeSpec extends SparkSpec {

  test("gap rule closes sessions across batches; straddling sessions keep folding") {
    import spark.implicits._
    val stream = MemoryStream[(Long, Long, Long, Double)](spark)
    val ev = stream.toDF().toDF("user_id", "ts", "event_id", "value")
    val q = StreamingSessionize.sessions(spark, ev, gapMs = 20L)
      .writeStream.format("memory").queryName("sess_gap").outputMode("append").start()
    try {
      // u1 session 0 starts (t=0,10); nothing closes yet
      stream.addData((1L, 0L, 1L, 1.0), (1L, 10L, 2L, 2.0))
      q.processAllAvailable()
      assert(spark.table("sess_gap").count() == 0)
      // t=15 extends the SAME session across the batch boundary;
      // t=100 exceeds the gap → session 0 closes with all three events
      stream.addData((1L, 15L, 3L, 4.0), (1L, 100L, 4L, 8.0))
      q.processAllAvailable()
      val closed = spark.table("sess_gap").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      assert(closed.toSeq == Seq((1L, 0, 0L, 15L, 3L, 7.0)))
      // two sessions INSIDE one batch: 200..205 then 300 — the first
      // closes immediately, and session 1 (the t=100 burst) closes too
      stream.addData((1L, 200L, 5L, 1.0), (1L, 205L, 6L, 1.0), (1L, 300L, 7L, 1.0))
      q.processAllAvailable()
      val all = spark.table("sess_gap").collect()
        .map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      assert(all.contains((1, 100L, 100L, 1L))) // session 1: the lone t=100 event
      assert(all.contains((2, 200L, 205L, 2L))) // session 2: the 200..205 burst
    } finally q.stop()
  }

  test("event-time timeout closes an idle session; ordinals survive the timeout") {
    import spark.implicits._
    val stream = MemoryStream[(Long, Long, Long, Double)](spark)
    val ev = stream.toDF().toDF("user_id", "ts", "event_id", "value")
    val q = StreamingSessionize.sessions(spark, ev, gapMs = 20L)
      .writeStream.format("memory").queryName("sess_ttl").outputMode("append").start()
    try {
      stream.addData((1L, 0L, 1L, 1.0))
      q.processAllAvailable()
      // another user's far-future events advance the watermark
      // (delay = 2·gap = 40ms, so wm ≈ 1000 − 40 ≫ 0 + gap)
      stream.addData((2L, 1000L, 2L, 1.0))
      q.processAllAvailable()
      // one more empty-ish batch lets the timeout fire
      stream.addData((2L, 1100L, 3L, 1.0))
      q.processAllAvailable()
      val u1 = spark.table("sess_ttl").where(col("user_id") === 1).collect()
      assert(u1.length == 1 && u1.head.getInt(1) == 0 && u1.head.getLong(4) == 1L)
      // u1 returns AFTER the timeout: the next session numbers on (seq 1)
      stream.addData((1L, 2000L, 4L, 5.0), (2L, 2000L, 5L, 1.0))
      q.processAllAvailable()
      stream.addData((2L, 3000L, 6L, 1.0), (2L, 3100L, 7L, 1.0))
      q.processAllAvailable()
      val u1b = spark.table("sess_ttl").where(col("user_id") === 1).collect()
        .map(r => r.getInt(1) -> r.getLong(2)).toMap
      assert(u1b == Map(0 -> 0L, 1 -> 2000L))
    } finally q.stop()
  }

  test("retainOrdinals=false removes the tombstone: ordinals restart after expiry") {
    import spark.implicits._
    val stream = MemoryStream[(Long, Long, Long, Double)](spark)
    val ev = stream.toDF().toDF("user_id", "ts", "event_id", "value")
    val q = StreamingSessionize.sessions(spark, ev, gapMs = 20L, retainOrdinals = false)
      .writeStream.format("memory").queryName("sess_nottl").outputMode("append").start()
    try {
      stream.addData((1L, 0L, 1L, 1.0))
      q.processAllAvailable()
      stream.addData((2L, 1000L, 2L, 1.0))
      q.processAllAvailable()
      stream.addData((2L, 1100L, 3L, 1.0)) // lets u1's timeout fire → state removed
      q.processAllAvailable()
      val u1 = spark.table("sess_nottl").where(col("user_id") === 1).collect()
      assert(u1.length == 1 && u1.head.getInt(1) == 0 && u1.head.getLong(4) == 1L)
      // u1 returns AFTER the expiry: no tombstone left, seq restarts at 0
      stream.addData((1L, 2000L, 4L, 5.0), (2L, 2000L, 5L, 1.0))
      q.processAllAvailable()
      stream.addData((1L, 2010L, 6L, 1.0), (2L, 3000L, 7L, 1.0))
      q.processAllAvailable()
      stream.addData((2L, 3100L, 8L, 1.0), (2L, 3200L, 9L, 1.0))
      q.processAllAvailable()
      val u1b = spark.table("sess_nottl").where(col("user_id") === 1).collect()
        .map(r => (r.getInt(1), r.getLong(2), r.getLong(4))).toSet
      // both sessions carry seq 0 — the second restarted after removal
      assert(u1b.map(_._1) == Set(0), s"got $u1b")
      assert(u1b.map(_._2) == Set(0L, 2000L), s"got $u1b")
    } finally q.stop()
  }

  test("batch face ≡ ops.Sessionize.byGap + sessionStats, row for row") {
    import spark.implicits._
    val rows = Seq(
      (1L, 0L, 1L, 1.0), (1L, 10L, 2L, 2.0), (1L, 50L, 3L, 4.0),
      (2L, 5L, 4L, 8.0), (2L, 100L, 5L, 16.0), (2L, 110L, 6L, 32.0),
      (3L, 7L, 7L, 64.0))
    val ev = rows.toDF("user_id", "ts", "event_id", "value")
    val got = StreamingSessionize.sessions(spark, ev, gapMs = 20L)
      .collect().map(s =>
        (s.user_id, s.session_seq.toLong, s.session_start, s.session_end, s.n_events,
          s.sum_value)).toSet
    val batch = graft.ops.Sessionize.sessionStats(
      graft.ops.Sessionize.byGap(ev, gap = 20L), valueCol = col("value"))
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5))).toSet
    assert(got == batch)
    assert(got.size == 5) // u1: {0,10}+{50}; u2: {5}+{100,110}; u3: {7}
  }
}
