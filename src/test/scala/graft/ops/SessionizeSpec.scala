package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {

  test("byGap splits on gaps > threshold, per user") {
    import spark.implicits._
    // user 1: ts 0,5,100,105 with gap 10 → sessions [0,5] and [100,105]
    // user 2: ts 0 → one singleton session
    val df = Seq((1L, 0L, 1.0), (1L, 5L, 2.0), (1L, 100L, 3.0), (1L, 105L, 4.0), (2L, 0L, 5.0))
      .toDF("user_id", "ts", "value")
    val s = Sessionize.byGap(df, gap = 10L)
    val seqs = s.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(seqs == Map((1L, 0L) -> 0L, (1L, 5L) -> 0L, (1L, 100L) -> 1L, (1L, 105L) -> 1L, (2L, 0L) -> 0L))
    assert(s.where(col("session_id") === "1#1").count() == 2)

    val stats = Sessionize.sessionStats(s).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(stats((1L, 0L)) == ((0L, 5L, 2L, 3.0)))
    assert(stats((1L, 1L)) == ((100L, 105L, 2L, 7.0)))
    assert(stats((2L, 0L)) == ((0L, 0L, 1L, 5.0)))
  }

  test("sessionFeatures: ordinal, dt from session start, size, last-event mask") {
    import spark.implicits._
    val df = Seq((1L, 0L, 10L), (1L, 5L, 11L), (1L, 100L, 12L), (2L, 7L, 13L))
      .toDF("user_id", "ts", "event_id")
    val got = Sessionize.sessionFeatures(Sessionize.byGap(df, gap = 10L))
      .collect().map(r => r.getLong(2) ->
        ((r.getInt(5), r.getLong(6), r.getLong(7), r.getBoolean(8)))).toMap
    // columns: user, ts, id, session_seq, session_id, event_index, dt, n, is_last
    assert(got(10L) == ((1, 0L, 2L, false))) // first of the 2-event session
    assert(got(11L) == ((2, 5L, 2L, true))) // last of it, 5 ticks in
    assert(got(12L) == ((1, 0L, 1L, true))) // singleton session: first AND last
    assert(got(13L) == ((1, 0L, 1L, true)))
  }

  test("feature extraction: histogram shares sum to 1 and match byte distribution") {
    import spark.implicits._
    val df = Seq((1L, "aaaa")).toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val f = Multimodal.extractFeatures(df, "payload").head().getSeq[Double](1)
    assert(f.length == 16)
    assert(math.abs(f.sum - 1.0) < 1e-12)
    assert(f(('a'.toInt * 16) / 256) == 1.0) // all bytes in 'a''s bin
  }

  test("resizeMeta preserves aspect ratio and never upscales") {
    import spark.implicits._
    val df = Seq((200, 100), (50, 40)).toDF("width", "height")
    val out = Multimodal.resizeMeta(df, maxSide = 100).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getInt(2), r.getInt(3))).toMap
    assert(out((200, 100)) == ((100, 50)))
    assert(out((50, 40)) == ((50, 40))) // already within bounds — untouched
  }
}
