package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamJoinsSpec extends SparkSpec {

  private def ts(sec: Long): java.sql.Timestamp = new java.sql.Timestamp(sec * 1000L)

  test("stream-stream follows: matches within the window across batches; batch face agrees") {
    import spark.implicits._
    val views  = MemoryStream[(Long, Long, java.sql.Timestamp)](spark)
    val buys   = MemoryStream[(Long, Long, java.sql.Timestamp)](spark)
    val vDf = views.toDF().toDF("user_id", "view_id", "v_ts")
    val bDf = buys.toDF().toDF("user_id", "buy_id", "b_ts")
    val q = StreamJoins.follows(vDf, bDf, "user_id", "v_ts", "b_ts",
        window = "10 minutes", watermark = "1 hour")
      .select("user_id", "view_id", "buy_id")
      .writeStream.format("memory").queryName("follows_out").outputMode("append").start()
    try {
      // user 1: buy 5 min after the view → match; user 2: buy 20 min
      // after → outside the window; user 3: buy BEFORE the view → no match
      views.addData((1L, 100L, ts(1000)), (2L, 200L, ts(1000)), (3L, 300L, ts(2000)))
      buys.addData((1L, 900L, ts(1300)), (2L, 901L, ts(2200)), (3L, 902L, ts(1500)))
      q.processAllAvailable()
      // cross-BATCH match: the view arrived in batch 1, the buy arrives now
      buys.addData((2L, 903L, ts(1500)))
      q.processAllAvailable()
      val got = spark.table("follows_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == Set((1L, 100L, 900L), (2L, 200L, 903L)), s"got $got")
    } finally q.stop()

    // the SAME helper on batch frames reproduces the streamed result
    val bv = Seq((1L, 100L, ts(1000)), (2L, 200L, ts(1000)), (3L, 300L, ts(2000)))
      .toDF("user_id", "view_id", "v_ts")
    val bb = Seq((1L, 900L, ts(1300)), (2L, 901L, ts(2200)), (3L, 902L, ts(1500)),
        (2L, 903L, ts(1500)))
      .toDF("user_id", "buy_id", "b_ts")
    val batch = StreamJoins.follows(bv, bb, "user_id", "v_ts", "b_ts",
        window = "10 minutes", watermark = "1 hour")
      .select("user_id", "view_id", "buy_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch == Set((1L, 100L, 900L), (2L, 200L, 903L)))
  }

  test("boundary inclusion: a right event exactly window after the left still matches") {
    import spark.implicits._
    val l = Seq((1L, 10L, ts(0))).toDF("k", "lid", "lts")
    val r = Seq((1L, 20L, ts(600)), (1L, 21L, ts(601))).toDF("k", "rid", "rts")
    val got = StreamJoins.follows(l, r, "k", "lts", "rts", "10 minutes", "1 hour")
      .select("rid").collect().map(_.getLong(0)).toSet
    assert(got == Set(20L), s"inclusive upper bound expected: $got")
  }
}
