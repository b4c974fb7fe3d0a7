package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntervalJoinSpec extends SparkSpec {

  private lazy val points = {
    import spark.implicits._
    Seq(
      ("u1", 5L, "p1"), ("u1", 15L, "p2"), ("u1", 100L, "p3"),
      ("u2", 15L, "p4"), ("u3", 50L, "p5")
    ).toDF("user", "t", "pid")
  }

  private lazy val intervals = {
    import spark.implicits._
    Seq(
      ("u1", 0L, 10L, "i1"),   // contains p1 (t=5); t=10 inclusive
      ("u1", 10L, 20L, "i2"),  // contains p2; overlaps i1 at t=10
      ("u1", 95L, 305L, "i3"), // long interval spanning many buckets, has p3
      ("u2", 0L, 10L, "i4"),   // p4 at 15 is outside
      ("u4", 0L, 999L, "i5")   // key with no points
    ).toDF("user", "s", "e", "iid")
  }

  private def expected: Set[(String, String)] =
    Set(("p1", "i1"), ("p2", "i2"), ("p3", "i3"))

  test("matches brute force across bucket widths, inclusive bounds") {
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val out = IntervalJoin.pointInInterval(points, intervals, Seq("user"), "t", "s", "e", w)
        .select("pid", "iid").collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(out == expected, s"bucketWidth $w diverged: $out")
    }
  }

  test("a point on a shared boundary matches both intervals, once each") {
    import spark.implicits._
    val p = Seq(("u1", 10L, "pb")).toDF("user", "t", "pid")
    val out = IntervalJoin.pointInInterval(p, intervals, Seq("user"), "t", "s", "e", 8L)
      .select("pid", "iid").collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSet == Set(("pb", "i1"), ("pb", "i2")))
    assert(out.length == 2, s"no duplicate pairs expected: ${out.toSeq}")
  }

  test("plan shape: equi-join on (key, bucket), no nested loop") {
    val plan = IntervalJoin.pointInInterval(points, intervals, Seq("user"), "t", "s", "e", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"bucketized interval join must not plan a nested loop:\n$plan")
  }

  private lazy val leftIv = {
    import spark.implicits._
    Seq(
      ("u1", 0L, 10L, "a1"),    // overlaps b1 (0-5) and b2 (10-20, boundary touch)
      ("u1", 50L, 300L, "a2"),  // long: overlaps b3 across many buckets
      ("u2", 0L, 10L, "a3"),    // u2: b4 starts at 11 — NO overlap
      ("u3", 5L, 6L, "a4")      // key with no right rows
    ).toDF("user", "ls", "le", "aid")
  }

  private lazy val rightIv = {
    import spark.implicits._
    Seq(
      ("u1", 0L, 5L, "b1"), ("u1", 10L, 20L, "b2"),
      ("u1", 250L, 900L, "b3"), ("u2", 11L, 12L, "b4")
    ).toDF("user", "rs", "re", "bid")
  }

  private def overlapExpected: Set[(String, String)] =
    Set(("a1", "b1"), ("a1", "b2"), ("a2", "b3"))

  test("intervalOverlap: brute-force equality across widths; long spans pair exactly once") {
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val rows = IntervalJoin.intervalOverlap(
          leftIv, rightIv, Seq("user"), "ls", "le", "rs", "re", w)
        .select("aid", "bid").collect().map(r => (r.getString(0), r.getString(1)))
      assert(rows.toSet == overlapExpected, s"bucketWidth $w diverged: ${rows.toSet}")
      assert(rows.length == overlapExpected.size,
        s"bucketWidth $w produced duplicate pairs: ${rows.toSeq}")
    }
  }

  test("intervalOverlap plan shape: equi-join on (key, bucket), no nested loop") {
    val plan = IntervalJoin.intervalOverlap(
        leftIv, rightIv, Seq("user"), "ls", "le", "rs", "re", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"bucketized overlap join must not plan a nested loop:\n$plan")
  }
}
