package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChangeCaptureSpec extends SparkSpec {

  private def snap(rows: (Long, String, Long)*) = {
    import spark.implicits._
    rows.toDF("k", "name", "v")
  }

  private def changes(rows: (Long, String, Long, String, Long)*) = {
    import spark.implicits._
    rows.toDF("k", "name", "v", "op", "seq")
  }

  test("applyChanges: upsert, delete, insert, untouched pass-through; latest seq wins") {
    val s = snap((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
    val c = changes(
      (2L, "b2", 21L, "U", 1L),
      (2L, "b3", 22L, "U", 2L),   // later seq wins
      (3L, "c", 30L, "D", 1L),
      (3L, "c9", 99L, "U", 2L),   // delete superseded by a later upsert
      (4L, "d", 40L, "I", 1L))
    val got = ChangeCapture.applyChanges(s, c, Seq("k"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got == Map(
      1L -> (("a", 10L)),     // untouched
      2L -> (("b3", 22L)),    // latest update
      3L -> (("c9", 99L)),    // delete then re-upsert → row lives
      4L -> (("d", 40L))))    // insert
  }

  test("applyChanges: a trailing delete removes the key; I and U both upsert") {
    val s = snap((1L, "a", 10L))
    val c = changes(
      (1L, "a2", 11L, "U", 1L), (1L, "a2", 11L, "D", 2L),
      (5L, "e", 50L, "I", 1L))
    val got = ChangeCapture.applyChanges(s, c, Seq("k"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(5L))
    // replay idempotency: applying the same batch again converges
    val once = ChangeCapture.applyChanges(s, c, Seq("k"))
    val twice = ChangeCapture.applyChanges(once, c, Seq("k"))
    assert(twice.collect().map(_.toString).sorted.toSeq ==
      once.collect().map(_.toString).sorted.toSeq)
  }

  test("changeLog: I/D/U classification, null-safe value compare, no row when unchanged") {
    val o = snap((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
    val n = snap((1L, "a", 10L), (2L, "B", 20L), (4L, "d", 40L))
    val log = ChangeCapture.changeLog(o, n, Seq("k"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(3)))).toMap
    assert(log == Map(
      2L -> (("B", "U")),
      3L -> (("c", "D")),    // tombstone carries OLD values
      4L -> (("d", "I"))))
  }

  test("changeLog ∘ applyChanges roundtrip: old + log(old→new) reproduces new exactly") {
    import spark.implicits._
    val o = (1L to 60L).map(i => (i, s"n$i", i * 10L)).toDF("k", "name", "v")
    val n = (1L to 80L).filter(_ % 7 != 0)
      .map(i => (i, if (i % 5 == 0) s"N$i" else s"n$i", i * 10L)).toDF("k", "name", "v")
    val log = ChangeCapture.changeLog(o, n, Seq("k")).withColumn("seq", lit(1L))
    val rebuilt = ChangeCapture.applyChanges(o, log, Seq("k"))
    assert(rebuilt.collect().map(_.toString).sorted.toSeq ==
      n.collect().map(_.toString).sorted.toSeq)
  }

  test("applyChanges plan: the snapshot is not shuffled by the change window") {
    val s = snap((1L, "a", 10L)).repartition(4)
    val c = changes((1L, "a2", 11L, "U", 1L))
    val plan = ChangeCapture.applyChanges(s, c, Seq("k"))
      .queryExecution.executedPlan.toString
    // the window runs over the DELTA only; the snapshot side joins via
    // broadcast (small delta) or one exchange — never a sort of the snapshot
    assert(plan.contains("Window"), plan)
  }

  test("deltaJoin: V0 ∪ ΔV is exactly the recomputed join; terms are disjoint") {
    import spark.implicits._
    val a = Seq((1L, "a1"), (2L, "a2"), (3L, "a3"), (4L, "a4")).toDF("k", "av")
    val b = Seq((1L, "b1"), (1L, "b1x"), (2L, "b2"), (3L, "b3"), (5L, "b5")).toDF("k", "bv")
    // arbitrary old/new splits of BOTH sides
    val aOld = a.where(col("k") <= 2); val aNew = a.where(col("k") > 2)
    val bOld = b.where(col("bv") =!= "b1x" && col("k") <= 2)
    val bNew = b.where(!(col("bv") =!= "b1x" && col("k") <= 2))
    val v0 = aOld.join(bOld, Seq("k"))
    val dv = ChangeCapture.deltaJoin(aOld, aNew, bOld, bNew, Seq("k"))
    val maintained = v0.unionByName(dv)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    val full = a.join(b, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    assert(maintained.toSeq == full.toSeq)
    // disjointness: appends need no dedup — ΔV is exactly the complement of V0
    assert(dv.count() == full.length - v0.count())
  }
}
