package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

import graft.ops.EventAnalytics

class StreamingSurvivalMonitorSpec extends SparkSpec {

  private def spans(rows: (Long, Boolean, Boolean)*) = {
    import spark.implicits._
    rows.toDF("dur", "ev", "arm")
  }

  private val rnd = new scala.util.Random(127)
  private def randomSpans(n: Int, seedShift: Int) = spans(
    (0 until n).map { i =>
      ((rnd.nextInt(30) + seedShift).toLong, rnd.nextInt(10) < 7, i % 2 == 0)
    }: _*)

  test("merged incremental state ≡ whole-stream survivalPartials; every serving face ≡ its batch FromStates twin") {
    val work = tempDir("graft-survmon")
    val mon = StreamingSurvivalMonitor(spark, s"$work/state", binWidth = 4L)
    val b0 = randomSpans(80, 0)
    val b1 = randomSpans(60, 5)
    mon.ingestBatch(b0, 0L)
    mon.ingestBatch(b1, 1L)
    val whole = b0.unionByName(b1)

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    for (arm <- Seq(true, false)) {
      val batchState = EventAnalytics.survivalPartials(
        whole.where(col("arm") === arm), col("dur"), col("ev"), binWidth = 4L)
      assert(rows(mon.stateOf(arm)) == rows(batchState), s"arm=$arm state")
      assert(rows(mon.kaplanMeier(arm)) ==
        rows(EventAnalytics.kaplanMeierFromState(batchState)), s"arm=$arm KM")
    }
    val stA = EventAnalytics.survivalPartials(
      whole.where(col("arm")), col("dur"), col("ev"), binWidth = 4L)
    val stB = EventAnalytics.survivalPartials(
      whole.where(!col("arm")), col("dur"), col("ev"), binWidth = 4L)
    assert(rows(mon.logRank()) == rows(EventAnalytics.logRankFromStates(stA, stB)))
    assert(rows(mon.gehanWilcoxon()) ==
      rows(EventAnalytics.gehanWilcoxonFromStates(stA, stB)))
    assert(rows(mon.flemingHarrington(1.0, 1.0)) ==
      rows(EventAnalytics.flemingHarringtonFromStates(stA, stB, 1.0, 1.0)))
    assert(rows(mon.cox(ties = "efron")) ==
      rows(EventAnalytics.coxFromStates(stA, stB, ties = "efron")))
    assert(rows(mon.coxBaseline(ties = "efron")) ==
      rows(EventAnalytics.coxBaselineFromStates(stA, stB, ties = "efron")))
  }

  test("empty store serves empty faces (no crash before first ingest); compact preserves every face") {
    val work = tempDir("graft-survmon-empty")
    val mon = StreamingSurvivalMonitor(spark, s"$work/state", binWidth = 4L)
    // nothing ingested yet: faces render empty, never PATH_NOT_FOUND
    assert(mon.stateOf(true).collect().isEmpty)
    assert(mon.kaplanMeier(false).collect().isEmpty)
    // the Mantel–Cox agg over zero event rows is the all-NULL row
    val lrEmpty = mon.logRank().collect().head
    assert(lrEmpty.isNullAt(0) && lrEmpty.isNullAt(6), lrEmpty.toString)
    // a no-event store cannot fit: the baseline face is the empty frame
    assert(mon.coxBaseline().collect().isEmpty)
    // an all-filtered batch (null ev) writes nothing and still serves
    mon.ingestBatch(spans((1L, true, true)).withColumn("ev",
      org.apache.spark.sql.functions.lit(null).cast("boolean")), 0L)
    assert(mon.stateOf(true).collect().isEmpty)

    // compaction: many batches → one partition, every face unchanged
    mon.ingestBatch(randomSpans(40, 0), 1L)
    mon.ingestBatch(randomSpans(40, 3), 2L)
    mon.ingestBatch(randomSpans(40, 7), 3L)
    def faces() = (
      mon.stateOf(true).collect().map(_.toString).sorted.toSeq,
      mon.logRank().collect().map(_.toString).toSeq,
      mon.flemingHarrington(1.0, 1.0).collect().map(_.toString).toSeq)
    val before = faces()
    mon.compact()
    assert(faces() == before)
    val parts = new java.io.File(s"$work/state").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("ingest_batch="))
    assert(parts.length == 1 && parts.head.getName == "ingest_batch=-1", parts.mkString(","))

    // compaction under a session-wide DYNAMIC partitionOverwriteMode — the
    // deployment conf every ingestBatch itself requests. An unpinned
    // Overwrite+partitionBy would then rewrite ONLY ingest_batch=-1 and
    // leave the batch partitions in place: every face double-counts.
    val prevMode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    try {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      mon.ingestBatch(randomSpans(40, 2), 4L)
      val withNew = faces()
      mon.compact()
      assert(faces() == withNew, "dynamic session conf must not break compaction")
      val parts2 = new java.io.File(s"$work/state").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("ingest_batch="))
      assert(parts2.length == 1 && parts2.head.getName == "ingest_batch=-1",
        parts2.mkString(","))
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prevMode)
    graft.Caches.clear()
  }

  test("replaying a batch id overwrites its prior attempt; straddling bins merge") {
    val work = tempDir("graft-survmon2")
    val mon = StreamingSurvivalMonitor(spark, s"$work/state", binWidth = 4L)
    mon.ingestBatch(spans((1L, true, true), (2L, false, true)), 0L)
    mon.ingestBatch(spans((3L, true, true), (9L, true, true)), 1L)
    val before = mon.stateOf(true).collect().map(_.toString).sorted.toSeq
    // bin 0 straddles both batches: 2 events + 1 censored merged
    val got = mon.stateOf(true).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(0L -> ((2L, 1L)), 2L -> ((1L, 0L))), got.toString)
    mon.ingestBatch(spans((3L, true, true), (9L, true, true)), 1L) // replay
    val after = mon.stateOf(true).collect().map(_.toString).sorted.toSeq
    assert(after == before)
  }

  test("causeCol: per-arm CIF off the streamed state ≡ batch competingPartials; any-cause faces unchanged") {
    import spark.implicits._
    val work = tempDir("graft-survmon3")
    val mon = StreamingSurvivalMonitor(spark, s"$work/state", binWidth = 2L,
      causeCol = Some("cause"))
    val rows0 = (0 until 120).map { i =>
      val ev = rnd.nextInt(10) < 7
      (rnd.nextInt(16).toLong, ev, i % 2 == 0,
        if (ev) (if (rnd.nextBoolean()) "x" else "y") else null)
    }
    val df = rows0.toDF("dur", "ev", "arm", "cause")
    mon.ingestBatch(df.where(col("dur") < 8), 0L)
    mon.ingestBatch(df.where(col("dur") >= 8), 1L)
    def s(d: org.apache.spark.sql.DataFrame) = d.collect().map(_.toString).sorted.toSeq
    val batchState = EventAnalytics.competingPartials(
      df.where(col("arm")), col("dur"),
      when(col("ev"), col("cause")).otherwise(lit(null)), binWidth = 2L)
    assert(s(mon.competingStateOf(true)) == s(batchState))
    assert(s(mon.cumulativeIncidence(true)) ==
      s(EventAnalytics.cumulativeIncidenceFromState(batchState)))
    // the plain survival face still reads any-cause events
    val surv = EventAnalytics.survivalPartials(
      df.where(!col("arm")), col("dur"), col("ev"), binWidth = 2L)
    assert(s(mon.stateOf(false)) == s(surv))
  }
}
