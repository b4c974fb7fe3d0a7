package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class EventAnalyticsSpec extends SparkSpec {

  private def events(rows: (Long, String, Long)*) = {
    import spark.implicits._
    rows.zipWithIndex
      .map { case ((u, t, ts), i) => (i.toLong, u, t, ts) }
      .toDF("event_id", "user_id", "event_type", "ts")
  }

  test("funnel: complete, partial, window-bound and out-of-order users") {
    val df = events(
      // user 1: full funnel in order
      (1L, "view", 100L), (1L, "click", 200L), (1L, "purchase", 300L),
      // user 2: click BEFORE the anchor view never counts; purchase without click stalls at 1
      (2L, "click", 50L), (2L, "view", 100L), (2L, "purchase", 300L),
      // user 3: completes but the purchase lands past anchor+window → stalls at 2
      (3L, "view", 100L), (3L, "click", 150L), (3L, "purchase", 1200L),
      // user 4: never starts (no view)
      (4L, "click", 100L), (4L, "purchase", 200L),
      // user 5: two views — the EARLIEST anchors; second click inside window wins by min
      (5L, "view", 100L), (5L, "view", 500L), (5L, "click", 600L),
      (5L, "click", 700L), (5L, "purchase", 800L))
    val got = EventAnalytics.funnel(df, Seq("view", "click", "purchase"), windowTs = 1000L)
      .collect().map(r => r.getLong(0) -> ((r.get(1), r.get(2), r.get(3), r.getLong(4)))).toMap
    assert(got(1L) == ((100L, 200L, 300L, 3L)))
    assert(got(2L) == ((100L, null, null, 1L)))
    assert(got(3L) == ((100L, 150L, null, 2L)))
    assert(!got.contains(4L))
    assert(got(5L) == ((100L, 600L, 800L, 3L)))
  }

  test("cohortRetention: epoch-aligned buckets, distinct-per-bucket users, rates") {
    // bucket = 100; users 1,2 start in cohort 0, user 3 in cohort 2
    val df = events(
      (1L, "view", 10L), (1L, "view", 20L), (1L, "view", 110L), (1L, "view", 310L),
      (2L, "view", 50L), (2L, "view", 120L),
      (3L, "view", 250L), (3L, "view", 260L))
    val got = EventAnalytics.cohortRetention(df, bucketTs = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got((0L, 0L)) == ((2L, 2L, 1.0)))   // both users active in their cohort day
    assert(got((0L, 1L)) == ((2L, 2L, 1.0)))   // both return next bucket
    assert(got((0L, 3L)) == ((1L, 2L, 0.5)))   // only user 1 at offset 3
    assert(got((2L, 0L)) == ((1L, 1L, 1.0)))   // user 3's duplicate bucket counts once
    assert(!got.contains((0L, 2L)))            // nobody from cohort 0 at offset 2
  }

  test("transitionCounts: per-user ordering with id tie-break, probabilities sum to 1") {
    import spark.implicits._
    val df = Seq(
      // user 1: a -> b -> a (ts tie at 200 resolved by event_id: 1 before 2)
      (0L, 1L, "a", 100L), (1L, 1L, "b", 200L), (2L, 1L, "a", 200L),
      // user 2: a -> c
      (3L, 2L, "a", 100L), (4L, 2L, "c", 200L),
      // user 3: single event — no transitions
      (5L, 3L, "a", 100L)
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = EventAnalytics.transitionCounts(df)
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got == Map(
      ("a", "b") -> ((1L, 0.5)),
      ("a", "c") -> ((1L, 0.5)),
      ("b", "a") -> ((1L, 1.0))))
  }

  test("hittingProbability: hand chain, dangling target self-loops, fixed-step contract") {
    import spark.implicits._
    // A → {T, B} evenly, B → A, T dangling: h3 = (A 0.75, B 0.5, T 1)
    val tc = Seq(("A", "T", 1L), ("A", "B", 1L), ("B", "A", 1L))
      .toDF("from_type", "to_type", "n")
    val got = EventAnalytics.hittingProbability(tc, target = "T", steps = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("A" -> 0.75, "B" -> 0.5, "T" -> 1.0))
    // more steps only raise hitting mass; all bounded by 1
    val g6 = EventAnalytics.hittingProbability(tc, target = "T", steps = 6)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(g6("A") >= got("A") && g6("B") >= got("B") && g6.values.forall(_ <= 1.0))
    graft.Caches.clear()
  }

  test("ewmaSmooth: exact dyadic decay, gap bucket surfaces with n=0, tail trimmed") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // buckets (width 10): n = [4, 2, gap, 8]; maxLag 2 → norm = 1.75
    val ts = Seq.fill(4)(1L) ++ Seq.fill(2)(11L) ++ Seq.fill(8)(31L)
    val df = ts.map(t => ("a", t)).toDF("event_type", "ts")
    val got = EventAnalytics.ewmaSmooth(df, bucketTs = 10L, maxLag = 2)
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == Set(0L, 1L, 2L, 3L)) // nothing past the last bucket
    assert(got(0L) == ((4L, r6(4.0 / 1.75))))
    assert(got(1L) == ((2L, r6((2.0 + 2.0) / 1.75))))
    assert(got(2L) == ((0L, r6((1.0 + 1.0) / 1.75)))) // gap: decayed level, zero events
    assert(got(3L) == ((8L, r6((8.0 + 0.5) / 1.75))))
    // partitioning cannot move the dyadic-exact sums
    val g17 = EventAnalytics.ewmaSmooth(df.repartition(17), bucketTs = 10L, maxLag = 2)
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(g17 == got)
    graft.Caches.clear()
  }

  test("seasonalDecompose: odd and 2×MA even trends, phase means, gap voids trend") {
    import spark.implicits._
    // bucketTs=10: counts per bucket [3,6,3,3,6,3] — pure period-3 signal
    def burst(b: Long, k: Int) = Seq.tabulate(k)(i => (b * 10 + i, "a"))
    val ev = (burst(0, 3) ++ burst(1, 6) ++ burst(2, 3) ++ burst(3, 3) ++
      burst(4, 6) ++ burst(5, 3)).toDF("ts", "event_type")
    val got = EventAnalytics.seasonalDecompose(ev, bucketTs = 10, period = 3)
      .collect().map(r => r.getLong(1) ->
        ((Option(r.get(3)), Option(r.get(4)), Option(r.get(5))))).toMap
    assert(got(0L) == ((None, Some(-1.0), None)))            // edge: no trend
    assert(got(1L) == ((Some(4.0), Some(2.0), Some(0.0))))   // interior, phase 1 high
    assert(got(2L) == ((Some(4.0), Some(-1.0), Some(0.0))))
    assert(got(4L) == ((Some(4.0), Some(2.0), Some(0.0))))
    assert(got(5L) == ((None, Some(-1.0), None)))
    // even period: 2×MA weighs the frame ends half — [1,3,1,3,1] decomposes flat
    val ev2 = (burst(0, 1) ++ burst(1, 3) ++ burst(2, 1) ++ burst(3, 3) ++ burst(4, 1))
      .toDF("ts", "event_type")
    val g2 = EventAnalytics.seasonalDecompose(ev2, bucketTs = 10, period = 2)
      .collect().map(r => r.getLong(1) ->
        ((Option(r.get(3)), Option(r.get(4)), Option(r.get(5))))).toMap
    assert(g2(1L) == ((Some(2.0), Some(1.0), Some(0.0))))
    assert(g2(2L) == ((Some(2.0), Some(-1.0), Some(0.0))))
    assert(g2(3L) == ((Some(2.0), Some(1.0), Some(0.0))))
    // a missing bucket voids the trend window that would span it
    val gap = (burst(0, 3) ++ burst(1, 6) ++ burst(3, 3)).toDF("ts", "event_type")
    val g3 = EventAnalytics.seasonalDecompose(gap, bucketTs = 10, period = 3)
      .collect().map(r => r.getLong(1) -> Option(r.get(3))).toMap
    assert(g3.values.forall(_.isEmpty))
    // partitioning cannot move the decimal-summed phase means
    val re = EventAnalytics.seasonalDecompose(ev.repartition(13), bucketTs = 10, period = 3)
      .collect().map(r => r.getLong(1) ->
        ((Option(r.get(3)), Option(r.get(4)), Option(r.get(5))))).toMap
    assert(re == got)
  }

  test("markovStationary: fixed points, absorbing self-loop, convergence, repartition-stable") {
    import spark.implicits._
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // doubly-stochastic cycle: uniform is a fixed point at every iteration
    val cycle = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L)).toDF("from_type", "to_type", "n")
    assert(asMap(EventAnalytics.markovStationary(cycle, iterations = 7)) ==
      Map("a" -> 0.333333, "b" -> 0.333333, "c" -> 0.333333))
    // absorbing: b has no outgoing row → self-loop parks all mass there
    val absorb = Seq(("a", "b", 5L)).toDF("from_type", "to_type", "n")
    assert(asMap(EventAnalytics.markovStationary(absorb, iterations = 3)) ==
      Map("a" -> 0.0, "b" -> 1.0))
    // mixing chain: a→a 0.5 / a→b 0.5, b→a 1.0 — stationary (2/3, 1/3)
    val mix = Seq(("a", "a", 1L), ("a", "b", 1L), ("b", "a", 2L)).toDF("from_type", "to_type", "n")
    val m = asMap(EventAnalytics.markovStationary(mix, iterations = 40))
    assert(math.abs(m("a") - 2.0 / 3) < 1e-5 && math.abs(m("b") - 1.0 / 3) < 1e-5)
    assert(math.abs(m.values.sum - 1.0) < 1e-5)
    // partitioning cannot move the decimal-summed rounds
    assert(asMap(EventAnalytics.markovStationary(mix.repartition(13), iterations = 40)) == m)
    graft.Caches.clear()
  }

  test("timeSeries: trailing MA over present buckets, per series, ordered") {
    import spark.implicits._
    val df = Seq(
      // series a: buckets 0 (2 events), 1 (4), 3 (6) — bucket 2 absent
      (1L, "a", 5L), (2L, "a", 9L),
      (3L, "a", 10L), (4L, "a", 12L), (5L, "a", 15L), (6L, "a", 19L),
      (7L, "a", 30L), (8L, "a", 31L), (9L, "a", 32L),
      (10L, "a", 33L), (11L, "a", 34L), (12L, "a", 35L),
      // series b: one bucket
      (13L, "b", 0L)
    ).toDF("event_id", "event_type", "ts")
    val got = EventAnalytics.timeSeries(df, bucketTs = 10L, maBuckets = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got == Map(
      ("a", 0L) -> ((2L, 2.0)),
      ("a", 1L) -> ((4L, 3.0)),
      // bucket 3's MA partner is bucket 1 (present-bucket row frame, not calendar)
      ("a", 3L) -> ((6L, 5.0)),
      ("b", 0L) -> ((1L, 1.0))))
  }

  test("changeIntervals: change points only, [from, to) chaining, open tail, tie-break") {
    import spark.implicits._
    val df = Seq(
      // user 1: A A B A — runs collapse, each interval ends where the next begins
      (1L, "A", 10L, 1L), (1L, "A", 20L, 2L), (1L, "B", 30L, 3L), (1L, "A", 40L, 4L),
      // user 2: same-ts tie broken by event_id → B then A is a change
      (2L, "B", 10L, 5L), (2L, "A", 10L, 6L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val got = EventAnalytics.changeIntervals(df, Seq("user_id"), "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    assert(got == Set(
      (1L, "A", 10L, Some(30L)),
      (1L, "B", 30L, Some(40L)),
      (1L, "A", 40L, None),
      (2L, "B", 10L, Some(10L)),
      (2L, "A", 10L, None)))
  }

  test("changeIntervals: intervals tile the timeline per key; partition-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val df = (1 to 300).map(i =>
      (rnd.nextInt(5).toLong, s"v${rnd.nextInt(3)}", rnd.nextInt(1000).toLong, i.toLong))
      .toDF("user_id", "event_type", "ts", "event_id")
    val a = EventAnalytics.changeIntervals(df, Seq("user_id"), "event_type").collect()
    val b = EventAnalytics.changeIntervals(df.repartition(13), Seq("user_id"), "event_type")
      .collect()
    assert(a.map(_.toString).sorted.toSeq == b.map(_.toString).sorted.toSeq)
    // per key: exactly one open interval; each valid_to equals the next valid_from
    a.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.count(_.isNullAt(3)) == 1)
      val sorted = rows.sortBy(r => (r.getLong(2), if (r.isNullAt(3)) Long.MaxValue else r.getLong(3)))
      sorted.sliding(2).foreach {
        case Array(x, y) => assert(x.getLong(3) == y.getLong(2))
        case _           =>
      }
    }
  }

  test("anomalies: warm-up NULL, constant-window NULL, spike z hand-computed") {
    // one series, bucketTs=10: buckets 0..5 with counts 2,2,2,2,2,12
    val rows = (0 to 4).flatMap(b => Seq.fill(2)((1L, "t", b * 10L + 1L))) ++
      Seq.fill(12)((1L, "t", 51L))
    val df = events(rows: _*)
    val got = EventAnalytics.anomalies(df, bucketTs = 10L, trailing = 4,
        threshold = 2.0, minPrior = 3)
      .collect().map(r => r.getLong(1) -> ((
        r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3),
        if (r.isNullAt(4)) null else r.getBoolean(4)))).toMap
    // buckets 0-2: fewer than 3 prior buckets → warm-up NULL
    assert(got(0L) == ((2L, null, null)) && got(2L) == ((2L, null, null)))
    // buckets 3-4: enough priors but constant window → zero variance → NULL
    assert(got(3L) == ((2L, null, null)) && got(4L) == ((2L, null, null)))
    // bucket 5: priors (2,2,2,2) constant too → NULL even for the spike
    assert(got(5L)._1 == 12L && got(5L)._2 == null)
  }

  test("anomalies: varying trailing window yields the exact closed-form z") {
    // counts 1,2,3,4 then a spike 10: priors for bucket 4 = (1,2,3,4)
    // m=4 s1=10 s2=30 → varN=4*30-100=20, z=(10*4-10)/sqrt(20)=30/4.472136≈6.708204
    val rows = (0 to 3).flatMap(b => Seq.fill(b + 1)((1L, "t", b * 10L + 1L))) ++
      Seq.fill(10)((1L, "t", 41L))
    val df = events(rows: _*)
    val got = EventAnalytics.anomalies(df, bucketTs = 10L, trailing = 4,
        threshold = 2.0, minPrior = 3)
      .collect().map(r => r.getLong(1) -> r).toMap
    assert(got(4L).getDouble(3) == 6.708204)
    assert(got(4L).getBoolean(4))
    // bucket 3 (priors 1,2,3): m=3 s1=6 s2=14 → varN=6, z=(4*3-6)/sqrt(6)=2.449490
    assert(got(3L).getDouble(3) == 2.44949)
    assert(got(3L).getBoolean(4))
  }

  test("anomalies: the window aggregates bucket counts, not raw events") {
    val df = events((1 to 100).map(i => (1L, "t", i.toLong)): _*)
    val out = EventAnalytics.anomalies(df, bucketTs = 10L, trailing = 4)
    val plan = out.queryExecution.executedPlan.toString
    // the HashAggregate must sit BELOW the Window in the plan (window input
    // is the |buckets|-row frame)
    val aggIdx = plan.indexOf("HashAggregate")
    val winIdx = plan.indexOf("Window")
    assert(aggIdx >= 0 && winIdx >= 0 && winIdx < aggIdx,
      s"window must run over aggregated buckets:\n$plan")
  }

  test("coVisitation: canonical pairs, support filter, cosine score, repeat events collapse") {
    import spark.implicits._
    // users→items: u1:{1,2}, u2:{1,2}, u3:{1,3} (u3's duplicate event collapses)
    val df = Seq(
      (1L, 1L), (1L, 2L),
      (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 3L), (3L, 3L)).toDF("user_id", "item")
    val got = EventAnalytics.coVisitation(df, col("item"), minSupport = 1L)
      .collect().map(r => (r.getLong(1), r.getLong(0)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // (1,2): n_ab 2, n_1=3, n_2=2 → 2/sqrt(6)=0.816497; (1,3): 1/sqrt(3)=0.57735
    assert(got((1L, 2L)) == ((2L, 3L, 2L, 0.816497)))
    assert(got((1L, 3L)) == ((1L, 3L, 1L, 0.57735)))
    assert(!got.contains((2L, 3L)), "no shared user for (2,3)")
    // support filter drops singletons
    val sup = EventAnalytics.coVisitation(df, col("item"), minSupport = 2L)
      .collect().map(r => (r.getLong(1), r.getLong(0))).toSet
    assert(sup == Set((1L, 2L)))
    graft.Caches.clear()
  }

  test("coVisitation: the hub cap bounds a pathological user's pair fanout") {
    import spark.implicits._
    val df = (1L to 50L).map(i => (1L, i)).toDF("user_id", "item")
    val got = EventAnalytics.coVisitation(df, col("item"),
      minSupport = 1L, maxItemsPerUser = 5)
    // capped to the 5 lowest item ids → C(5,2)=10 pairs
    assert(got.count() == 10L)
    assert(got.agg(max(col("item_b"))).head().getLong(0) == 5L)
    graft.Caches.clear()
  }

  test("rollingDistinct: window union of users, dau exact, repeat events collapse") {
    // bucketTs=10, window=3. users per bucket: b0:{1,2}, b1:{2}, b3:{3}
    val df = events(
      (1L, "t", 1L), (2L, "t", 2L), (2L, "t", 3L), // b0 (user 2 twice)
      (2L, "t", 11L),                               // b1
      (3L, "t", 31L))                               // b3
    val got = EventAnalytics.rollingDistinct(df, bucketTs = 10L, window = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // b0: dau 2, rolling {1,2}=2; b1: dau 1, rolling b0∪b1 {1,2}=2;
    // b3: dau 1, rolling b1..b3 = {2,3}=2 (b2 absent, not emitted)
    assert(got == Map(0L -> ((2L, 2L)), 1L -> ((1L, 2L)), 3L -> ((1L, 2L))))
  }

  test("topPaths: ordered steps, short users included, counts and tie-break") {
    val df = events(
      (1L, "view", 100L), (1L, "click", 200L), (1L, "buy", 300L),
      (2L, "view", 10L), (2L, "click", 20L), (2L, "buy", 30L),
      (3L, "view", 5L),                       // short journey: its own path
      (4L, "click", 1L), (4L, "view", 2L))    // order by ts, not insertion
    val got = EventAnalytics.topPaths(df, k = 10, maxSteps = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(
      ("view>click>buy", 2L),
      ("click>view", 1L),     // tie 1-1 broken by path text
      ("view", 1L)))
  }

  test("topPaths: maxSteps truncates; k cuts at the (n desc, path) order") {
    val df = events(
      (1L, "a", 1L), (1L, "b", 2L), (1L, "c", 3L), (1L, "d", 4L),
      (2L, "a", 1L), (2L, "b", 2L))
    val got = EventAnalytics.topPaths(df, k = 1, maxSteps = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a>b", 2L)), "both users share the 2-step prefix")
  }

  test("funnel plan prunes the scan per step and never shuffles raw events") {
    val df = events((1L, "view", 100L), (1L, "click", 200L), (1L, "purchase", 300L))
    val out = EventAnalytics.funnel(df, Seq("view", "click", "purchase"), windowTs = 1000L)
    // every row is one user's scalar stage times — assert row identity holds
    assert(out.columns.toSeq ==
      Seq("user_id", "ts_1", "ts_2", "ts_3", "steps_completed"))
  }

  test("crossCorrelation: shifted copy peaks at its lag; constant side → NULL") {
    import spark.implicits._
    // y is x shifted by +2 buckets: corr at lag 2 must be exactly 1
    val base = (0L to 20L).map(t => (t, math.sin(t.toDouble) * 10 + t))
    val x = base.toDF("t", "x")
    val y = base.map { case (t, v) => (t + 2, v) }.toDF("t", "y")
    val got = EventAnalytics.crossCorrelation(x, y, maxLag = 3)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) null else r.getDouble(2))).toMap
    assert(got(2L) == 1.0)
    assert(got.keySet == (-1L to 3L).toSet ++ Set(-3L, -2L)) // all lags with overlap
    // a constant series has zero variance → NULL at every lag
    val const = (0L to 20L).map(t => (t, 5.0)).toDF("t", "y")
    val g2 = EventAnalytics.crossCorrelation(x, const, maxLag = 1)
      .collect().map(r => r.get(2))
    assert(g2.forall(_ == null))
  }

  test("kaplanMeier: hand-computed curve; censoring reduces risk set without an event") {
    import spark.implicits._
    val obs = Seq((1L, true), (1L, true), (2L, false), (3L, true)).toDF("dur", "ev")
    val got = EventAnalytics.kaplanMeier(obs, col("dur"), col("ev"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got(1L) == ((4L, 2L, 0L, 0.5)))   // S = 1 − 2/4
    assert(got(2L) == ((2L, 0L, 1L, 0.5)))   // censoring: no survival drop
    assert(got(3L) == ((1L, 1L, 0L, 0.0)))   // last subject churns
  }

  test("survivalPartials/survivalMerge: binned counts; split-and-merge equals whole") {
    import spark.implicits._
    val obs = Seq((0L, true), (4L, true), (5L, false), (9L, true), (14L, false))
      .toDF("dur", "ev")
    // binWidth 5: bins {0: d=2 c=0, 1: d=1 c=1, 2: d=0 c=1}
    val st = EventAnalytics.survivalPartials(obs, col("dur"), col("ev"), binWidth = 5L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(st == Map(0L -> ((2L, 0L)), 1L -> ((1L, 1L)), 2L -> ((0L, 1L))))
    // additive merge: arbitrary split of the subjects reassembles the state
    val h1 = EventAnalytics.survivalPartials(
      obs.where(col("dur") < 5), col("dur"), col("ev"), binWidth = 5L)
    val h2 = EventAnalytics.survivalPartials(
      obs.where(col("dur") >= 5), col("dur"), col("ev"), binWidth = 5L)
    val merged = EventAnalytics.survivalMerge(Seq(h1, h2))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(merged == st)
  }

  test("gehanWilcoxon: brute-force weighted O-E/V; FromStates ≡ raw on the binned axis") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val subs = (0 until 90).map { i =>
      val a = i % 2 == 0
      ((if (a) rnd.nextInt(18) else rnd.nextInt(30)).toLong, rnd.nextInt(5) < 4, a)
    }
    val df = subs.toDF("dur", "ev", "arm")
    val r = EventAnalytics.gehanWilcoxonTest(df, col("dur"), col("ev"), col("arm"))
      .collect().head
    // brute: per event time, nj-weighted hypergeometric O−E and nj²V
    val times = subs.filter(_._2).map(_._1).distinct.sorted
    var oe = 0.0; var vv = 0.0
    times.foreach { t =>
      val atRisk = subs.filter(_._1 >= t)
      val n1 = atRisk.count(_._3).toDouble; val n0 = atRisk.size - n1; val nj = n1 + n0
      val d1 = subs.count(s => s._1 == t && s._2 && s._3).toDouble
      val dj = subs.count(s => s._1 == t && s._2).toDouble
      oe += nj * (d1 - dj * n1 / nj)
      if (nj > 1) vv += nj * nj * (dj * n1 / nj * n0 / nj * (nj - dj) / (nj - 1))
    }
    assert(math.abs(r.getDouble(4) - oe) < 1e-6, s"oe ${r.getDouble(4)} vs $oe")
    assert(math.abs(r.getDouble(5) - vv) < 1e-5, s"v ${r.getDouble(5)} vs $vv")
    // binned FromStates face ≡ raw test on the pre-binned axis
    val bw = 4L
    val fromStates = EventAnalytics.gehanWilcoxonFromStates(
      EventAnalytics.survivalPartials(df.where(col("arm")), col("dur"), col("ev"), bw),
      EventAnalytics.survivalPartials(df.where(!col("arm")), col("dur"), col("ev"), bw))
      .collect().head
    val raw = EventAnalytics.gehanWilcoxonTest(
      df.select((col("dur") / bw).cast("long").as("t"), col("ev"), col("arm")),
      col("t"), col("ev"), col("arm")).collect().head
    assert(fromStates == raw)
  }

  test("nelsonAalenFromState ≡ nelsonAalen on the binned axis") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val rows = (0 until 70).map(_ => (rnd.nextInt(40).toLong, rnd.nextBoolean()))
      .toDF("dur", "ev")
    val bw = 6L
    val st = EventAnalytics.nelsonAalenFromState(
      EventAnalytics.survivalPartials(rows, col("dur"), col("ev"), bw))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSet
    val raw = EventAnalytics.nelsonAalen(
      rows.select((col("dur") / bw).cast("long").as("t"), col("ev")), col("t"), col("ev"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSet
    assert(st == raw)
  }

  test("kaplanMeierFromState ≡ kaplanMeier on the binned axis; logRankFromStates ≡ logRankTest") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val rows = (0 until 80).map { i =>
      (rnd.nextInt(40).toLong, rnd.nextBoolean(), i % 2 == 0)
    }.toDF("dur", "ev", "arm")
    val bw = 7L
    // the state faces must equal the raw estimators fed pre-binned durations
    val binned = rows.select((col("dur") / bw).cast("long").as("t"), col("ev"), col("arm"))
    val kmState = EventAnalytics.kaplanMeierFromState(
      EventAnalytics.survivalPartials(rows, col("dur"), col("ev"), bw))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    val kmRaw = EventAnalytics.kaplanMeier(binned, col("t"), col("ev"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    assert(kmState == kmRaw)
    val lrState = EventAnalytics.logRankFromStates(
      EventAnalytics.survivalPartials(rows.where(col("arm")), col("dur"), col("ev"), bw),
      EventAnalytics.survivalPartials(rows.where(!col("arm")), col("dur"), col("ev"), bw))
      .collect().head
    val lrRaw = EventAnalytics.logRankTest(binned, col("t"), col("ev"), col("arm"))
      .collect().head
    assert(lrState == lrRaw)
  }

  test("holtLinear: hand-computed level/trend/forecast; tracks a pure linear ramp exactly in the limit") {
    import spark.implicits._
    // x = 10, 12, 11: l1=10 b1=0; l2=.5*12+.5*10=11, b2=.25*1+0=.25, f2=10;
    // l3=.5*11+.5*11.25=11.125, b3=.25*.125+.75*.25=.21875, f3=11.25
    val s = Seq((1L, 10.0), (2L, 12.0), (3L, 11.0)).toDF("t", "x")
    val got = EventAnalytics.holtLinear(s, col("t"), col("x"), alpha = 0.5, beta = 0.25)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(2), r.getDouble(3), if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    assert(got(1L) == ((10.0, 0.0, None)))
    assert(got(2L) == ((11.0, 0.25, Some(10.0))))
    assert(got(3L) == ((11.125, 0.21875, Some(11.25))))
    // a long pure ramp: the 1-step forecast converges onto the ramp
    val ramp = (1L to 120L).map(t => (t, 3.0 * t)).toDF("t", "x")
    val tail = EventAnalytics.holtLinear(ramp, col("t"), col("x"))
      .where(col("t") === 120L).collect().head
    assert(math.abs(tail.getDouble(4) - 360.0) < 0.01,
      s"converged forecast should sit on the ramp: ${tail.getDouble(4)}")
  }

  test("coxBinary: Newton beta maximizes the Breslow partial likelihood (ternary-search reference)") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // arm A hazard genuinely higher: shorter durations, more events
    val subjects = (0 until 120).map { i =>
      val a = i % 2 == 0
      val dur = (if (a) rnd.nextInt(20) else rnd.nextInt(35)).toLong
      (dur, rnd.nextInt(10) < 8, a)
    }
    val got = EventAnalytics.coxBinary(
      subjects.toDF("dur", "ev", "arm"), col("dur"), col("ev"), col("arm"))
      .collect().head
    assert(got.getBoolean(9), "must converge")
    val beta = got.getDouble(4)

    // independent reference: maximize logL(β) = Σⱼ [d1ⱼβ − dⱼ·ln(n0ⱼ+n1ⱼe^β)]
    // computed straight from the subject list, by ternary search
    val times = subjects.filter(_._2).map(_._1).distinct.sorted
    def logL(b: Double): Double = times.map { t =>
      val atRisk = subjects.filter(_._1 >= t)
      val n1 = atRisk.count(_._3).toDouble
      val n0 = atRisk.size - n1
      val d1 = subjects.count(s => s._1 == t && s._2 && s._3).toDouble
      val d  = subjects.count(s => s._1 == t && s._2).toDouble
      d1 * b - d * math.log(n0 + n1 * math.exp(b))
    }.sum
    var lo = -3.0; var hi = 3.0
    (0 until 200).foreach { _ =>
      val m1 = lo + (hi - lo) / 3; val m2 = hi - (hi - lo) / 3
      if (logL(m1) < logL(m2)) lo = m1 else hi = m2
    }
    val ref = (lo + hi) / 2
    assert(math.abs(beta - ref) < 1e-3, s"newton $beta vs grid $ref")
    assert(beta > 0, "arm A has the higher hazard by construction")
  }

  test("coxBinary ties=efron: Newton beta maximizes the Efron partial likelihood; differs from Breslow under ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    // coarse duration grid on purpose: heavy ties are where Efron ≠ Breslow
    val subjects = (0 until 120).map { i =>
      val a = i % 2 == 0
      val dur = (if (a) rnd.nextInt(5) else rnd.nextInt(8)).toLong
      (dur, rnd.nextInt(10) < 8, a)
    }
    val got = EventAnalytics.coxBinary(
      subjects.toDF("dur", "ev", "arm"), col("dur"), col("ev"), col("arm"),
      ties = "efron").collect().head
    assert(got.getBoolean(9), "must converge")
    val beta = got.getDouble(4)

    // independent reference: maximize the Efron log partial likelihood
    // logL(β) = Σⱼ [d1ⱼβ − Σ_{l<dⱼ} ln(Sⱼ − (l/dⱼ)·Sdⱼ)] straight from the
    // subject list, by ternary search
    val times = subjects.filter(_._2).map(_._1).distinct.sorted
    def logL(b: Double): Double = times.map { t =>
      val eb = math.exp(b)
      val atRisk = subjects.filter(_._1 >= t)
      val n1 = atRisk.count(_._3).toDouble
      val n0 = atRisk.size - n1
      val d1 = subjects.count(s => s._1 == t && s._2 && s._3).toDouble
      val d0 = subjects.count(s => s._1 == t && s._2 && !s._3).toDouble
      val d  = d1 + d0
      val s  = n0 + n1 * eb
      val sd = d0 + d1 * eb
      d1 * b - (0 until d.toInt).map(l => math.log(s - (l / d) * sd)).sum
    }.sum
    var lo = -3.0; var hi = 3.0
    (0 until 200).foreach { _ =>
      val m1 = lo + (hi - lo) / 3; val m2 = hi - (hi - lo) / 3
      if (logL(m1) < logL(m2)) lo = m1 else hi = m2
    }
    val ref = (lo + hi) / 2
    assert(math.abs(beta - ref) < 1e-3, s"newton $beta vs grid $ref")

    // and it is NOT the Breslow answer on this tie-heavy grid
    val breslow = EventAnalytics.coxBinary(
      subjects.toDF("dur", "ev", "arm"), col("dur"), col("ev"), col("arm"))
      .collect().head.getDouble(4)
    assert(math.abs(beta - breslow) > 1e-4,
      s"efron $beta should differ from breslow $breslow under heavy ties")
  }

  test("coxBinary: symmetric arms give beta ~ 0; complete separation refuses a fit") {
    import spark.implicits._
    // perfectly symmetric: every (dur, ev) appears once per arm
    val sym = (1L to 30L).flatMap(t => Seq((t, t % 3 != 0, true), (t, t % 3 != 0, false)))
    val s0 = EventAnalytics.coxBinary(
      sym.toDF("dur", "ev", "arm"), col("dur"), col("ev"), col("arm")).collect().head
    assert(s0.getBoolean(9) && math.abs(s0.getDouble(4)) < 1e-6, s0.toString)
    // all events in arm A → the MLE diverges → null beta, converged=false
    val sep = Seq((1L, true, true), (2L, true, true), (3L, false, false), (4L, false, false))
    val s1 = EventAnalytics.coxBinary(
      sep.toDF("dur", "ev", "arm"), col("dur"), col("ev"), col("arm")).collect().head
    assert(!s1.getBoolean(9) && s1.isNullAt(4), s1.toString)
  }

  test("coxFromStates ≡ coxBinary on the binned axis") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val rows = (0 until 100).map { i =>
      (rnd.nextInt(50).toLong, rnd.nextBoolean(), i % 3 == 0)
    }.toDF("dur", "ev", "arm")
    val bw = 6L
    val fromStates = EventAnalytics.coxFromStates(
      EventAnalytics.survivalPartials(rows.where(col("arm")), col("dur"), col("ev"), bw),
      EventAnalytics.survivalPartials(rows.where(!col("arm")), col("dur"), col("ev"), bw))
      .collect().head
    val raw = EventAnalytics.coxBinary(
      rows.select((col("dur") / bw).cast("long").as("t"), col("ev"), col("arm")),
      col("t"), col("ev"), col("arm")).collect().head
    assert(fromStates == raw)
  }

  test("coxMulti p=1 binary covariate ≡ coxBinary (both tie modes)") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val rows = (0 until 150).map { i =>
      val a = i % 2 == 0
      ((if (a) rnd.nextInt(12) else rnd.nextInt(20)).toLong, rnd.nextInt(10) < 7, a)
    }.toDF("dur", "ev", "arm")
    for (ties <- Seq("breslow", "efron")) {
      val bin = EventAnalytics.coxBinary(
        rows, col("dur"), col("ev"), col("arm"), ties = ties).collect().head
      val multi = EventAnalytics.coxMulti(
        rows, col("dur"), col("ev"),
        Seq("arm" -> col("arm").cast("int")), ties = ties).collect().head
      assert(multi.getBoolean(8) && bin.getBoolean(9), s"$ties must converge")
      // same rounded beta/hr/se/z — the p=1 fit IS the binary fit
      assert(multi.getDouble(1) == bin.getDouble(4), s"$ties beta")
      assert(multi.getDouble(2) == bin.getDouble(5), s"$ties hazard_ratio")
      assert(multi.getDouble(3) == bin.getDouble(6), s"$ties se")
      assert(multi.getDouble(4) == bin.getDouble(7), s"$ties z")
      assert(multi.getLong(5) == bin.getLong(0) + bin.getLong(1), s"$ties n")
      assert(multi.getLong(6) == bin.getLong(2) + bin.getLong(3), s"$ties events")
    }
  }

  test("coxMulti: beta-hat maximizes the 2-covariate partial likelihood (independent loglik, both tie modes)") {
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    // x1 drives the hazard, x2 is a correlated-but-weaker bucket covariate
    val subjects = (0 until 200).map { i =>
      val x1 = (i % 3).toDouble            // 0/1/2 exposure level
      val x2 = (if (rnd.nextBoolean()) x1 else rnd.nextInt(3)).toDouble
      val dur = (rnd.nextInt(18) + (3 - x1.toInt) * 4).toLong
      (dur, rnd.nextInt(10) < 7, x1, x2)
    }
    val df = subjects.toDF("dur", "ev", "x1", "x2")
    for (ties <- Seq("breslow", "efron")) {
      val got = EventAnalytics.coxMulti(
        df, col("dur"), col("ev"), Seq("x1" -> col("x1"), "x2" -> col("x2")),
        ties = ties)
        .collect().map(r => r.getString(0) -> r).toMap
      assert(got("x1").getBoolean(8), s"$ties must converge")
      val beta = Array(got("x1").getDouble(1), got("x2").getDouble(1))

      // independent log partial likelihood straight from the subject list
      val times = subjects.filter(_._2).map(_._1).distinct.sorted
      def logL(b: Array[Double]): Double = times.map { t =>
        val atRisk = subjects.filter(_._1 >= t)
        val ev = subjects.filter(s => s._1 == t && s._2)
        val d = ev.size.toDouble
        val s0 = atRisk.map(s => math.exp(b(0) * s._3 + b(1) * s._4)).sum
        val evTerm = ev.map(s => b(0) * s._3 + b(1) * s._4).sum
        if (ties == "breslow") evTerm - d * math.log(s0)
        else {
          val d0 = ev.map(s => math.exp(b(0) * s._3 + b(1) * s._4)).sum
          evTerm - (0 until d.toInt).map(l => math.log(s0 - (l / d) * d0)).sum
        }
      }.sum
      val l0 = logL(beta)
      val dirs = Seq((1.0, 0.0), (-1.0, 0.0), (0.0, 1.0), (0.0, -1.0),
        (0.7071, 0.7071), (-0.7071, 0.7071), (0.7071, -0.7071), (-0.7071, -0.7071))
      dirs.foreach { case (dx, dy) =>
        val lp = logL(Array(beta(0) + 1e-3 * dx, beta(1) + 1e-3 * dy))
        assert(l0 >= lp, s"$ties: logL not locally maximal along ($dx,$dy): $l0 < $lp")
      }
    }
  }

  test("coxMulti: translation-invariant in each covariate; collinear design refuses the fit") {
    import spark.implicits._
    val rnd = new scala.util.Random(67)
    val df = (0 until 120).map { i =>
      ((rnd.nextInt(15)).toLong, rnd.nextInt(10) < 7, (i % 4).toDouble, (i % 2).toDouble)
    }.toDF("dur", "ev", "x1", "x2")
    val a = EventAnalytics.coxMulti(
      df, col("dur"), col("ev"), Seq("x1" -> col("x1"), "x2" -> col("x2")))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getBoolean(8))).toMap
    // Cox partial likelihood depends on covariates only through differences
    val b = EventAnalytics.coxMulti(
      df, col("dur"), col("ev"),
      Seq("x1" -> (col("x1") + lit(10.0)), "x2" -> (col("x2") - lit(3.0))))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getBoolean(8))).toMap
    assert(a("x1")._2 && b("x1")._2)
    assert(math.abs(a("x1")._1 - b("x1")._1) <= 1e-5, s"${a("x1")} vs ${b("x1")}")
    assert(math.abs(a("x2")._1 - b("x2")._1) <= 1e-5, s"${a("x2")} vs ${b("x2")}")

    // x2 = 2*x1 exactly: singular information → no fit, null betas
    val sing = EventAnalytics.coxMulti(
      df, col("dur"), col("ev"),
      Seq("x1" -> col("x1"), "x2" -> (col("x1") * lit(2.0))))
      .collect()
    assert(sing.forall(r => !r.getBoolean(8) && r.isNullAt(1)), sing.mkString("; "))
  }

  test("coxMulti: cell-cap require fires; efron differs from breslow under heavy ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(71)
    val df = (0 until 100).map { i =>
      (rnd.nextInt(4).toLong, rnd.nextInt(10) < 8, (i % 2).toDouble, rnd.nextInt(3).toDouble)
    }.toDF("dur", "ev", "x1", "x2")
    val e = intercept[IllegalArgumentException] {
      EventAnalytics.coxMulti(df, col("dur"), col("ev"),
        Seq("x1" -> col("x1"), "x2" -> col("x2")), maxCells = 3)
    }
    assert(e.getMessage.contains("maxCells"))
    val br = EventAnalytics.coxMulti(df, col("dur"), col("ev"),
      Seq("x1" -> col("x1"), "x2" -> col("x2"))).collect().head.getDouble(1)
    val ef = EventAnalytics.coxMulti(df, col("dur"), col("ev"),
      Seq("x1" -> col("x1"), "x2" -> col("x2")), ties = "efron").collect().head.getDouble(1)
    assert(math.abs(br - ef) > 1e-4,
      s"efron $ef should differ from breslow $br on a 4-point duration grid")
  }

  test("flemingHarrington: rho=gamma=0 ≡ log-rank exactly; brute-force weighted reference at 4 exponent pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(107)
    val subjects = (0 until 180).map { i =>
      val a = i % 2 == 0
      ((if (a) rnd.nextInt(14) else rnd.nextInt(18)).toLong, rnd.nextInt(10) < 7, a)
    }
    val df = subjects.toDF("dur", "ev", "arm")
    val lr = EventAnalytics.logRankTest(df, col("dur"), col("ev"), col("arm"))
      .collect().head
    val fh00 = EventAnalytics.flemingHarringtonTest(
      df, col("dur"), col("ev"), col("arm"), rho = 0.0, gamma = 0.0).collect().head
    assert((0 to 3).forall(i => fh00.get(i) == lr.get(i)))
    assert(fh00.getDouble(6) == lr.getDouble(4), "o_minus_e must be the log-rank's exactly")
    assert(fh00.getDouble(7) == lr.getDouble(5) && fh00.getDouble(8) == lr.getDouble(6))

    // brute-force reference straight off the subject list: pooled lagged
    // KM, w = round(sp,6)^rho * (1-round(sp,6))^gamma, weighted O-E / V
    def brute(rho: Double, gamma: Double): (Double, Double, Double) = {
      val ts = subjects.map(_._1).distinct.sorted
      var s = 1.0
      var oe = BigDecimal(0); var vv = BigDecimal(0)
      ts.foreach { t =>
        val atRisk = subjects.filter(_._1 >= t)
        val n1 = atRisk.count(_._3).toLong
        val n0 = atRisk.size - n1
        val d1 = subjects.count(x => x._1 == t && x._2 && x._3).toLong
        val d0 = subjects.count(x => x._1 == t && x._2 && !x._3).toLong
        val n = n1 + n0; val d = d1 + d0
        if (d > 0) {
          val spr = BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          val w = math.pow(spr, rho) * math.pow(1.0 - spr, gamma)
          val e1 = d.toDouble * n1 / n
          val vj = if (n > 1) d.toDouble * n1 / n * n0 / n * (n - d) / (n - 1) else 0.0
          oe += BigDecimal(w * (d1 - e1)).setScale(12, BigDecimal.RoundingMode.HALF_UP)
          vv += BigDecimal(w * w * vj).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        }
        if (n > 0) s = s * (1.0 - d.toDouble / n)
      }
      def r6(x: BigDecimal) = x.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val z = if (vv > 0) BigDecimal(oe.toDouble / math.sqrt(vv.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble else Double.NaN
      (r6(oe), r6(vv), z)
    }
    for ((rho, gamma) <- Seq((0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (1.0, 1.0))) {
      val got = EventAnalytics.flemingHarringtonTest(
        df, col("dur"), col("ev"), col("arm"), rho, gamma).collect().head
      val (oe, vv, z) = brute(rho, gamma)
      assert(math.abs(got.getDouble(6) - oe) <= 2e-6, s"($rho,$gamma) oe ${got.getDouble(6)} vs $oe")
      assert(math.abs(got.getDouble(7) - vv) <= 2e-6, s"($rho,$gamma) v ${got.getDouble(7)} vs $vv")
      assert(math.abs(got.getDouble(8) - z) <= 2e-6, s"($rho,$gamma) z ${got.getDouble(8)} vs $z")
    }
  }

  test("flemingHarrington: gamma=1 out-scores the log-rank on late divergence; FromStates ≡ raw on the binned axis") {
    import spark.implicits._
    // arms identical through t<10, arm B keeps dying later: a LATE gap
    val late = ((0 until 60).map { i =>
      (math.min(i % 10, 9).toLong, i % 3 != 0, i % 2 == 0)
    } ++ (0 until 40).map { i =>
      val a = i % 2 == 0
      ((if (a) 25 + (i % 6) else 12 + (i % 6)).toLong, true, a)
    }).toDF("dur", "ev", "arm")
    val z0 = math.abs(EventAnalytics.flemingHarringtonTest(
      late, col("dur"), col("ev"), col("arm"), 0.0, 0.0).collect().head.getDouble(8))
    val z01 = math.abs(EventAnalytics.flemingHarringtonTest(
      late, col("dur"), col("ev"), col("arm"), 0.0, 1.0).collect().head.getDouble(8))
    assert(z01 > z0, s"gamma=1 |z|=$z01 should beat log-rank |z|=$z0 on a late gap")

    val rnd = new scala.util.Random(109)
    val rows = (0 until 120).map { i =>
      (rnd.nextInt(40).toLong, rnd.nextBoolean(), i % 3 == 0)
    }.toDF("dur", "ev", "arm")
    val bw = 4L
    val fromStates = EventAnalytics.flemingHarringtonFromStates(
      EventAnalytics.survivalPartials(rows.where(col("arm")), col("dur"), col("ev"), bw),
      EventAnalytics.survivalPartials(rows.where(!col("arm")), col("dur"), col("ev"), bw),
      rho = 1.0, gamma = 1.0).collect().head
    val raw = EventAnalytics.flemingHarringtonTest(
      rows.select((col("dur") / bw).cast("long").as("t"), col("ev"), col("arm")),
      col("t"), col("ev"), col("arm"), rho = 1.0, gamma = 1.0).collect().head
    assert(fromStates == raw)
  }

  test("coxStratified: constant stratum ≡ coxMulti; strata never cross risk sets") {
    import spark.implicits._
    val rnd = new scala.util.Random(101)
    val df = (0 until 150).map { i =>
      (rnd.nextInt(12).toLong, rnd.nextInt(10) < 7, (i % 3).toDouble)
    }.toDF("dur", "ev", "x1")
    val multi = EventAnalytics.coxMulti(
      df, col("dur"), col("ev"), Seq("x1" -> col("x1"))).collect().toSeq
    val strat = EventAnalytics.coxStratified(
      df, col("dur"), col("ev"), Seq("x1" -> col("x1")), strata = lit("z"))
      .collect().toSeq
    assert(strat == multi)
  }

  test("coxStratified: shared beta across shifted-baseline strata; pooled fit is confounded (both tie modes)") {
    import spark.implicits._
    val rnd = new scala.util.Random(103)
    // stratum B lives on a disjoint, much later time axis AND has a
    // different covariate mix — pooling the baselines mixes B's whole
    // cohort into every A-time risk set, confounding beta
    val subjects = (0 until 240).map { i =>
      val inB = i % 3 == 0
      val x1 = (if (inB) i % 2 else i % 4).toDouble
      val base = rnd.nextInt(15) + (4 - x1.toInt)
      val dur = (if (inB) 1000 + base else base).toLong
      (if (inB) "B" else "A", dur, rnd.nextInt(10) < 7, x1)
    }
    val df = subjects.toDF("s", "dur", "ev", "x1")
    for (ties <- Seq("breslow", "efron")) {
      val got = EventAnalytics.coxStratified(
        df, col("dur"), col("ev"), Seq("x1" -> col("x1")), strata = col("s"),
        ties = ties).collect().head
      assert(got.getBoolean(8), s"$ties must converge")
      val beta = got.getDouble(1)

      // independent STRATIFIED log partial likelihood: per-stratum sums
      def logL(b: Double): Double = Seq("A", "B").map { st =>
        val sub = subjects.filter(_._1 == st)
        val times = sub.filter(_._3).map(_._2).distinct.sorted
        times.map { t =>
          val atRisk = sub.filter(_._2 >= t)
          val ev = sub.filter(x => x._2 == t && x._3)
          val d = ev.size.toDouble
          val s0 = atRisk.map(x => math.exp(b * x._4)).sum
          val evTerm = ev.map(x => b * x._4).sum
          if (ties == "breslow") evTerm - d * math.log(s0)
          else {
            val d0 = ev.map(x => math.exp(b * x._4)).sum
            evTerm - (0 until d.toInt).map(l => math.log(s0 - (l / d) * d0)).sum
          }
        }.sum
      }.sum
      val l0 = logL(beta)
      assert(l0 >= logL(beta + 1e-3) && l0 >= logL(beta - 1e-3),
        s"$ties: stratified loglik not locally maximal at $beta")

      // the pooled (single-baseline) fit lands somewhere else
      val pooled = EventAnalytics.coxMulti(
        df, col("dur"), col("ev"), Seq("x1" -> col("x1")), ties = ties)
        .collect().head.getDouble(1)
      assert(math.abs(pooled - beta) > 1e-3,
        s"$ties: pooled $pooled should differ from stratified $beta on shifted baselines")
    }
  }

  test("cumulativeIncidence: hand-computed Aalen–Johansen corners") {
    import spark.implicits._
    val subj = Seq[(Long, Option[String])](
      (1L, Some("a")), (1L, None),
      (2L, Some("b")), (2L, Some("b")),
      (3L, Some("a")), (3L, None), (3L, None),
      (4L, Some("b")),
      (5L, None), (5L, None))
      .toDF("t", "cause")
    val got = EventAnalytics.cumulativeIncidence(subj, col("t"), col("cause"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // S(t−) lag: 1, .9, .675, .5625 — corners computed by hand
    assert(got((1L, "a")) == ((10L, 1L, 0.1)))
    assert(got((2L, "b")) == ((8L, 2L, 0.225)))
    assert(got((3L, "a")) == ((6L, 1L, 0.2125)))
    assert(got((4L, "b")) == ((3L, 1L, 0.4125)))
    assert(got.size == 4, got.toString)
  }

  test("cumulativeIncidence: sum over causes ≡ 1 − all-cause KM; single cause ≡ 1 − survival") {
    import spark.implicits._
    val rnd = new scala.util.Random(83)
    val subj = (0 until 300).map { _ =>
      val t = rnd.nextInt(20).toLong
      val cause = rnd.nextInt(4) match {
        case 0 => Some("x"); case 1 => Some("y"); case 2 => Some("z"); case _ => None
      }
      (t, cause)
    }.toDF("t", "cause")
    val cif = EventAnalytics.cumulativeIncidence(subj, col("t"), col("cause"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(4))
    val km = EventAnalytics.kaplanMeierFromState(
      EventAnalytics.survivalPartials(subj, col("t"), col("cause").isNotNull))
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    // carry each cause's last corner forward, check the identity at every
    // event time: Σ_k CIF_k(t) = 1 − Ŝ(t)
    val ts = cif.map(_._1._1).distinct.sorted
    val causes = cif.map(_._1._2).distinct
    val byKey = cif.toMap
    var last = causes.map(_ -> 0.0).toMap
    ts.foreach { t =>
      last = causes.map(c => c -> byKey.getOrElse((t, c), last(c))).toMap
      val lhs = last.values.sum
      assert(math.abs(lhs - (1.0 - km(t))) <= 5e-6,
        s"t=$t: sum CIF $lhs vs 1-KM ${1.0 - km(t)}")
    }
    // one cause only: the CIF IS the complement of the survival curve
    val one = subj.select(col("t"),
      when(col("cause").isNotNull, lit("e")).otherwise(lit(null)).as("cause"))
    val cif1 = EventAnalytics.cumulativeIncidence(one, col("t"), col("cause"))
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    cif1.foreach { case (t, v) =>
      assert(math.abs(v - (1.0 - km(t))) <= 5e-6, s"t=$t: $v vs ${1.0 - km(t)}")
    }
  }

  test("competingMerge: split-state CIF ≡ whole-corpus CIF, exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(97)
    val rows = (0 until 200).map { i =>
      (i.toLong, rnd.nextInt(15).toLong,
        if (rnd.nextBoolean()) Some(if (rnd.nextBoolean()) "a" else "b") else None)
    }
    val df = rows.toDF("id", "t", "cause")
    val whole = EventAnalytics.cumulativeIncidence(df, col("t"), col("cause"), binWidth = 2L)
      .collect().toSet
    val merged = EventAnalytics.cumulativeIncidenceFromState(
      EventAnalytics.competingMerge(Seq(
        EventAnalytics.competingPartials(df.where(col("id") % 3 === 0), col("t"), col("cause"), 2L),
        EventAnalytics.competingPartials(df.where(col("id") % 3 === 1), col("t"), col("cause"), 2L),
        EventAnalytics.competingPartials(df.where(col("id") % 3 === 2), col("t"), col("cause"), 2L))))
      .collect().toSet
    assert(merged == whole)
  }

  test("linearAttribution: equal shares, window exclusion, touchless conversions drop") {
    import spark.implicits._
    val e = Seq(
      // u1: view@10, click@20 → purchase@30 (window 25): both in → 0.5 each
      (1L, "view", 10L, 101L), (1L, "click", 20L, 102L), (1L, "purchase", 30L, 103L),
      // u2: view@0 OUTSIDE window of purchase@100 (window 25) → drops;
      // purchase has no touches → contributes nothing
      (2L, "view", 0L, 201L), (2L, "purchase", 100L, 202L),
      // u3: two views then purchase → view gets 2×(1/2)
      (3L, "view", 80L, 301L), (3L, "view", 90L, 302L), (3L, "purchase", 95L, 303L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val got = EventAnalytics.linearAttribution(e, Seq("view", "click"), "purchase",
        windowTs = 25L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == Map("view" -> ((3L, 1.5)), "click" -> ((1L, 0.5))))
  }

  test("cusum: hand-computed recurrence, resets at zero, alarms past h") {
    import spark.implicits._
    // x = 10,10,10,22,22,10 → μ = 14 exactly; k = 2, h = 5
    val series = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 22L), (5L, 22L), (6L, 10L))
      .toDF("t", "x")
    val got = EventAnalytics.cusum(series, col("t"), col("x"), k = 2.0, h = 5.0)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got(1L) == ((0.0, 2.0, false)))
    assert(got(2L) == ((0.0, 4.0, false)))
    assert(got(3L) == ((0.0, 6.0, true)))  // slow negative drift caught
    assert(got(4L) == ((6.0, 0.0, true)))  // upward shift; S⁻ resets
    assert(got(5L) == ((12.0, 0.0, true)))
    assert(got(6L) == ((6.0, 2.0, true)))
  }

  test("rfm: hand-computed quartile bins with tie-broken ntile ranks") {
    import spark.implicits._
    val orders = Seq(
      (1L, 10L, 5.0), (1L, 30L, 5.0), // u1: r=30 f=2 m=10
      (2L, 20L, 1.0),                 // u2: r=20 f=1 m=1
      (3L, 40L, 2.0),                 // u3: r=40 f=1 m=2
      (4L, 50L, 100.0)                // u4: r=50 f=1 m=100
    ).toDF("u", "ts", "amt")
    val got = EventAnalytics.rfm(orders, col("u"), col("ts"), col("amt"), bins = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    // recency order 20,30,40,50 → u2,u1 | u3,u4; frequency ties break by id:
    // (1,u2),(1,u3),(1,u4),(2,u1) → u2,u3 | u4,u1; monetary 1,2,10,100
    assert(got == Map(
      1L -> ((0L, 1L, 1L)),
      2L -> ((0L, 0L, 0L)),
      3L -> ((1L, 0L, 0L)),
      4L -> ((1L, 1L, 1L))))
  }

  test("nelsonAalen: hand-computed hazards; censoring shrinks the risk set eventlessly") {
    import spark.implicits._
    val obs = Seq((1L, true), (1L, true), (2L, false), (3L, true), (3L, false))
      .toDF("dur", "ev")
    val got = EventAnalytics.nelsonAalen(obs, col("dur"), col("ev"))
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    // t=1: risk 5, d 2 → h .4 ; t=2: risk 3, d 0 → h 0 ; t=3: risk 2, d 1 → h .5
    assert(got == Map(
      1L -> ((5L, 2L, 0L, 0.4, 0.4)),
      2L -> ((3L, 0L, 1L, 0.0, 0.4)),
      3L -> ((2L, 1L, 1L, 0.5, 0.9))))
  }

  test("autocorrelation: lag 0 is exactly 1; an alternating series flips sign; constant → NULL") {
    import spark.implicits._
    val alt = (0L until 8L).map(t => (t, (t % 2).toDouble)).toDF("t", "x")
    val got = EventAnalytics.autocorrelation(alt, maxLag = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), if (r.isNullAt(2)) Double.NaN else r.getDouble(2))))
      .toMap
    assert(got(0L)._1 == 8L && got(0L)._2 == 1.0)
    assert(got(1L)._1 == 7L && got(1L)._2 < 0.0)
    assert(got(2L)._1 == 6L && got(2L)._2 > 0.0)
    // constant series: zero variance → NULL, never a division blowup
    val const = (0L until 6L).map(t => (t, 3.0)).toDF("t", "x")
    val c = EventAnalytics.autocorrelation(const, maxLag = 1).collect()
    assert(c.forall(_.isNullAt(2)))
    graft.Caches.clear()
  }

  test("frequentEpisodes: sliding windows beat per-user paths; user support outranks raw count") {
    import spark.implicits._
    // u1 does a>b>c twice (4 events overlap: a b c then a b c); u2 does a>b>c once;
    // u3 does x>y>z three times in a row — more occurrences, but only ONE user
    val ev = (Seq((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"),
      (1L, 4L, "a"), (1L, 5L, "b"), (1L, 6L, "c")) ++
      Seq((2L, 1L, "a"), (2L, 2L, "b"), (2L, 3L, "c")) ++
      (0 until 3).flatMap(i => Seq((3L, i * 3 + 1L, "x"), (3L, i * 3 + 2L, "y"), (3L, i * 3 + 3L, "z"))))
      .zipWithIndex.map { case ((u, t, ty), id) => (u, t, ty, id.toLong) }
      .toDF("user_id", "ts", "event_type", "event_id")
    val got = EventAnalytics.frequentEpisodes(ev, n = 3, topK = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // a>b>c: 2 users / 3 occurrences beats x>y>z: 1 user / 3 occurrences
    assert(got.head == (("a>b>c", 2L, 3L)))
    assert(got.map(t => t._1 -> ((t._2, t._3))).toMap.get("x>y>z").contains((1L, 3L)))
  }

  test("maseBacktest: a perfect seasonal pattern scores 0; a constant series → NULL") {
    import spark.implicits._
    // period-2 pattern: lag-2 predicts exactly, lag-1 always misses by 4
    val season = (0 until 6).map(t => ("s", t.toLong, if (t % 2 == 0) 1.0 else 5.0))
    val const = (0 until 6).map(t => ("c", t.toLong, 3.0))
    val got = EventAnalytics.maseBacktest(
      (season ++ const).toDF("g", "t", "x"), season = 2, strataCols = Seq("g"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3),
          if (r.isNullAt(4)) Double.NaN else r.getDouble(4)))).toMap
    assert(got("s") == ((4L, 0.0, 16.0, 0.0)))
    assert(got("c")._2 == 0.0 && got("c")._3 == 0.0 && got("c")._4.isNaN)
  }

  test("lastNHistory: chronological last-n slice per user; rank cut before assembly") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"), (1L, 3L, 3L, "c"),
      (1L, 4L, 4L, "d"), (2L, 9L, 5L, "z"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = EventAnalytics.lastNHistory(ev, n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[String](2)))).toMap
    // user 1 has 4 events; the LAST 3 in chronological order are b,c,d
    assert(got(1L) == ((4L, Seq("b", "c", "d"))))
    assert(got(2L) == ((1L, Seq("z"))))
    // equal-ts ties break on event_id — deterministic under repartition
    val tied = Seq((3L, 5L, 1L, "x"), (3L, 5L, 2L, "y"), (3L, 5L, 3L, "w"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val t1 = EventAnalytics.lastNHistory(tied, n = 2).collect().head.getSeq[String](2)
    val t2 = EventAnalytics.lastNHistory(tied.repartition(5), n = 2)
      .collect().head.getSeq[String](2)
    assert(t1 == Seq("y", "w") && t2 == t1)
  }

  test("basketPairs: hand lift; item+pair min-support pruning; mega-basket drop") {
    import spark.implicits._
    val rows = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L), (4L, 3L), (5L, 4L), (3L, 2L)) // duplicate row collapses
      .toDF("b", "i")
    val got = EventAnalytics.basketPairs(rows, col("b"), col("i"), minSupport = 2)
      .collect()
    // item 4 (support 1) pruned; pairs (1,3)/(2,3) support 1 pruned
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      == ((1L, 2L, 3L, 3L, 3L)))
    assert((r.getDouble(5), r.getDouble(6), r.getDouble(7)) == ((0.6, 1.0, 1.0)))
    assert(r.getDouble(8) == 1.666667) // 3·5/(3·3)
    // maxBasketSize drops the 3-item basket WHOLE: N=4, pair count 2
    val capped = EventAnalytics.basketPairs(rows, col("b"), col("i"),
      minSupport = 2, maxBasketSize = 2).collect().head
    assert(capped.getLong(2) == 2L && capped.getDouble(5) == 0.5 &&
      capped.getDouble(8) == 2.0) // 2·4/(2·2)
    graft.Caches.clear()
  }

  test("associationRules: directed rule card — conviction asymmetric, NULL at conf 1") {
    import spark.implicits._
    // baskets {A,B} {A,B} {A,C}: A in 3, B in 2 (C pruned at support 1);
    // pair (A,B) n_ab=2 over 3 baskets
    val rows = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"), (3L, "A"),
      (3L, "C")).toDF("b", "i")
    val got = EventAnalytics.associationRules(rows, col("b"), col("i"),
        minSupport = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(got.size == 2)
    val ab = got(("A", "B")) // A⇒B: conf 2/3, conviction (1−2/3)/(1−2/3)=1
    assert(ab.getLong(2) == 2L && ab.getLong(3) == 3L && ab.getLong(4) == 2L)
    assert(ab.getDouble(5) == 0.666667 && ab.getDouble(6) == 0.666667)
    assert(ab.getDouble(7) == 1.0)      // lift 2·3/(3·2)
    assert(ab.getDouble(8) == 0.0)      // leverage: independence exactly
    assert(ab.getDouble(9) == 1.0)      // conviction = 1 (no better than chance)
    assert(ab.getDouble(10) == 0.666667) // jaccard 2/3
    val ba = got(("B", "A")) // B⇒A: conf 1 → conviction undefined (NULL)
    assert(ba.getDouble(6) == 1.0 && ba.isNullAt(9))
    graft.Caches.clear()
  }

  test("seasonalStrength: pure trend+cycle series scores 1 on both; flat trend goes NULL") {
    import spark.implicits._
    // x_b = b + 4·(b mod 2) + 1 decomposes EXACTLY: trend b+3, seasonal
    // ±2, residual 0 → both strengths exactly 1 on the interior buckets
    val mixed = (0 to 7).flatMap { b =>
      val x = b + 4 * (b % 2) + 1
      Seq.fill(x)(("a", b.toLong))
    }.toDF("event_type", "ts")
    val r = EventAnalytics.seasonalStrength(mixed, bucketTs = 1L, period = 2)
      .collect().head
    assert(r.getString(0) == "a" && r.getLong(1) == 6L)
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 1.0)
    // pure alternation: trend is CONSTANT → Var(T+R) = 0 → trend
    // strength undefined (NULL), seasonal strength still 1
    val alt = (0 to 7).flatMap { b =>
      Seq.fill(1 + 2 * (b % 2))(("a", b.toLong))
    }.toDF("event_type", "ts")
    val a = EventAnalytics.seasonalStrength(alt, bucketTs = 1L, period = 2)
      .collect().head
    assert(a.isNullAt(2) && a.getDouble(3) == 1.0)
    graft.Caches.clear()
  }

  test("kaplanMeierCi: hand Greenwood band; extinction collapses the band with S") {
    import spark.implicits._
    // (1, event), (3, censored): S(1)=0.5, gw=1/(2·1)=0.5 →
    // se = 0.5·√0.5; the plain band clamps to [0, 1] at this n
    val obs = Seq((1L, true), (3L, false)).toDF("dur", "ev")
    val rows = EventAnalytics.kaplanMeierCi(obs, col("dur"), col("ev"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val t1 = rows(1L)
    assert(t1.getDouble(4) == 0.5 && t1.getDouble(5) == 0.353553)
    assert(t1.getDouble(6) == 0.0 && t1.getDouble(7) == 1.0)
    // censoring adds no variance: t=3 carries t=1's se unchanged
    assert(rows(3L).getDouble(5) == 0.353553)
    // everyone dies at once: S = 0, the nᵢ=dᵢ term is excluded → band 0
    val ext = Seq((1L, true), (1L, true)).toDF("dur", "ev")
    val e = EventAnalytics.kaplanMeierCi(ext, col("dur"), col("ev"))
      .collect().head
    assert(e.getDouble(4) == 0.0 && e.getDouble(5) == 0.0 &&
      e.getDouble(6) == 0.0 && e.getDouble(7) == 0.0)
    graft.Caches.clear()
  }

  test("rmst: hand area under the KM steps; horizon before any event gives tau") {
    import spark.implicits._
    // (1, event), (3, censored): S = 1 on [0,1), 0.5 from t=1 on →
    // area to τ=5: 1·1 + 0.5·2 + 0.5·2 = 3
    val obs = Seq((1L, true), (3L, false)).toDF("dur", "ev")
    val r = EventAnalytics.rmst(obs, col("dur"), col("ev"), tau = 5L)
      .collect().head
    assert(r.getLong(0) == 5L && r.getLong(1) == 2L && r.getDouble(2) == 3.0)
    // every observation beyond the horizon → S = 1 throughout → RMST = τ
    val far = Seq((9L, true), (8L, false)).toDF("dur", "ev")
    val f = EventAnalytics.rmst(far, col("dur"), col("ev"), tau = 5L)
      .collect().head
    assert(f.getDouble(2) == 5.0)
    graft.Caches.clear()
  }

  test("logRankTest: hand hypergeometric O-E/V; symmetric arms z=0; nj<=1 variance guard") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // arm A events at t=2,3 AFTER both B events at t=1: one comparable
    // event time (t=1, E1=1, V=1/3), so z = -1/sqrt(1/3)
    val rows = Seq((2L, true, true), (3L, true, true),
      (1L, true, false), (1L, true, false)).toDF("dur", "ev", "arm")
    val r = EventAnalytics.logRankTest(rows, col("dur"), col("ev"), col("arm"))
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((2L, 2L, 2L, 2L)))
    assert(r.getDouble(4) == -1.0 && r.getDouble(5) == r6(1.0 / 3))
    assert(r.getDouble(6) == r6(-math.sqrt(3.0)))
    // exchangeable arms: O-E sums to zero
    val sym = Seq((1L, true, true), (2L, false, true),
      (1L, true, false), (2L, false, false)).toDF("dur", "ev", "arm")
    val z = EventAnalytics.logRankTest(sym, col("dur"), col("ev"), col("arm"))
      .collect().head
    assert(z.getDouble(4) == 0.0 && z.getDouble(6) == 0.0)
    // single-subject event time: V term guarded to 0; no comparable
    // times at all -> NULL z
    val solo = Seq((1L, true, true), (2L, true, false)).toDF("dur", "ev", "arm")
    val sz = EventAnalytics.logRankTest(solo, col("dur"), col("ev"), col("arm"))
      .collect().head
    assert(sz.getDouble(5) >= 0.0)
    graft.Caches.clear()
  }

  test("concordanceIndex: hand-counted censoring-honest pairs; tied risk; no comparable -> NULL") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // A(1,ev,5) B(2,ev,3) C(3,cens,4) D(1,cens,9):
    // comparable = A→B (5>3 conc), A→C (5>4 conc), B→C (3<4 disc);
    // t-ties and censored-shorter pairs excluded
    val rows = Seq((1L, true, 5.0), (2L, true, 3.0), (3L, false, 4.0), (1L, false, 9.0))
      .toDF("t", "e", "r")
    val r = EventAnalytics.concordanceIndex(rows, col("t"), col("e"), col("r"))
      .collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L && r.getLong(2) == 2L && r.getLong(3) == 0L)
    assert(r.getDouble(4) == r6(2.0 / 3))
    val r17 = EventAnalytics.concordanceIndex(rows.repartition(17), col("t"), col("e"), col("r"))
      .collect().head
    assert(r17 == r)
    // a tied risk counts half
    val tied = Seq((1L, true, 5.0), (2L, false, 5.0)).toDF("t", "e", "r")
    val tr = EventAnalytics.concordanceIndex(tied, col("t"), col("e"), col("r"))
      .collect().head
    assert(tr.getLong(1) == 1L && tr.getLong(3) == 1L && tr.getDouble(4) == 0.5)
    // only censored subjects → zero comparable pairs → NULL c
    val cens = Seq((1L, false, 1.0), (2L, false, 2.0)).toDF("t", "e", "r")
    val cz = EventAnalytics.concordanceIndex(cens, col("t"), col("e"), col("r"))
      .collect().head
    assert(cz.getLong(1) == 0L && cz.isNullAt(4))
    graft.Caches.clear()
  }

  test("coxBaseline: Breslow H0 matches a naive subject-level recomputation at beta-hat; surv = exp(-H0)") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val subjects = (0 until 140).map { i =>
      val a = i % 2 == 0
      ((if (a) rnd.nextInt(18) else rnd.nextInt(30)).toLong, rnd.nextInt(10) < 8, if (a) 1.0 else 0.0)
    }
    val df = subjects.toDF("dur", "ev", "x")
    val covs = Seq("x" -> col("x"))
    val fit = EventAnalytics.coxMulti(df, col("dur"), col("ev"), covs).collect().head
    assert(fit.getBoolean(8), "fit must converge")
    val beta = fit.getDouble(1)
    val got = EventAnalytics.coxBaseline(df, col("dur"), col("ev"), covs)
      .orderBy(col("t")).collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    // naive recomputation straight off the subject list at the reported beta
    val times = subjects.filter(_._2).map(_._1).distinct.sorted
    var cum = 0.0
    val ref = times.map { t =>
      val s0 = subjects.filter(_._1 >= t).map(s => math.exp(beta * s._3)).sum
      val d = subjects.count(s => s._1 == t && s._2).toDouble
      val h0 = d / s0
      cum += h0
      (t, h0, cum)
    }
    assert(got.length == ref.length, s"${got.length} event times vs ${ref.length}")
    got.zip(ref).foreach { case ((t, h0, ch, sv), (rt, rh0, rch)) =>
      assert(t == rt)
      assert(math.abs(h0 - rh0) < 1e-3, s"h0 at t=$t: $h0 vs $rh0")
      assert(math.abs(ch - rch) < 1e-2, s"cum_h0 at t=$t: $ch vs $rch")
      assert(math.abs(sv - math.exp(-ch)) < 2e-6, s"surv != exp(-cum) at t=$t")
    }
    // H0 strictly increases across event times
    assert(got.map(_._3).sliding(2).forall(p => p(0) < p(1)))
  }

  test("coxBaseline ties=efron ≡ breslow when event times are distinct; differs under heavy ties") {
    import spark.implicits._
    // one event per distinct time: Efron's slot correction is vacuous
    val distinct = (0 until 40).map { i =>
      (i.toLong, true, (i % 2).toDouble)
    }.toDF("dur", "ev", "x")
    val covs = Seq("x" -> col("x"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toString).sorted.toSeq
    assert(rows(EventAnalytics.coxBaseline(distinct, col("dur"), col("ev"), covs)) ==
      rows(EventAnalytics.coxBaseline(distinct, col("dur"), col("ev"), covs, ties = "efron")))
    // heavy ties: Efron removes part of the tied events' own hazard -> larger increments
    val rnd = new scala.util.Random(31)
    val tied = (0 until 120).map { i =>
      ((rnd.nextInt(5)).toLong, rnd.nextInt(10) < 8, (i % 2).toDouble)
    }.toDF("dur", "ev", "x")
    val br = EventAnalytics.coxBaseline(tied, col("dur"), col("ev"), covs)
      .orderBy(col("t")).collect().map(_.getDouble(2))
    val ef = EventAnalytics.coxBaseline(tied, col("dur"), col("ev"), covs, ties = "efron")
      .orderBy(col("t")).collect().map(_.getDouble(2))
    assert(br.length == ef.length && br.zip(ef).exists { case (b, e) => b != e })
    assert(br.zip(ef).forall { case (b, e) => e >= b },
      "every Efron increment >= its Breslow twin (smaller denominators)")
  }

  test("coxBaseline: empty frame on a collinear design; per-stratum cumulative resets") {
    import spark.implicits._
    val rnd = new scala.util.Random(37)
    val df = (0 until 80).map { i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(10) < 7, (i % 2).toDouble, if (i < 40) "s0" else "s1")
    }.toDF("dur", "ev", "x", "seg")
    val sing = EventAnalytics.coxBaseline(df, col("dur"), col("ev"),
      Seq("x1" -> col("x"), "x2" -> (col("x") * lit(2.0))))
    assert(sing.columns.toSeq ==
      Seq("stratum", "t", "h0", "cum_h0", "baseline_surv"))
    assert(sing.collect().isEmpty, "collinear design must refuse baseline values")
    val strat = EventAnalytics.coxBaseline(df, col("dur"), col("ev"),
      Seq("x" -> col("x")), strata = col("seg")).orderBy(col("stratum"), col("t")).collect()
    val bySeg = strat.groupBy(_.getString(0))
    assert(bySeg.keySet == Set("s0", "s1"))
    bySeg.values.foreach { rows =>
      // first event time of each stratum: cum == its own h0 (the reset)
      assert(math.abs(rows.head.getDouble(3) - rows.head.getDouble(2)) < 2e-6)
      assert(rows.map(_.getDouble(3)).sliding(2).forall(p => p.length < 2 || p(0) < p(1)))
    }
  }

  test("coxBaselineFromStates ≡ coxBaseline on the binned axis") {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    val rows = (0 until 100).map { i =>
      ((if (i % 2 == 0) rnd.nextInt(20) else rnd.nextInt(40)).toLong, rnd.nextInt(10) < 7, i % 2 == 0)
    }.toDF("dur", "ev", "arm")
    val bw = 6L
    def str(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toString).sorted.toSeq
    val fromStates = EventAnalytics.coxBaselineFromStates(
      EventAnalytics.survivalPartials(rows.where(col("arm")), col("dur"), col("ev"), bw),
      EventAnalytics.survivalPartials(rows.where(!col("arm")), col("dur"), col("ev"), bw))
    val direct = EventAnalytics.coxBaseline(
      rows.select((col("dur") / bw).cast("long").as("t"), col("ev"),
        col("arm").cast("double").as("x")),
      col("t"), col("ev"), Seq("x" -> col("x")), maxIter = 25).drop("stratum")
    assert(str(fromStates) == str(direct))
  }

  test("coxSchoenfeld: chisq matches a naive p=1 recomputation; GLOBAL == per-covariate at p=1") {
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    val subjects = (0 until 140).map { i =>
      val a = i % 2 == 0
      ((if (a) rnd.nextInt(18) else rnd.nextInt(30)).toLong, rnd.nextInt(10) < 8, if (a) 1.0 else 0.0)
    }
    val df = subjects.toDF("dur", "ev", "x")
    val covs = Seq("x" -> col("x"))
    val fit = EventAnalytics.coxMulti(df, col("dur"), col("ev"), covs).collect().head
    val beta = fit.getDouble(1)
    val got = EventAnalytics.coxSchoenfeld(df, col("dur"), col("ev"), covs)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("x").getBoolean(7) && got("GLOBAL").getBoolean(7), "must converge")
    // naive: per-event-time residuals, score-test statistic at the reported beta
    val times = subjects.filter(_._2).map(_._1).distinct.sorted
    val perTime = times.map { t =>
      val atRisk = subjects.filter(_._1 >= t)
      val s0 = atRisk.map(s => math.exp(beta * s._3)).sum
      val s1 = atRisk.map(s => s._3 * math.exp(beta * s._3)).sum
      val s2 = atRisk.map(s => s._3 * s._3 * math.exp(beta * s._3)).sum
      val ev = subjects.filter(s => s._1 == t && s._2)
      val d = ev.length.toDouble
      val resid = ev.map(_._3).sum - d * s1 / s0
      val info = d * (s2 / s0 - (s1 / s0) * (s1 / s0))
      (t.toDouble, d, resid, info)
    }
    val dTot = perTime.map(_._2).sum
    val gBar = perTime.map(p => p._2 * p._1).sum / dTot
    val denG = perTime.map(p => p._2 * (p._1 - gBar) * (p._1 - gBar)).sum
    val v = perTime.map(p => (p._1 - gBar) * p._3).sum
    val info = perTime.map(_._4).sum
    val tRef = dTot * v * v / (info * denG)
    val chi = got("x").getDouble(1)
    assert(math.abs(chi - tRef) < math.max(1e-3, 1e-3 * tRef), s"chisq $chi vs naive $tRef")
    assert(got("GLOBAL").getDouble(1) == chi, "p=1: global == per-covariate")
    assert(got("x").getLong(2) == 1L && got("GLOBAL").getLong(2) == 1L)
  }

  test("coxSchoenfeld: crossing hazards flagged, proportional hazards not; rank transform is monotone-invariant") {
    import spark.implicits._
    // PH VIOLATION by construction: the covariate effect reverses over time
    // (x=1 subjects die early, x=0 subjects die late -> beta(t) not constant)
    val crossing = ((0 until 60).map(i => ((i % 10 + 1).toLong, true, 1.0)) ++
      (0 until 60).map(i => ((i % 10 + 30).toLong, true, 0.0)) ++
      (0 until 20).map(i => (50L, false, (i % 2).toDouble))).toDF("dur", "ev", "x")
    val cz = EventAnalytics.coxSchoenfeld(crossing, col("dur"), col("ev"), Seq("x" -> col("x")))
      .collect().map(r => r.getString(0) -> r).toMap
    // under complete time-separation the fit may or may not converge with a
    // huge |beta|; require the diagnostic to either flag or refuse -- with
    // this censored tail the fit converges and the violation must be flagged
    assert(cz("x").getBoolean(7), "fit should converge on the censored-tail design")
    assert(cz("x").getBoolean(3), s"crossing hazards must be flagged: ${cz("x")}")
    // PROPORTIONAL by construction: same shape, arm just thins the hazard
    val rnd = new scala.util.Random(53)
    val ph = (0 until 300).map { i =>
      val x = (i % 2).toDouble
      // geometric-ish durations; rate ratio constant over time
      var t = 0L
      while (rnd.nextDouble() > (if (x > 0) 0.25 else 0.15) && t < 40L) t += 1L
      (t, t < 40L, x)
    }.toDF("dur", "ev", "x")
    val pz = EventAnalytics.coxSchoenfeld(ph, col("dur"), col("ev"), Seq("x" -> col("x")))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(pz("x").getBoolean(7))
    assert(!pz("x").getBoolean(3), s"proportional data must not be flagged: ${pz("x")}")
    // rank transform: invariant under a monotone time rescale (t -> t^2);
    // squaring preserves event order on nonnegative durations
    val sq = crossing.select((col("dur") * col("dur")).as("dur"), col("ev"), col("x"))
    def chiOf(df: org.apache.spark.sql.DataFrame) =
      EventAnalytics.coxSchoenfeld(df, col("dur"), col("ev"), Seq("x" -> col("x")),
        transform = "rank").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(chiOf(crossing) == chiOf(sq), "rank-transform chisq must survive t -> t^2")
  }

  test("coxSchoenfeld: collinear design yields NULL statistics, converged=false") {
    import spark.implicits._
    val rnd = new scala.util.Random(59)
    val df = (0 until 60).map { i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(10) < 7, (i % 2).toDouble)
    }.toDF("dur", "ev", "x")
    val rows = EventAnalytics.coxSchoenfeld(df, col("dur"), col("ev"),
      Seq("x1" -> col("x"), "x2" -> (col("x") * lit(3.0)))).collect()
    assert(rows.length == 3, "2 covariates + GLOBAL")
    rows.foreach { r =>
      assert(r.isNullAt(1) && r.isNullAt(3) && !r.getBoolean(7), r.toString)
    }
  }

}
