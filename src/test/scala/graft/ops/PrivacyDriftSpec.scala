package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PrivacyDriftSpec extends SparkSpec {

  test("kAnonymity: sizes, flags, null quasi groups, sensitive diversity") {
    import spark.implicits._
    val df = Seq(
      (Some("en"), "a", 1L), (Some("en"), "a", 2L), (Some("en"), "a", 2L),
      (Some("en"), "b", 1L),
      (None, "b", 5L), (None, "b", 6L)
    ).toDF("lang", "src", "sens")
    val got = Privacy.kAnonymity(df, Seq("lang", "src"), k = 2,
        sensitive = Some("sens"), l = 2)
      .collect().map(r => (Option(r.getString(0)), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5)))).toMap
    assert(got((Some("en"), "a")) == ((3L, 2L, true, true)))
    assert(got((Some("en"), "b")) == ((1L, 1L, false, false)))
    // null lang is its own observable combination
    assert(got((None, "b")) == ((2L, 2L, true, true)))
  }

  test("tCloseness: hand TVD with absent-value tail; null sensitive excluded; null quasi groups") {
    import spark.implicits._
    // global mix: x 0.6, y 0.2, z 0.2 (N = 5); a null sensitive row disclosed nothing
    val df = Seq(
      (Some("A"), Some("x")), (Some("A"), Some("x")), (Some("A"), Some("y")),
      (Some("A"), None),
      (Some("B"), Some("x")), (Some("B"), Some("z"))).toDF("g", "v")
    val got = Privacy.tCloseness(df, Seq("g"), "v", t = 0.25)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3))))
      .toMap
    // A: ½(|2/3−0.6| + |1/3−0.2| + 0.2 absent-z) = 0.2; B: ½(0.1 + 0.3 + 0.2) = 0.3
    assert(got("A") == ((3L, 0.2, true)))
    assert(got("B") == ((2L, 0.3, false)))
    // null quasi value is a combination an attacker observes too
    val withNull = df.union(Seq((None: Option[String], Some("x"))).toDF("g", "v"))
    val g2 = Privacy.tCloseness(withNull, Seq("g"), "v", t = 0.5)
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(g2(None) == 1L && g2(Some("A")) == 3L)
    graft.Caches.clear()
  }

  test("riskyRows: exactly the members of sub-k combinations, null-safe") {
    import spark.implicits._
    val df = Seq(
      (Some("en"), 1L), (Some("en"), 2L), (Some("de"), 3L), (None, 4L)
    ).toDF("lang", "id")
    val got = Privacy.riskyRows(df, Seq("lang"), k = 2)
      .collect().map(_.getLong(1)).toSet
    assert(got == Set(3L, 4L))
  }

  test("chiSquareDrift: hand-computed contributions; new category gets NULL contrib") {
    import spark.implicits._
    val oldDf = (Seq.fill(60)("a") ++ Seq.fill(40)("b")).toDF("k")
    val newDf = (Seq.fill(30)("a") ++ Seq.fill(60)("b") ++ Seq.fill(10)("c")).toDF("k")
    val got = Stats.chiSquareDrift(oldDf, newDf, "k")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), Option(r.get(4))))).toMap
    // totals 100 old, 100 new → e(a)=60, e(b)=40
    assert(got("a")._3 == 60.0)
    assert(got("a")._4.get == 15.0) // (30-60)^2/60
    assert(got("b")._4.get == 10.0) // (60-40)^2/40
    assert(got("c") == ((0L, 10L, 0.0, None))) // new category flagged, not inflated
  }

  test("chiSquareDrift: category vanished from new side contributes e exactly") {
    import spark.implicits._
    val oldDf = (Seq.fill(50)("a") ++ Seq.fill(50)("gone")).toDF("k")
    val newDf = Seq.fill(100)("a").toDF("k")
    val got = Stats.chiSquareDrift(oldDf, newDf, "k")
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    // e(gone) = 100*50/100 = 50; (0-50)^2/50 = 50
    assert(got("gone") == 50.0)
  }

  test("decayedStats: exact halving per bucket, cap, and raw counts") {
    import spark.implicits._
    // buckets of 10; max ts = 100
    val df = Seq(
      ("x", 100L, 8.0),  // age 0 → w 1
      ("x", 90L, 8.0),   // age 1 → w 0.5
      ("x", 75L, 8.0),   // age 2 → w 0.25
      ("y", 100L, 3.0),
      ("y", 0L, 3.0)     // age 10 → w 2^-10
    ).toDF("t", "ts", "value")
    val got = EventAnalytics.decayedStats(df, Seq("t"), col("value"), bucketTs = 10L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got("x") == ((3L, 1.75, 14.0)))
    assert(got("y") == ((2L, 1.000977, 3.00293)))
  }

  test("decayedStats: maxAgeBuckets caps the shift; partition-invariant") {
    import spark.implicits._
    val df = (0 to 200).map(i => ("x", i.toLong, 1.0)).toDF("t", "ts", "value")
    val a = EventAnalytics.decayedStats(df, Seq("t"), col("value"), bucketTs = 1L,
      maxAgeBuckets = 5).collect().head
    val b = EventAnalytics.decayedStats(df.repartition(17), Seq("t"), col("value"),
      bucketTs = 1L, maxAgeBuckets = 5).collect().head
    assert(a == b)
    // ages 0..5 weights 1..1/32, then 195 rows pinned at 1/32
    val expect = (0 to 4).map(i => math.pow(0.5, i)).sum + 196 * math.pow(0.5, 5)
    assert(math.abs(a.getDouble(2) - BigDecimal(expect).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("mutualKnnClusters: mutual pairs cluster, hub asymmetry does not glue, singletons self-label") {
    import spark.implicits._
    // two tight pairs far apart + an isolated point; 2-d vectors as doubles
    val rows = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.99f, 0.1f)),
      (10L, Array(0.0f, 1.0f)),
      (11L, Array(0.1f, 0.99f)),
      (99L, Array(-1.0f, -1.0f))
    ).toDF("vec_id", "embedding")
    val got = SimilaritySearch.mutualKnnClusters(spark, rows, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L, 99L -> 99L))
  }

  test("mutualKnnClusters: every row labeled; labels are component minima") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val rows = (0 until 40).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val got = SimilaritySearch.mutualKnnClusters(spark, rows, k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 40)
    // a cluster id is always one of its members and the minimum of them
    got.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keySet.min == cid)
    }
  }

  test("mutualKnnClusters: exact duplicates collapse to one vertex and expand into the rep's cluster") {
    import spark.implicits._
    // duplicate family {1,2,3,4,5,6} of one vector (6 copies ≫ k) + a tight
    // pair far away: with k=1 the copies must NOT consume neighbor slots —
    // all six land in cluster 1, the pair stays its own cluster.
    val fam = (1L to 6L).map(i => (i, Array(1.0f, 0.0f)))
    val rows = (fam ++ Seq(
      (10L, Array(0.0f, 1.0f)),
      (11L, Array(0.1f, 0.99f)))).toDF("vec_id", "embedding")
    val got = SimilaritySearch.mutualKnnClusters(spark, rows, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 8)
    (1L to 6L).foreach(i => assert(got(i) == 1L, s"copy $i joins the family cluster"))
    assert(got(10L) == 10L && got(11L) == 10L)
    graft.Caches.clear()
  }

  test("collapseExactDuplicates: zero vectors never collapse; reps are family minima") {
    import spark.implicits._
    val rows = Seq(
      (5L, Array(1.0f, 2.0f)), (3L, Array(1.0f, 2.0f)), // family rep = 3
      (7L, Array(0.0f, 0.0f)), (8L, Array(0.0f, 0.0f)), // zero: stay apart
      (9L, Array(4.0f, 4.0f))
    ).toDF("vec_id", "embedding")
    val (reps, members) = SimilaritySearch.collapseExactDuplicates(rows, "embedding", "vec_id")
    val repIds = reps.collect().map(_.getLong(0)).toSet
    assert(repIds == Set(3L, 7L, 8L, 9L))
    val m = members.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(5L -> 3L, 3L -> 3L, 7L -> 7L, 8L -> 8L, 9L -> 9L))
  }

  test("mutualKnnClustersApprox: nprobe = k probes every cell → ≡ exact path") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 40).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val exact = SimilaritySearch.mutualKnnClusters(spark, rows, k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // probing ALL cells removes the only approximation — the IVF-fed
    // pipeline (index → cell-join kNN → mutualEdges → componentLabels)
    // must reproduce the exact clustering verbatim
    val all = SimilaritySearch.mutualKnnClustersApprox(spark, rows, k = 2,
        SimilaritySearch.IvfIndex(k = 4, nprobe = 4))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(all == exact)
    // a restricted probe still labels EVERY row with component-minimum ids
    val narrow = SimilaritySearch.mutualKnnClustersApprox(spark, rows, k = 2,
        SimilaritySearch.IvfIndex(k = 4, nprobe = 1))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(narrow.size == 40)
    narrow.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keySet.min == cid)
    }
    graft.Caches.clear()
  }

  test("mutualEdges: only reciprocal kNN pairs survive, canonical order") {
    import spark.implicits._
    val nn = Seq(
      (1L, 2L), (2L, 1L), // mutual
      (3L, 1L),           // asymmetric (hub attraction) — dies
      (4L, 5L), (5L, 4L), (5L, 6L)
    ).toDF("query_id", "neighbor_id")
    val got = SimilaritySearch.mutualEdges(nn)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (4L, 5L)))
  }

  test("entropyLDiversity: uniform group maxes effective l; skew passes distinct-l yet fails") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val df = Seq(
      ("u", "a"), ("u", "b"), ("u", "c"), ("u", "d"), // uniform over 4 values
      ("s", "a"), ("s", "a"), ("s", "a"), ("s", "b") // 2 distinct, one dominant
    ).toDF("g", "v")
    val got = Privacy.entropyLDiversity(df, Seq("g"), "v", l = 2.0)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(4), r.getBoolean(5)))).toMap
    assert(got("u") == ((4L, 4L, 4.0, true))) // e^{ln 4} exactly
    // H = ln 4 − (3 ln 3)/4 → e^H = 4/3^{3/4} ≈ 1.7548 < 2: distinct-l 2 passes, entropy fails
    val eff = r6(math.exp(math.log(4.0) - 3 * math.log(3.0) / 4))
    assert(got("s") == ((4L, 2L, eff, false)))
    // null sensitive rows disclose nothing and don't count
    val withNull = Privacy.entropyLDiversity(
      Seq(("u", Some("a")), ("u", Some("b")), ("u", None)).toDF("g", "v"), Seq("g"), "v")
      .collect().head
    assert(withNull.getLong(1) == 2L && withNull.getLong(2) == 2L)
  }
}
