package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StatsSpec extends SparkSpec {

  test("histogram: clamped edge bins, derived edges, nothing dropped") {
    import spark.implicits._
    val df = Seq(-5.0, 0.0, 3.0, 9.9, 10.0, 15.0, 19.9, 20.0, 42.0)
      .toDF("v")
    val got = Stats.histogram(df, col("v"), lo = 0.0, hi = 20.0, bins = 2)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3))))
      .toMap
    // -5 clamps into bin 0; 10.0 goes UP (floor semantics); 20 and 42 clamp into bin 1
    assert(got == Map(
      0L -> ((0.0, 10.0, 4L)),
      1L -> ((10.0, 20.0, 5L))))
    assert(got.values.map(_._3).sum == df.count())
  }

  test("histogram: per-stratum bins stay independent") {
    import spark.implicits._
    val df = Seq(("x", 1.0), ("x", 1.0), ("y", 9.0)).toDF("s", "v")
    val got = Stats.histogram(df, col("v"), lo = 0.0, hi = 10.0, bins = 10,
        strataCols = Seq("s"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(4)).toMap
    assert(got == Map(("x", 1L) -> 2L, ("y", 9L) -> 1L))
  }

  test("linearFit: exact line recovered; hand-computed closed form on a small set") {
    import spark.implicits._
    // exact line y = 2x + 1 → corr 1, slope 2, intercept 1
    val line = (1 to 10).map(i => (i.toDouble, 2.0 * i + 1.0)).toDF("x", "y")
    val l = Stats.linearFit(line, col("x"), col("y")).collect().head
    assert(l.getLong(0) == 10L)
    assert(l.getDouble(1) == 1.0 && l.getDouble(2) == 2.0 && l.getDouble(3) == 1.0)
    // hand-computed: x=(1,2,3), y=(1,2,4) → sx=6 sy=7 sxy=17 sxx=14 syy=21;
    // covN=9, varXN=6, varYN=14 → corr=9/√84≈0.981981, slope=1.5,
    // intercept=(7−9)/3≈−0.666667
    val tri = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 4.0)).toDF("x", "y")
    val t = Stats.linearFit(tri, col("x"), col("y")).collect().head
    assert(t.getLong(0) == 3L)
    assert(t.getDouble(1) == 0.981981)
    assert(t.getDouble(2) == 1.5)
    assert(t.getDouble(3) == -0.666667)
  }

  test("linearFit: strata fit independently; null pairs skipped") {
    import spark.implicits._
    val df = Seq(
      ("a", Some(1.0), Some(3.0)), ("a", Some(2.0), Some(5.0)), ("a", Some(3.0), Some(7.0)),
      ("b", Some(1.0), Some(10.0)), ("b", Some(2.0), Some(8.0)), ("b", Some(3.0), Some(6.0)),
      ("a", None, Some(99.0)), ("b", Some(99.0), None) // excluded, don't bend the fits
    ).toDF("s", "x", "y")
    val got = Stats.linearFit(df, col("x"), col("y"), strataCols = Seq("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got("a") == ((3L, 1.0, 2.0, 1.0)))     // y = 2x + 1
    assert(got("b") == ((3L, -1.0, -2.0, 12.0)))  // y = −2x + 12
  }

  test("linearFit: zero-variance sides yield NULLs, not division blowups") {
    import spark.implicits._
    // constant x: varXN = 0 → corr/slope/intercept all NULL
    val cx = Seq((5.0, 1.0), (5.0, 2.0), (5.0, 3.0)).toDF("x", "y")
    val rx = Stats.linearFit(cx, col("x"), col("y")).collect().head
    assert(rx.getLong(0) == 3L && rx.isNullAt(1) && rx.isNullAt(2) && rx.isNullAt(3))
    // constant y: corr NULL (varYN = 0) but the flat line itself is exact
    val cy = Seq((1.0, 7.0), (2.0, 7.0), (3.0, 7.0)).toDF("x", "y")
    val ry = Stats.linearFit(cy, col("x"), col("y")).collect().head
    assert(ry.isNullAt(1) && ry.getDouble(2) == 0.0 && ry.getDouble(3) == 7.0)
  }

  test("linearFit: partitioning-invariant (decimal sums are exact, order-free)") {
    import spark.implicits._
    // doubles with awkward partial sums; a double-summed corr could differ
    // across partitionings — the decimal formulation cannot
    val df = (1 to 1000).map(i => (i * 0.1 + 0.003, math.sin(i) * 100.0 + i * 0.25))
      .toDF("x", "y")
    val a = Stats.linearFit(df, col("x"), col("y")).collect().head
    val b = Stats.linearFit(df.repartition(17), col("x"), col("y")).collect().head
    assert(a == b, "fit must not depend on input partitioning")
  }

  test("quantileProfile: value at max(1, ceil(p·n)); ties safe; partition-invariant") {
    import spark.implicits._
    // stratum a: 1..10 → p50 = rank 5 → 5; p90 = rank 9 → 9; p100 → 10.
    // stratum b: five equal values → every probe returns 7
    val df = ((1 to 10).map(v => ("a", v.toLong)) ++ (1 to 5).map(_ => ("b", 7L)))
      .toDF("s", "v")
    val got = Stats.quantileProfile(df, col("v"), Seq("s"), Seq(0.5, 0.9, 1.0))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("a", 0.5) -> 5L, ("a", 0.9) -> 9L, ("a", 1.0) -> 10L,
      ("b", 0.5) -> 7L, ("b", 0.9) -> 7L, ("b", 1.0) -> 7L), s"got $got")
    // tiny probe clamps to rank 1 (the minimum)
    val lo = Stats.quantileProfile(df, col("v"), Seq("s"), Seq(0.001))
      .where(col("s") === "a").collect().map(_.getLong(2)).toSeq
    assert(lo == Seq(1L))
    // repartitioning cannot change any selected value
    val a = Stats.quantileProfile(df, col("v"), Seq("s"), Seq(0.5, 0.9))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2)).toMap
    val b = Stats.quantileProfile(df.repartition(7), col("v"), Seq("s"), Seq(0.5, 0.9))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2)).toMap
    assert(a == b)
    intercept[IllegalArgumentException](
      Stats.quantileProfile(df, col("v"), Seq("s"), Seq(0.0)))
  }

  test("zscore: hand-computed per stratum; zero variance and nulls go NULL; partition-invariant") {
    import spark.implicits._
    // stratum a: values 1,2,3 → μ=2, σ_pop=√(2/3); z(1) = −1/√(2/3) ≈ −1.224745
    // stratum b: constant → NULL z
    val df = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("b", Some(5.0)), ("b", Some(5.0)), ("a", None)).toDF("s", "v")
    val got = Stats.zscore(df, col("v"), strataCols = Seq("s"))
      .collect().map(r => (r.getString(0), Option(r.get(1))) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got(("a", Some(1.0))) == Some(-1.224745) && got(("a", Some(3.0))) == Some(1.224745))
    assert(got(("a", Some(2.0))) == Some(0.0))
    assert(got(("b", Some(5.0))).isEmpty, "zero variance → NULL z")
    assert(got(("a", None)).isEmpty, "null value → NULL z")
    // decimal moments: identical under any partitioning
    val big = (1 to 1000).map(i => ("s", math.sin(i) * 50 + i * 0.01)).toDF("s", "v")
    val a = Stats.zscore(big, col("v"), Seq("s")).collect().map(_.toSeq).toSet
    val b = Stats.zscore(big.repartition(13), col("v"), Seq("s")).collect().map(_.toSeq).toSet
    assert(a == b)
    // global (no strata) path works via the broadcast cross join
    val g = Stats.zscore(df.where(col("s") === "a"), col("v"))
      .where(col("v") === 2.0).collect()
    assert(g.length == 1 && g.head.getDouble(2) == 0.0)
  }

  test("ntileBins: near-equal group sizes, deterministic under ties") {
    import spark.implicits._
    // 10 rows, 4 bins -> sizes 3,3,2,2; equal values order by the id tie-break
    val df = (1 to 10).map(i => (i.toLong, 5.0)).toDF("id", "v")
    val got = Stats.ntileBins(df, bins = 4, orderCols = Seq(col("v"), col("id")))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 1L, 6L -> 1L,
      7L -> 2L, 8L -> 2L, 9L -> 3L, 10L -> 3L))
  }

  test("ntileBins: strata partition independently") {
    import spark.implicits._
    val df = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 3L, 1.0), ("b", 4L, 2.0))
      .toDF("s", "id", "v")
    val got = Stats.ntileBins(df, bins = 2, orderCols = Seq(col("v"), col("id")),
        strataCols = Seq("s"))
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 0L, 4L -> 1L))
  }

  test("robustOutliers: hand-computed med/MAD; the heavy tail flags where zscore would not") {
    import spark.implicits._
    // values 1..9 (med = 5 at rank ceil(9/2)=5, devs 4,3,2,1,0,1,2,3,4 →
    // sorted 0,1,1,2,2,3,3,4,4, MAD = value at rank 5 = 2) plus one huge
    // outlier making n=10: med = value at rank 5 of the 10 = 5, devs now
    // include 9995; MAD = rank-5 of 0,1,1,2,2,3,3,4,4,9995 = 2
    val vals = (1L to 9L) :+ 10000L
    val df = vals.map(("x", _)).toDF("s", "v")
    val got = Stats.robustOutliers(df, col("v"), strataCols = Seq("s"))
      .select(col("v"), col("med"), col("mad"), col("rscore"), col("is_outlier"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    assert(got(1L) == ((5L, 2L, 2.0, false)))
    assert(got(10000L) == ((5L, 2L, 4997.5, true)))
    // the same corpus through zscore: σ is inflated by the outlier so the
    // tail point sits barely 2.8σ out — the robust score sees 4997 MADs
    val z = Stats.zscore(df, col("v"), strataCols = Seq("s"))
      .where(col("v") === 10000L).head().getAs[Double]("z")
    assert(math.abs(z) < 3.5)
  }

  test("robustOutliers: zero-MAD stratum yields NULL score and flag; strata independent") {
    import spark.implicits._
    val df = Seq(("a", 7L), ("a", 7L), ("a", 7L), ("a", 99L),
                 ("b", 1L), ("b", 2L), ("b", 3L)).toDF("s", "v")
    val rows = Stats.robustOutliers(df, col("v"), strataCols = Seq("s")).collect()
    val a99 = rows.find(r => r.getAs[String]("s") == "a" && r.getAs[Long]("v") == 99L).get
    // stratum a: med 7, devs 0,0,0,92 → MAD 0 → NULLs, never a division error
    assert(a99.getAs[Long]("mad") == 0L)
    assert(a99.isNullAt(a99.fieldIndex("rscore")) && a99.isNullAt(a99.fieldIndex("is_outlier")))
    val b2 = rows.find(r => r.getAs[String]("s") == "b" && r.getAs[Long]("v") == 2L).get
    // stratum b: med 2, devs 1,0,1 → MAD 1
    assert(b2.getAs[Long]("med") == 2L && b2.getAs[Long]("mad") == 1L
      && b2.getAs[Double]("rscore") == 0.0)
  }

  test("robustOutliers: no strata = one global stratum; partitioning-invariant") {
    import spark.implicits._
    val df = (1L to 100L).toDF("v")
    val g1 = Stats.robustOutliers(df, col("v"))
      .select("v", "med", "mad", "rscore").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val g2 = Stats.robustOutliers(df.repartition(7), col("v"))
      .select("v", "med", "mad", "rscore").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(g1 == g2)
    assert(g1(50L)._1 == 50L && g1(50L)._2 == 25L)
  }

  test("keySkewReport: top-k ranks, shares and skew factors exact; tie by key") {
    import spark.implicits._
    // key a: 6 rows, b: 3, c: 3, d: 1, e: 1 → total 14, nkeys 5, mean 2.8
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq.fill(3)("c") ++
      Seq("d", "e")).toDF("k")
    val got = Stats.keySkewReport(df, col("k"), topK = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      ("a", 6L, 1, 0.428571, 2.142857),   // 6/14, 6*5/14
      ("b", 3L, 2, 0.214286, 1.071429),   // tie 3-3 broken by key
      ("c", 3L, 3, 0.214286, 1.071429)))
  }

  test("profile: nulls, exact distincts, native-type min/max per column") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("b"), Some(10L)),
      (2L, Some("a"), Some(9L)),     // numeric min 9 beats lexicographic "10"
      (3L, None, Some(10L)),
      (4L, Some("a"), None)).toDF("id", "s", "v")
    val got = Stats.profile(df, Seq("id", "s", "v"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("id", "s", "v"))
    val id = got("id")
    assert(id.getLong(1) == 4L && id.getLong(2) == 4L && id.getDouble(3) == 0.0)
    assert(id.getLong(4) == 4L && id.getString(5) == "1" && id.getString(6) == "4")
    val s = got("s")
    assert(s.getLong(2) == 3L && s.getDouble(3) == 0.25 && s.getLong(4) == 2L)
    assert(s.getString(5) == "a" && s.getString(6) == "b")
    val v = got("v")
    // min/max computed on LONG, not string: min is 9, not "10"
    assert(v.getString(5) == "9" && v.getString(6) == "10")
    assert(v.getLong(2) == 3L && v.getLong(4) == 2L)
  }

  test("profile plans ONE aggregation pass (a single Expand, no per-column scans)") {
    import spark.implicits._
    val df = (1L to 50L).map(i => (i, s"s$i")).toDF("a", "b")
    val plan = Stats.profile(df, Seq("a", "b")).queryExecution.executedPlan.toString
    assert(plan.contains("Expand"),
      s"multi-column distincts should plan as one Expand:\n$plan")
    assert(!plan.contains("Union"), s"profile must be one pass, not per-column scans:\n$plan")
  }

  test("fdViolations: only multi-rhs keys surface; null-rhs ignored by countDistinct") {
    import spark.implicits._
    val df = Seq(
      ("o1", "c1"), ("o1", "c1"),          // clean key
      ("o2", "c1"), ("o2", "c2"),          // violation
      ("o3", null.asInstanceOf[String])).toDF("k", "r")
    val got = Stats.fdViolations(df, Seq("k"), col("r")).collect()
    assert(got.length == 1)
    assert(got.head.getString(0) == "o2" && got.head.getLong(1) == 2L &&
      got.head.getLong(2) == 2L)
  }

  test("weightedQuantileProfile: hand-computed crossings; zero/null weights excluded") {
    import spark.implicits._
    // values 10(w1), 20(w3), 30(w6) → W=10; p=.5 → target 5 → first cw>=5 is 20(cw=4)? no:
    // cw: 10→1, 20→4, 30→10. target(.5)=5 → 30; target(.3)=3 → 20; target(.1)=1 → 10
    val df = Seq((10L, 1L, 1L), (20L, 3L, 2L), (30L, 6L, 3L), (99L, 0L, 4L))
      .toDF("v", "w", "id")
    val got = Stats.weightedQuantileProfile(df, col("v"), col("w"),
        strataCols = Nil, ps = Seq(0.1, 0.3, 0.5), tieCol = col("id"))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(got == Map(0.1 -> 10L, 0.3 -> 20L, 0.5 -> 30L))
  }

  test("auc: perfect separation = 1, anti-separation = 0, random-ish mid, ties midrank") {
    import spark.implicits._
    val perfect = Seq((0.1, false), (0.2, false), (0.8, true), (0.9, true))
      .toDF("s", "y")
    assert(Stats.auc(perfect, col("s"), col("y")).head().getDouble(2) == 1.0)
    val anti = Seq((0.9, false), (0.8, false), (0.1, true), (0.2, true)).toDF("s", "y")
    assert(Stats.auc(anti, col("s"), col("y")).head().getDouble(2) == 0.0)
    // hand-computed with ties: scores (.5,.5,.5,.9), labels (F,T,F,T)
    // midrank of the .5 group = 2 → pos ranks 2 + 4 = 6; U = 6 - 2*3/2 = 3
    // AUC = 3 / (2*2) = 0.75
    val ties = Seq((0.5, false), (0.5, true), (0.5, false), (0.9, true)).toDF("s", "y")
    val r = Stats.auc(ties, col("s"), col("y")).head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L && r.getDouble(2) == 0.75)
    // degenerate: one class only → NULL
    val one = Seq((0.5, true), (0.9, true)).toDF("s", "y")
    assert(Stats.auc(one, col("s"), col("y")).head().isNullAt(2))
  }

  test("prAtThresholds: hand-computed confusion counts and metrics") {
    import spark.implicits._
    val df = Seq((0.9, true), (0.8, false), (0.6, true), (0.4, true), (0.2, false))
      .toDF("s", "y")
    val got = Stats.prAtThresholds(df, col("s"), col("y"), Seq(0.5, 0.95))
      .collect().map(r => r.getDouble(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) null else r.getDouble(4),
          if (r.isNullAt(5)) null else r.getDouble(5)))).toMap
    // t=0.5: predicted {.9,.8,.6} → tp=2 fp=1 fn=1; p=2/3 r=2/3
    assert(got(0.5) == ((2L, 1L, 1L, 0.666667, 0.666667)))
    // t=0.95: nothing predicted → tp=0 fp=0 fn=3; precision NULL, recall 0
    assert(got(0.95) == ((0L, 0L, 3L, null, 0.0)))
  }

  test("calibrationCurve: a perfectly calibrated score reproduces its rate per bin") {
    import spark.implicits._
    // 100 rows, score = i/100; label true iff i > 50 (rank-aligned)
    val df = (1L to 100L).map(i => (i, i / 100.0, i > 50)).toDF("id", "s", "y")
    val got = Stats.calibrationCurve(df, col("s"), col("y"), bins = 4, tieCol = col("id"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(got.keySet == Set(0L, 1L, 2L, 3L))
    assert(got.values.forall(_._1 == 25L), "equal-count bins")
    // bin 0: scores .01..[.25] mean .13, rate 0; bin 3: .76..1.0 mean .88, rate 1
    assert(got(0L)._2 == 0.13 && got(0L)._3 == 0.0)
    assert(got(3L)._2 == 0.88 && got(3L)._3 == 1.0)
    // bin 2: scores .51..0.75 → labels i>50 all true
    assert(got(2L)._3 == 1.0)
    assert(got(1L)._3 == 0.0)
  }

  test("imputeMedian: per-stratum rank median fills nulls; all-null stratum keeps nulls") {
    import spark.implicits._
    val df = Seq(
      ("a", Some(10L)), ("a", Some(20L)), ("a", Some(30L)), ("a", None),
      ("b", Some(7L)), ("b", None),
      ("c", None)).map { case (s, v) => (s, v.map(Long.box).orNull) }
      .toDF("s", "v")
    val got = Stats.imputeMedian(df, "v", Seq("s"))
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) null else r.getLong(1), r.getBoolean(2)))
    // a: median of (10,20,30) = 20 (rank ceil(1.5)=2); b: median 7
    assert(got.count { case ("a", v, imp) => imp && v == 20L; case _ => false } == 1)
    assert(got.count { case ("b", v, imp) => imp && v == 7L; case _ => false } == 1)
    // c has nothing to impute from: null survives, flag false
    assert(got.collect { case ("c", v, imp) => (v, imp) }.toSeq == Seq((null, false)))
    assert(got.count(_._2 == null) == 1)
  }

  test("winsorize: clamps into the [p-lo, p-hi] band; nulls stay null") {
    import spark.implicits._
    val df = ((1L to 100L).map(v => ("a", Long.box(v))) :+ (("a", null.asInstanceOf[java.lang.Long])))
      .toDF("s", "v")
    val got = Stats.winsorize(df, col("v"), Seq("s"), loP = 0.05, hiP = 0.95)
      .collect().map(r => (if (r.isNullAt(1)) null else r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2))).toMap
    // bands: lo = value at rank 5 = 5, hi = rank 95 = 95
    assert(got(1L) == 5L && got(4L) == 5L && got(5L) == 5L)
    assert(got(50L) == 50L)
    assert(got(95L) == 95L && got(96L) == 95L && got(100L) == 95L)
    assert(got(null) == null, "null value must stay null, not clamp to a band edge")
  }

  test("weightedQuantileProfile: uniform weights reduce to quantileProfile") {
    import spark.implicits._
    val df = (1L to 97L).map(i => (i, 1L)).toDF("v", "id")
    val ps = Seq(0.25, 0.5, 0.9, 1.0)
    val wq = Stats.weightedQuantileProfile(df, col("v"), lit(1L), Nil, ps, col("id"))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    val q = Stats.quantileProfile(df, col("v"), Nil, ps)
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(wq == q)
  }

  test("modeBy: majority wins; ties break toward the greatest value; keys independent") {
    import spark.implicits._
    val df = Seq(
      ("a", "x"), ("a", "x"), ("a", "y"),           // clear majority x
      ("b", "p"), ("b", "q"),                       // tie → greatest value q
      ("c", "z")                                    // singleton
    ).toDF("k", "v")
    val got = Stats.modeBy(df, col("v"), Seq("k"))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got == Map("a" -> (("x", 2L)), "b" -> (("q", 1L)), "c" -> (("z", 1L))))
  }

  test("modeBy is partitioning-invariant") {
    import spark.implicits._
    val rows = (1 to 500).map(i => (s"k${i % 7}", s"v${(i * 13) % 5}"))
    val df1 = rows.toDF("k", "v").repartition(1)
    val df17 = rows.toDF("k", "v").repartition(17)
    val a = Stats.modeBy(df1, col("v"), Seq("k")).collect().toSet
    val b = Stats.modeBy(df17, col("v"), Seq("k")).collect().toSet
    assert(a == b)
  }

  test("skyline: equals brute-force dominance on a pseudorandom point set") {
    import spark.implicits._
    // deterministic pseudorandom points with plenty of x/y ties
    val pts = (1 to 400).map { i =>
      (s"g${i % 2}", ((i * 7919) % 23).toDouble, ((i * 104729) % 19).toDouble)
    }
    val df = pts.toDF("g", "x", "y")
    val got = Stats.skyline(df, col("x"), col("y"), Seq("g"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3))).toSet
    val distinct = pts.groupBy(identity).map { case (p, l) => (p._1, p._2, p._3, l.size.toLong) }
    val brute = distinct.filter { case (g, x, y, _) =>
      !distinct.exists { case (g2, x2, y2, _) =>
        g2 == g && x2 >= x && y2 >= y && (x2 > x || y2 > y)
      }
    }.toSet
    assert(got == brute && got.nonEmpty)
  }

  test("poissonThresholds: a valid CDF grid (strictly rising, → granularity)") {
    val t = Stats.poissonThresholds
    assert(t.size == 9)
    assert(t == t.sorted && t.distinct == t)
    assert(t.head == 367879L) // e⁻¹ on the 1e6 grid
    assert(t.last <= Sampling.Granularity && t.last >= Sampling.Granularity - 2)
  }

  test("bootstrapMeanCI: brackets the true mean, deterministic, partition-invariant") {
    import spark.implicits._
    val df = (1L to 400L).map(i => (i, (i % 50).toDouble)).toDF("id", "v")
    val ci = Stats.bootstrapMeanCI(df, col("v"), col("id"), b = 100)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val lo = ci(0.025); val hi = ci(0.975)
    val mean = (0 until 50).map(_.toDouble).sum / 50.0 // 24.5
    assert(lo < mean && mean < hi, s"CI [$lo, $hi] should bracket $mean")
    assert(hi - lo < 10.0, s"CI [$lo, $hi] implausibly wide")
    val ci2 = Stats.bootstrapMeanCI(df.repartition(13), col("v"), col("id"), b = 100)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(ci2 == ci)
  }

  test("quantileNormalize: one stratum is the identity; two strata map onto global ranks") {
    import spark.implicits._
    val one = (1L to 20L).map(i => (i, "s", i * 3.0)).toDF("id", "g", "v")
    val idy = Stats.quantileNormalize(one, col("v"), Seq("g"), col("id"))
      .collect().map(r => r.getDouble(2) -> r.getDouble(3))
    assert(idy.forall { case (v, n) => v == n })
    graft.Caches.clear()
    // strata of equal size: each stratum's ranks map to 2rn-th global value
    val two = ((1L to 5L).map(i => (i, "a", i * 10.0)) ++
      (6L to 10L).map(i => (i, "b", i * 1.0))).toDF("id", "g", "v")
    val got = Stats.quantileNormalize(two, col("v"), Seq("g"), col("id"))
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toMap
    // global sorted values: 6,7,8,9,10,10,20,30,40,50 (rank 1..10)
    // stratum a (10..50, rn 1..5 of n=5) → global ranks 2,4,6,8,10 → 7,9,10,30,50
    val globalSorted = Seq(6.0, 7.0, 8.0, 9.0, 10.0, 10.0, 20.0, 30.0, 40.0, 50.0)
    assert(got(1L) == globalSorted(1) && got(2L) == globalSorted(3) &&
      got(3L) == globalSorted(5) && got(4L) == globalSorted(7) &&
      got(5L) == globalSorted(9))
    assert(got(6L) == globalSorted(1) && got(10L) == globalSorted(9))
    graft.Caches.clear()
  }

  test("hist partials: any batch split merges to the direct histogram; quantile bins exact") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, i)).toDF("id", "v")
    val direct = Stats.histogram(df, col("v"), 0.0, 100.0, 10).select("bin", "n")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val merged = Stats.histMerge(Seq(
        Stats.histPartials(df.where(col("id") % 3 === 0), col("v"), 0.0, 100.0, 10),
        Stats.histPartials(df.where(col("id") % 3 === 1), col("v"), 0.0, 100.0, 10),
        Stats.histPartials(df.where(col("id") % 3 === 2), col("v"), 0.0, 100.0, 10)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged == direct)
    // rank 50 (p=.5) → value 50 → bin 5 ([50,60)); rank 90 → value 90 → bin 9
    val q = Stats.quantilesFromHist(
        Stats.histMerge(Seq(Stats.histPartials(df, col("v"), 0.0, 100.0, 10))),
        0.0, 100.0, 10, Seq(0.5, 0.9))
      .collect().map(r => r.getDouble(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(q(0.5) == ((5L, 50.0, 60.0)))
    assert(q(0.9) == ((9L, 90.0, 100.0)))
  }

  test("psi: hand-computed contributions; one-sided bins dropped and counted") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // A={1,1,3}, B={1,3,3} on [0,4)×2: contributions (1/3)ln2 each
    val df = (Seq(1, 1, 3).map(v => (v, true)) ++ Seq(1, 3, 3).map(v => (v, false)))
      .toDF("v", "y")
    val r = Stats.psi(df, col("v"), col("y"), lo = 0.0, hi = 4.0, bins = 2)
      .collect().head
    val p0 = 2.0 / 3; val q0 = 1.0 / 3
    val c0 = (p0 - q0) * math.log(p0 / q0)
    val p1 = 1.0 / 3; val q1 = 2.0 / 3
    val c1 = (p1 - q1) * math.log(p1 / q1)
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getLong(2) == 2L && r.getLong(3) == 0L)
    assert(r.getDouble(4) == r6(c0 + c1))
    // A={1,1,5}, B={1,3} on [0,6)×3: bin1 (B only) and bin2 (A only) drop
    val df2 = (Seq(1, 1, 5).map(v => (v, true)) ++ Seq(1, 3).map(v => (v, false)))
      .toDF("v", "y")
    val r2 = Stats.psi(df2, col("v"), col("y"), lo = 0.0, hi = 6.0, bins = 3)
      .collect().head
    assert(r2.getLong(2) == 1L && r2.getLong(3) == 2L)
    val pa = 2.0 / 3; val qa = 1.0 / 2
    assert(r2.getDouble(4) == r6((pa - qa) * math.log(pa / qa)))
    // identical distributions: psi exactly 0 (contributions all ln(1))
    val same = (Seq(1, 3).map(v => (v, true)) ++ Seq(1, 3).map(v => (v, false)))
      .toDF("v", "y")
    assert(Stats.psi(same, col("v"), col("y"), 0.0, 4.0, 2)
      .collect().head.getDouble(4) == 0.0)
  }

  test("psiFromHists ≡ inline psi, including one-sided dropped bins") {
    import spark.implicits._
    val df = (Seq(1, 1, 5, 3).map(v => (v, true)) ++ Seq(1, 3, 3).map(v => (v, false)))
      .toDF("v", "y")
    val inline = Stats.psi(df, col("v"), col("y"), lo = 0.0, hi = 6.0, bins = 3)
      .collect().head
    val state = Stats.psiFromHists(
        Stats.histPartials(df.where(col("y")), col("v"), 0.0, 6.0, 3),
        Stats.histPartials(df.where(!col("y")), col("v"), 0.0, 6.0, 3))
      .collect().head
    assert(state == inline)
  }

  test("gainsTable: hand-computed deciles, gains and lift") {
    import spark.implicits._
    // scores 10..1; positives at ranks 1,2,3 and 7; 5 bins of 2
    val df = (1 to 10).map(i => (i.toLong, (11 - i).toDouble, Set(1, 2, 3, 7)(i)))
      .toDF("id", "score", "y")
    val got = Stats.gainsTable(df, col("score"), col("y"), bins = 5, tieCol = col("id"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got(0L) == ((2L, 2L, 2L, 0.5, 2.5)))
    assert(got(1L) == ((2L, 1L, 3L, 0.75, 1.875)))
    assert(got(2L) == ((2L, 0L, 3L, 0.75, 1.25)))
    assert(got(3L) == ((2L, 1L, 4L, 1.0, 1.25)))
    assert(got(4L) == ((2L, 0L, 4L, 1.0, 1.0)))
  }

  test("anovaF: hand-computed F; identical groups → 0; zero within-variance → NULL") {
    import spark.implicits._
    // a=(1,2,3), b=(4,5,6): SSB = 13.5, SSW = 4, F = 13.5/(4/4) = 13.5
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 4.0), ("b", 5.0), ("b", 6.0))
      .toDF("g", "v")
    val r = Stats.anovaF(df, col("v"), col("g")).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 6L)
    assert(r.getLong(2) == 1L && r.getLong(3) == 4L)
    assert(r.getDouble(4) == 13.5)
    // identical group means → F = 0
    val same = Seq(("a", 1.0), ("a", 3.0), ("b", 1.0), ("b", 3.0)).toDF("g", "v")
    assert(Stats.anovaF(same, col("v"), col("g")).collect().head.getDouble(4) == 0.0)
    // all-constant values: SSW = 0 → NULL (not infinity)
    val const = Seq(("a", 5.0), ("a", 5.0), ("b", 5.0)).toDF("g", "v")
    assert(Stats.anovaF(const, col("v"), col("g")).collect().head.isNullAt(4))
  }

  test("benford: string-extracted digits, exact shares, sub-1 values excluded") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val df = Seq(1.5, 19.0, 100.0, 2.2, 0.5, 0.01).toDF("v") // last two out of domain
    val got = Stats.benford(df, col("v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val e1 = math.log10(2.0); val e2 = math.log10(1.5)
    assert(got("1") == ((3L, 0.75, r6(e1), r6(0.75 - e1))))
    assert(got("2") == ((1L, 0.25, r6(e2), r6(0.25 - e2))))
    assert(got.size == 2)
  }

  test("cramersV: hand 2×2, perfect association → 1, independence → 0, constant → NULL") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // x: 30×b1 + 10×b2; y: 10×b1 + 30×b2 → e = 20 per cell, χ² = 20, V = 0.5
    val hand = (Seq.fill(30)(("x", "b1")) ++ Seq.fill(10)(("x", "b2")) ++
      Seq.fill(10)(("y", "b1")) ++ Seq.fill(30)(("y", "b2"))).toDF("a", "b")
    val h = Stats.cramersV(hand, col("a"), col("b")).collect().head
    assert(h.getLong(0) == 80L && h.getLong(1) == 2L && h.getLong(2) == 2L)
    assert(h.getDouble(3) == 20.0 && h.getDouble(4) == r6(math.sqrt(20.0 / 80.0)))
    // diagonal-only 2×2: V = 1
    val diag = (Seq.fill(5)(("x", "b1")) ++ Seq.fill(7)(("y", "b2"))).toDF("a", "b")
    assert(Stats.cramersV(diag, col("a"), col("b")).collect().head.getDouble(4) == 1.0)
    // exact independence: V = 0
    val ind = (for { a <- Seq("x", "y"); b <- Seq("b1", "b2"); _ <- 1 to 3 }
      yield (a, b)).toDF("a", "b")
    assert(Stats.cramersV(ind, col("a"), col("b")).collect().head.getDouble(4) == 0.0)
    // constant side: undefined
    val const = Seq(("x", "b1"), ("x", "b2")).toDF("a", "b")
    assert(Stats.cramersV(const, col("a"), col("b")).collect().head.isNullAt(4))
  }

  test("spearmanCorr: monotone → 1, inverse → −1, ties averaged, constant → NULL") {
    import spark.implicits._
    val mono = (1 to 20).map(i => ("m", i.toDouble, (i * i).toDouble))
    val inv = (1 to 20).map(i => ("i", i.toDouble, (100 - i).toDouble))
    val const = (1 to 5).map(i => ("c", i.toDouble, 7.0))
    val df = (mono ++ inv ++ const).toDF("g", "x", "y")
    val got = Stats.spearmanCorr(df, col("x"), col("y"), Seq("g"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(2)) null else r.getDouble(2))).toMap
    assert(got("m") == 1.0 && got("i") == -1.0 && got("c") == null)
    // tie handling: x = (1,2,2,3), y = (1,2,3,4): rx = (1, 2.5, 2.5, 4)
    // hand Spearman = 0.9486832980505138 → round 0.948683
    val ties = Seq(("t", 1.0, 1.0), ("t", 2.0, 2.0), ("t", 2.0, 3.0), ("t", 3.0, 4.0))
      .toDF("g", "x", "y")
    val s = Stats.spearmanCorr(ties, col("x"), col("y"), Seq("g")).collect().head
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // moments: Σrx=10, Σry=10, Σrxry=29.5, Σrx²=29.5, Σry²=30
    // num = 4·29.5−100 = 18, dx = 18, dy = 20 → 18/(√18·√20)
    assert(s.getDouble(2) == r6(18.0 / (math.sqrt(18.0) * math.sqrt(20.0))))
  }

  test("ksTest: hand-computed D on overlapping step CDFs; identical samples → 0") {
    import spark.implicits._
    // A = {1,2,3,4}, B = {3,4,5,6}: F_A−F_B peaks at v=2 (2/4 − 0/4 = 0.5)
    val df = (Seq(1, 2, 3, 4).map(v => (v, true)) ++ Seq(3, 4, 5, 6).map(v => (v, false)))
      .toDF("v", "y")
    val r = Stats.ksTest(df, col("v"), col("y")).collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 4L)
    assert(r.getDouble(2) == 0.5)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(3) == r6(0.5 * math.sqrt(16.0 / 8)))
    // identical distributions: D = 0
    val same = (Seq(1, 2, 3).map(v => (v, true)) ++ Seq(1, 2, 3).map(v => (v, false)))
      .toDF("v", "y")
    assert(Stats.ksTest(same, col("v"), col("y")).collect().head.getDouble(2) == 0.0)
  }

  test("gini: uniform → 0; full concentration → (n−1)/n; hand case") {
    import spark.implicits._
    val uniform = (1 to 10).map(i => ("u", 7L)).toDF("g", "x")
    val concentrated = (("c", 100L) +: (1 to 9).map(_ => ("c", 0L))).toDF("g", "x")
    val hand = Seq(("h", 1L), ("h", 2L), ("h", 3L)).toDF("g", "x")
    val got = Stats.gini(uniform.unionByName(concentrated).unionByName(hand),
        col("x"), Seq("g"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("u") == ((10L, 70L, 0.0)))
    assert(got("c") == ((10L, 100L, 0.9)))
    // sorted 1,2,3: G = (2·(1+4+9) − 4·6)/(3·6) = (28−24)/18
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("h") == ((3L, 6L, r6(4.0 / 18.0))))
  }

  test("globalNtile ≡ window ntile for every (n, bins) shape, incl. desc order") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // deterministic pseudo-random values with ties, many partitions
    val df = (1 to 103).map(i => (i.toLong, (i * 37) % 10)).toDF("id", "v")
      .repartition(7)
    for (bins <- Seq(1, 3, 4, 10, 103, 200)) {
      val want = df.withColumn("bin",
          (ntile(bins).over(Window.orderBy(col("v"), col("id"))) - 1).cast("long"))
        .select(col("id"), col("bin")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = Stats.globalNtile(df, bins, Seq(col("v"), col("id")))
        .select(col("id"), col("bin")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"bins=$bins")
      graft.Caches.clear()
    }
    // descending order (the gainsTable shape) matches the window form too
    val wantD = df.withColumn("bin",
        (ntile(4).over(Window.orderBy(col("v").desc, col("id"))) - 1).cast("long"))
      .select(col("id"), col("bin")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gotD = Stats.globalNtile(df, 4, Seq(col("v").desc, col("id")))
      .select(col("id"), col("bin")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotD == wantD)
    // empty frame: no rows, no blowup
    assert(Stats.globalNtile(df.where(lit(false)), 4, Seq(col("id"))).count() == 0L)
    graft.Caches.clear()
  }

  test("runningTotals: k cumulative sums in one pass ≡ k runningTotal calls") {
    import spark.implicits._
    val df = (1 to 50).map(i => (i.toLong, (i % 7).toLong, (i % 3).toLong))
      .toDF("id", "w1", "w2").repartition(5)
    val both = Stats.runningTotals(df, Seq(col("id")),
        Seq(col("w1") -> "c1", col("w2") -> "c2"))
      .select(col("id"), col("c1"), col("c2")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val one1 = Stats.runningTotal(df, Seq(col("id")), col("w1"), "c1")
      .select(col("id"), col("c1")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val one2 = Stats.runningTotal(df, Seq(col("id")), col("w2"), "c2")
      .select(col("id"), col("c2")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 50L).foreach { i => assert(both(i) == ((one1(i), one2(i)))) }
    // exact closed form for the last row: full sums
    assert(both(50L)._1 == (1 to 50).map(_ % 7).sum.toLong)
    assert(both(50L)._2 == (1 to 50).map(_ % 3).sum.toLong)
    graft.Caches.clear()
  }

  test("ksFromHists: ≡ ksTest on bin-aligned values; merge ≡ whole") {
    import spark.implicits._
    val rows = (Seq(1, 2, 3, 4, 4, 5).map(v => (v, true)) ++
      Seq(3, 4, 5, 6, 7, 7).map(v => (v, false)))
    val df = rows.toDF("v", "y")
    // grid [0,8)×8 puts every distinct integer in its own bin → the binned
    // KS is the exact KS
    def st(lbl: Boolean, d: org.apache.spark.sql.DataFrame) =
      Stats.histPartials(d.where(col("y") === lbl), col("v"), 0.0, 8.0, 8)
    val exact  = Stats.ksTest(df, col("v"), col("y")).collect().head
    val binned = Stats.ksFromHists(st(true, df), st(false, df)).collect().head
    assert(binned.getLong(0) == exact.getLong(0) && binned.getLong(1) == exact.getLong(1))
    assert(binned.getDouble(2) == exact.getDouble(2))
    assert(binned.getDouble(3) == exact.getDouble(3))
    // mergeable-state contract: per-batch partials folded with histMerge
    // serve the identical statistic
    val (b1, b2) = (rows.take(4).toDF("v", "y"), rows.drop(4).toDF("v", "y"))
    val mergedA = Stats.histMerge(Seq(st(true, b1), st(true, b2)))
    val mergedB = Stats.histMerge(Seq(st(false, b1), st(false, b2)))
    val served = Stats.ksFromHists(mergedA, mergedB).collect().head
    assert(served == binned)
    graft.Caches.clear()
  }

  test("aucFromHist: ≡ auc on bin-aligned scores; scoreHistMerge ≡ inline") {
    import spark.implicits._
    // scores on the 0.1 grid in [0,1)×10 → one distinct score per bin
    val rows = Seq((0.1, 0), (0.2, 0), (0.2, 1), (0.4, 0), (0.5, 1),
      (0.7, 1), (0.7, 0), (0.8, 1))
    val df = rows.toDF("s", "y")
    val exact = Stats.auc(df, col("s"), col("y")).collect().head
    val state = Stats.scoreHistPartials(df, col("s"), col("y") === 1,
      lo = 0.0, hi = 1.0, bins = 10)
    val served = Stats.aucFromHist(state).collect().head
    assert(served.getLong(0) == exact.getLong(0) && served.getLong(1) == exact.getLong(1))
    assert(served.getDouble(2) == exact.getDouble(2))
    // merge ≡ inline
    val (b1, b2) = (rows.take(3).toDF("s", "y"), rows.drop(3).toDF("s", "y"))
    def st(d: org.apache.spark.sql.DataFrame) =
      Stats.scoreHistPartials(d, col("s"), col("y") === 1, 0.0, 1.0, 10)
    val merged = Stats.scoreHistMerge(Seq(st(b1), st(b2)))
    assert(Stats.aucFromHist(merged).collect().head == served)
    // degenerate single-class state → NULL auc
    val onePos = Stats.scoreHistPartials(df.where(col("y") === 1), col("s"),
      col("y") === 1, 0.0, 1.0, 10)
    assert(Stats.aucFromHist(onePos).collect().head.isNullAt(2))
    graft.Caches.clear()
  }

  test("mutualInformation: 0 when independent, H when determined, NULL NMI on constant side") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // independent: all 4 combinations equally likely → MI 0, H = ln 2 each
    val indep = Seq(("x", "u"), ("x", "v"), ("y", "u"), ("y", "v")).toDF("a", "b")
    val i = Stats.mutualInformation(indep, col("a"), col("b")).collect().head
    assert(i.getLong(0) == 4L)
    assert(i.getDouble(1) == r6(math.log(2.0)) && i.getDouble(2) == r6(math.log(2.0)))
    assert(i.getDouble(3) == 0.0 && i.getDouble(4) == 0.0)
    // perfectly dependent: MI = H, NMI = 1
    val dep = Seq(("x", "x"), ("x", "x"), ("y", "y"), ("y", "y")).toDF("a", "b")
    val d = Stats.mutualInformation(dep, col("a"), col("b")).collect().head
    assert(d.getDouble(3) == r6(math.log(2.0)) && d.getDouble(4) == 1.0)
    // constant b: zero entropy on one side → MI 0, NMI undefined
    val const = Seq(("x", "u"), ("y", "u")).toDF("a", "b")
    val c = Stats.mutualInformation(const, col("a"), col("b")).collect().head
    assert(c.getDouble(3) == 0.0 && c.isNullAt(4))
  }

  test("aucBySlice: per-slice hand values, tie midranks, one-class NULL, ≡ global on one slice") {
    import spark.implicits._
    val df = Seq(
      ("A", 0.9, 1), ("A", 0.8, 1), ("A", 0.7, 0), ("A", 0.1, 0), // separable → 1.0
      ("B", 0.9, 0), ("B", 0.1, 1),                               // inverted → 0.0
      ("C", 0.5, 1), ("C", 0.5, 0),                               // full tie → 0.5
      ("D", 0.4, 1), ("D", 0.6, 1)                                // one class → NULL
    ).toDF("src", "s", "y")
    val got = Stats.aucBySlice(df, col("s"), col("y"), Seq("src")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("A").getDouble(3) == 1.0 && got("B").getDouble(3) == 0.0)
    assert(got("C").getDouble(3) == 0.5 && got("D").isNullAt(3))
    assert(got("A").getLong(1) == 2L && got("A").getLong(2) == 2L)
    // a constant slice reproduces the global midrank AUC exactly
    val rnd = new scala.util.Random(7)
    val big = Seq.tabulate(200)(i =>
      ("all", math.rint(rnd.nextDouble() * 20) / 20, if (rnd.nextBoolean()) 1 else 0))
      .toDF("src", "s", "y")
    val sliced = Stats.aucBySlice(big, col("s"), col("y"), Seq("src")).collect().head
    val global = Stats.auc(big, col("s"), col("y")).collect().head
    assert(sliced.getDouble(3) == global.getDouble(2))
    assert(sliced.getLong(1) == global.getLong(0) && sliced.getLong(2) == global.getLong(1))
    graft.Caches.clear()
  }

  test("fdDiscover: exact FD holds, g3 counts minimum deletions, nulls are values") {
    import spark.implicits._
    // id → cat holds (id unique); cat → id fails on both cat groups:
    // x keeps max 2 of 3 rows, y keeps 1 of 1 → g3 = 1 - 3/4
    val df = Seq((1L, "x", "a"), (2L, "x", "a"), (3L, "x", "b"), (4L, "y", null))
      .toDF("id", "cat", "v")
    val out = Stats.fdDiscover(df, Seq("id", "cat", "v")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.size == 6)
    val idCat = out(("id", "cat"))
    assert(idCat.getBoolean(4) && idCat.getLong(2) == 4L && idCat.getLong(3) == 0L
      && idCat.getDouble(5) == 0.0)
    val catId = out(("cat", "id"))
    assert(!catId.getBoolean(4) && catId.getLong(3) == 1L && catId.getDouble(5) == 0.5)
    // cat → v: x maps to {a,a,b} (keep 2), y maps to {null} (one value) → g3 = 1 - 3/4
    val catV = out(("cat", "v"))
    assert(!catV.getBoolean(4) && catV.getLong(3) == 1L && catV.getDouble(5) == 0.25)
    // v → cat: null determinant is its own observable group; a,b,null all single-cat
    assert(out(("v", "cat")).getBoolean(4))
  }

  test("infoGainProfile: determining feature u=1, independent u=0, constant label u NULL") {
    import spark.implicits._
    // label fully determined by f1, independent of f2
    val df = Seq(
      ("en", "wiki", 0L), ("en", "wiki", 1L),
      ("de", "news", 0L), ("de", "news", 1L)).toDF("lang", "src", "band")
    val out = Stats.infoGainProfile(df, col("lang"),
      Seq("src" -> col("src"), "band" -> col("band"))).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("src").getDouble(5) == 1.0)   // u: src determines lang
    assert(out("band").getDouble(5) == 0.0)  // u: band independent of lang
    assert(out("src").getDouble(2) == out("band").getDouble(2)) // same h_label
    // constant label → zero entropy → u undefined
    val const = Seq(("en", "a"), ("en", "b")).toDF("lang", "src")
    val c = Stats.infoGainProfile(const, col("lang"), Seq("src" -> col("src"))).collect().head
    assert(c.getDouble(4) == 0.0 && c.isNullAt(5))
  }

  test("jsDivergenceFromHists: 0 on identical, ln 2 on disjoint, hand case") {
    import spark.implicits._
    def hist(counts: (Long, Long)*) = counts.toDF("bin", "n")
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val same = Stats.jsDivergenceFromHists(hist(0L -> 2L, 1L -> 3L), hist(0L -> 4L, 1L -> 6L))
      .collect().head
    assert(same.getDouble(2) == 0.0) // identical SHAPES (scale-free)
    val disjoint = Stats.jsDivergenceFromHists(hist(0L -> 2L), hist(1L -> 2L)).collect().head
    assert(disjoint.getDouble(2) == r6(math.log(2.0)))
    // A = (.5, .5), B = (1, 0): m = (.75, .25)
    val hand = Stats.jsDivergenceFromHists(hist(0L -> 1L, 1L -> 1L), hist(0L -> 1L)).collect().head
    val want = 0.5 * (0.5 * math.log(0.5 / 0.75) + 0.5 * math.log(0.5 / 0.25)) +
      0.5 * math.log(1.0 / 0.75)
    assert(hand.getDouble(2) == r6(want))
    // empty side → NULL
    assert(Stats.jsDivergenceFromHists(hist(0L -> 1L), hist()).collect().head.isNullAt(2))
  }

  test("emdFromHists: mass shifted one bin moves EMD by one bin width; merge ≡ whole") {
    import spark.implicits._
    def hist(counts: (Long, Long)*) = counts.toDF("bin", "n")
    val shifted = Stats.emdFromHists(hist(0L -> 4L), hist(1L -> 4L),
      lo = 0.0, hi = 4.0, bins = 4).collect().head
    assert(shifted.getDouble(2) == 1.0)
    // same shift on a width-2 grid doubles the distance
    val wide = Stats.emdFromHists(hist(0L -> 4L), hist(1L -> 4L),
      lo = 0.0, hi = 8.0, bins = 4).collect().head
    assert(wide.getDouble(2) == 2.0)
    assert(Stats.emdFromHists(hist(0L -> 3L, 2L -> 1L), hist(0L -> 3L, 2L -> 1L),
      0.0, 4.0, 4).collect().head.getDouble(2) == 0.0)
    // mergeable-state contract
    val whole = Stats.emdFromHists(hist(0L -> 4L, 1L -> 2L), hist(1L -> 6L),
      0.0, 4.0, 4).collect().head
    val served = Stats.emdFromHists(
      Stats.histMerge(Seq(hist(0L -> 1L, 1L -> 2L), hist(0L -> 3L))),
      hist(1L -> 6L), 0.0, 4.0, 4).collect().head
    assert(served == whole)
  }

  test("lorenzCurve: hand case; equal distribution sits on the diagonal") {
    import spark.implicits._
    val df = Seq(1L, 1L, 1L, 1L, 2L, 2L, 2L, 10L).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val got = Stats.lorenzCurve(df, col("v"), bins = 4, tieCol = col("id"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4), r.getDouble(5), r.getDouble(6)))).toMap
    // ascending buckets of 2: totals 2,2,4,12 → cum 2,4,8,20
    assert(got(0L) == ((2L, 2L, 2L, 0.25, 0.1)))
    assert(got(1L) == ((2L, 2L, 4L, 0.5, 0.2)))
    assert(got(2L) == ((2L, 4L, 8L, 0.75, 0.4)))
    assert(got(3L) == ((2L, 12L, 20L, 1.0, 1.0)))
    val equal = (0 until 8).map(i => (i.toLong, 5L)).toDF("id", "v")
    Stats.lorenzCurve(equal, col("v"), bins = 4, tieCol = col("id"))
      .collect().foreach(r => assert(r.getDouble(5) == r.getDouble(6)))
    graft.Caches.clear()
  }

  test("lorenzCurve: fractional values sum on the decimal grid (no long truncation)") {
    import spark.implicits._
    // scores in [0,1] — the old cast("long") summed every bucket to 0
    // while still RANKING by the untruncated value
    val df = (1 to 8).map(i => (i.toLong, i / 10.0)).toDF("id", "v")
    val got = Stats.lorenzCurve(df, col("v"), bins = 4, tieCol = col("id"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    // ascending buckets of 2: totals .3,.7,1.1,1.5 → cum .3,1.0,2.1,3.6
    assert(got(0L) == ((2L, 0.3, 0.3, 0.25, 0.083333)))
    assert(got(1L) == ((2L, 0.7, 1.0, 0.5, 0.277778)))
    assert(got(2L) == ((2L, 1.1, 2.1, 0.75, 0.583333)))
    assert(got(3L) == ((2L, 1.5, 3.6, 1.0, 1.0)))
    graft.Caches.clear()
  }

  test("theilSenFit/mannKendall: fractional x axis survives (no long truncation)") {
    import spark.implicits._
    // x in fractions of a day — the old cast("long") collapsed 0.25/0.5
    // to 0, excluding those pairs as "equal x" and corrupting the slopes
    val line = Seq((0.0, 1.0), (0.25, 1.5), (0.5, 2.0), (0.75, 2.5))
      .toDF("x", "y")
    val ts = Stats.theilSenFit(line, col("x"), col("y")).collect().head
    assert(ts.getLong(0) == 6L, s"all 6 pairs must survive, got ${ts.getLong(0)}")
    assert(ts.getDouble(1) == 2.0 && ts.getDouble(2) == 1.0)
    val mk = Stats.mannKendall(line, col("x"), col("y")).collect().head
    assert(mk.getLong(0) == 4L && mk.getLong(1) == 6L) // S = all 6 pairs concordant
    graft.Caches.clear()
  }

  test("gini: fractional inputs sum exactly (no silent long truncation)") {
    import spark.implicits._
    // scores in [0,1] — the old cast("long") collapsed all of these to 0
    // (total 0 → NULL gini); the decimal path keeps the exact rank form
    val frac = Seq(("f", 0.1), ("f", 0.2), ("f", 0.3)).toDF("g", "x")
    val r = Stats.gini(frac, col("x"), Seq("g")).collect().head
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getLong(1) == 3L)
    assert(r.getDouble(2) == r6(0.6)) // total reported as rounded double
    // same shape as (1,2,3) scaled by 0.1 — Gini is scale-invariant
    assert(r.getDouble(3) == r6(4.0 / 18.0))
    // mixed fractional values must not truncate-and-misrank
    val mixed = Seq(("m", 1.5), ("m", 1.4), ("m", 0.1)).toDF("g", "x")
    val m = Stats.gini(mixed, col("x"), Seq("g")).collect().head
    // sorted 0.1,1.4,1.5: G = (2·(0.1+2.8+4.5) − 4·3)/(3·3) = 2.8/9
    assert(m.getDouble(3) == r6(2.8 / 9.0))
  }

  test("welchTtest: hand-computed statistics; partitioning-invariant") {
    import spark.implicits._
    val df = Seq((1.0, true), (2.0, true), (3.0, true),
      (2.0, false), (4.0, false), (6.0, false), (8.0, false)).toDF("v", "y")
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // A=(1,2,3): m=2, var=1; B=(2,4,6,8): m=5, var=20/3
    val ea = (1.0 / 3)
    val eb = (20.0 / 3) / 4
    val se2 = ea + eb
    val expT = r6((2.0 - 5.0) / math.sqrt(se2))
    val expD = r6(se2 * se2 / (ea * ea / 2 + eb * eb / 3))
    val r = Stats.welchTtest(df, col("v"), col("y")).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 4L)
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 5.0)
    assert(r.getDouble(4) == expT && r.getDouble(5) == expD)
    val r17 = Stats.welchTtest(df.repartition(17), col("v"), col("y")).collect().head
    assert(r17 == r)
  }

  test("mannWhitney: hand-computed midrank U with ties; partitioning-invariant") {
    import spark.implicits._
    // A = {1,2,2,5}, B = {2,3,5,5,6}: midranks 1, 3,3, 7 → ΣR_A = 14
    val df = Seq((1.0, true), (2.0, true), (2.0, true), (5.0, true),
      (2.0, false), (3.0, false), (5.0, false), (5.0, false), (6.0, false)).toDF("v", "y")
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = Stats.mannWhitney(df, col("v"), col("y")).collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 5L)
    assert(r.getDouble(2) == 4.0) // U = ΣR_A − n_a(n_a+1)/2 = 14 − 10
    // two tie groups of 3 → Σ(t³−t) = 48
    val vr = 20.0 / 12.0 * ((9.0 + 1) - 48.0 / (9.0 * 8.0))
    assert(r.getDouble(3) == r6((4.0 - 10.0) / math.sqrt(vr)))
    assert(r.getDouble(4) == r6(2.0 * 4.0 / 20.0 - 1)) // rank-biserial −0.6
    val r17 = Stats.mannWhitney(df.repartition(17), col("v"), col("y")).collect().head
    assert(r17 == r)
  }

  test("mannWhitney: all-tied values → NULL z (zero variance); empty group → NULL stats") {
    import spark.implicits._
    val tied = Seq((7.0, true), (7.0, true), (7.0, false)).toDF("v", "y")
    val t = Stats.mannWhitney(tied, col("v"), col("y")).collect().head
    assert(t.getLong(0) == 2L && t.getLong(1) == 1L)
    assert(t.getDouble(2) == 1.0 && t.isNullAt(3)) // U from midranks; σ² = 0
    assert(t.getDouble(4) == 0.0) // effect size defined: exactly no separation
    val solo = Seq((1.0, true), (2.0, true)).toDF("v", "y")
    val s = Stats.mannWhitney(solo, col("v"), col("y")).collect().head
    assert(s.getLong(0) == 2L && s.getLong(1) == 0L)
    assert(s.isNullAt(2) && s.isNullAt(3) && s.isNullAt(4))
  }

  test("bestSplit: perfect separator found, tie → smaller threshold, single value → empty") {
    import spark.implicits._
    // x ≤ 2 separates perfectly: gini_split 0, parent 1−9/16−1/16 = 0.375
    val df = Seq((1L, true), (1L, true), (2L, true), (3L, false)).toDF("v", "y")
    val r = Stats.bestSplit(df, col("v"), col("y")).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 3L && r.getLong(2) == 1L)
    assert(r.getDouble(3) == 0.0 && r.getDouble(4) == 0.375 && r.getDouble(5) == 0.375)
    // v=1 and v=2 both score 1/3 → the rounded-score tie picks the smaller threshold
    val tie = Seq((1L, false), (2L, true), (3L, false)).toDF("v", "y")
    val t = Stats.bestSplit(tie, col("v"), col("y")).collect().head
    assert(t.getLong(0) == 1L)
    // a constant feature has no split
    val const = Seq((7L, true), (7L, false)).toDF("v", "y")
    assert(Stats.bestSplit(const, col("v"), col("y")).count() == 0L)
    graft.Caches.clear()
  }

  test("theilSenFit: median slope shrugs off an outlier; exact line recovered; per-stratum") {
    import spark.implicits._
    // slopes of (0,1),(1,3),(2,4),(3,100): {2, 1.5, 33, 1, 48.5, 96} → median 2
    // residuals y − 2x: {1, 1, 0, 94} → type-1 median intercept 1
    val df = Seq(("a", 0L, 1.0), ("a", 1L, 3.0), ("a", 2L, 4.0), ("a", 3L, 100.0),
      ("b", 0L, 5.0), ("b", 1L, 7.0), ("b", 2L, 9.0)).toDF("g", "x", "y")
    val got = Stats.theilSenFit(df, col("x"), col("y"), Seq("g"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(got("a") == ((6L, 2.0, 1.0)))
    assert(got("b") == ((3L, 2.0, 5.0))) // exact line recovered exactly
    graft.Caches.clear()
  }

  test("kendallTauB: monotone ±1, hand tie-corrected value, constant axis → NULL") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def tau(rows: Seq[(Int, Int)]) =
      Stats.kendallTauB(rows.toDF("x", "y"), col("x"), col("y")).collect().head
    assert(tau(Seq((1, 5), (2, 6), (3, 7))).getDouble(1) == 1.0)
    assert(tau(Seq((1, 7), (2, 6), (3, 5))).getDouble(1) == -1.0)
    // cells (1,1)×2, (2,2), (3,1): C=2, D=1, n0=6, n1=1, n2=3
    val t = tau(Seq((1, 1), (1, 1), (2, 2), (3, 1)))
    assert(t.getLong(0) == 4L && t.getDouble(1) == r6(1.0 / math.sqrt(15.0)))
    assert(tau(Seq((1, 1), (1, 2), (1, 3))).isNullAt(1)) // constant x
    graft.Caches.clear()
  }

  test("cohenKappa: textbook 2×2 agreement; degenerate constant raters → NULL") {
    import spark.implicits._
    // 20 yes/yes, 5 yes/no, 10 no/yes, 15 no/no: po = 0.7, pe = 0.5, κ = 0.4
    val rows = Seq.fill(20)(("yes", "yes")) ++ Seq.fill(5)(("yes", "no")) ++
      Seq.fill(10)(("no", "yes")) ++ Seq.fill(15)(("no", "no"))
    val r = Stats.cohenKappa(rows.toDF("a", "b"), col("a"), col("b")).collect().head
    assert(r.getLong(0) == 50L)
    assert(r.getDouble(1) == 0.7 && r.getDouble(2) == 0.5 && r.getDouble(3) == 0.4)
    // both raters constant: pe = 1 → kappa undefined, NULL not NaN
    val const = Seq.fill(5)(("x", "x")).toDF("a", "b")
    val c = Stats.cohenKappa(const, col("a"), col("b")).collect().head
    assert(c.getDouble(1) == 1.0 && c.getDouble(2) == 1.0 && c.isNullAt(3))
    graft.Caches.clear()
  }

  test("matthewsCorr: hand confusion; perfect prediction → 1; empty marginal → NULL") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = Seq.fill(4)((true, true)) ++ Seq.fill(1)((true, false)) ++
      Seq.fill(3)((false, false)) ++ Seq.fill(2)((false, true))
    val r = Stats.matthewsCorr(rows.toDF("p", "y"), col("p"), col("y")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((4L, 1L, 3L, 2L)))
    assert(r.getDouble(4) == r6((4.0 * 3 - 1.0 * 2) / math.sqrt(5.0 * 6 * 4 * 5)))
    val perfect = Seq((true, true), (true, true), (false, false)).toDF("p", "y")
    assert(Stats.matthewsCorr(perfect, col("p"), col("y")).collect().head.getDouble(4) == 1.0)
    // classifier that always says positive: tn + fn = 0 → undefined
    val allPos = Seq((true, true), (true, false)).toDF("p", "y")
    assert(Stats.matthewsCorr(allPos, col("p"), col("y")).collect().head.isNullAt(4))
  }

  test("welchTtest: a singleton group yields NULL statistics, not a sentinel") {
    import spark.implicits._
    val df = Seq((1.0, true), (2.0, false), (3.0, false)).toDF("v", "y")
    val r = Stats.welchTtest(df, col("v"), col("y")).collect().head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 2.5)
    assert(r.isNullAt(4) && r.isNullAt(5))
  }

  test("skyline: single group, duplicate frontier points keep their multiplicity") {
    import spark.implicits._
    val df = Seq((1.0, 5.0), (1.0, 5.0), (2.0, 4.0), (2.0, 3.0), (0.5, 6.0), (1.5, 4.5))
      .toDF("x", "y")
    val got = Stats.skyline(df, col("x"), col("y"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2))).toSet
    // (1,5)x2, (2,4), (0.5,6), (1.5,4.5) are mutually non-dominated;
    // (2,3) is dominated by (2,4)
    assert(got == Set((1.0, 5.0, 2L), (2.0, 4.0, 1L), (0.5, 6.0, 1L), (1.5, 4.5, 1L)))
  }

  test("classificationReport: hand margins; hallucinated and never-predicted classes surface") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // truth: a a a b b ; pred: a b a c b → c is hallucinated (support 0)
    val df = Seq(("a", "a"), ("b", "a"), ("a", "a"), ("c", "b"), ("b", "b")).toDF("p", "y")
    val rep = Stats.classificationReport(df, col("p"), col("y"))
    val counts = rep.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(counts == Set(("a", 2L, 0L, 1L, 3L), ("b", 1L, 1L, 1L, 2L), ("c", 0L, 1L, 0L, 0L)))
    val a = rep.where(col("clazz") === "a").collect().head
    assert(a.getDouble(5) == 1.0 && a.getDouble(6) == r6(2.0 / 3))
    assert(a.getDouble(7) == r6(2 * 1.0 * r6(2.0 / 3) / (1.0 + r6(2.0 / 3))))
    val c = rep.where(col("clazz") === "c").collect().head
    assert(c.getDouble(5) == 0.0 && c.isNullAt(6) && c.isNullAt(7)) // recall undefined at support 0
    // a class present in truth but never predicted: precision NULL, recall 0
    val never = Stats.classificationReport(
      Seq(("a", "a"), ("a", "b")).toDF("p", "y"), col("p"), col("y"))
      .where(col("clazz") === "b").collect().head
    assert(never.getLong(1) == 0L && never.getLong(2) == 0L && never.getLong(4) == 1L)
    assert(never.isNullAt(5) && never.getDouble(6) == 0.0)
  }

  test("mcnemarTest: discordant-pair counts and the continuity-corrected statistic") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // both right ×3, both wrong ×2, A-only right ×4, B-only right ×1
    val rows = Seq.fill(3)((1, 1, 1)) ++ Seq.fill(2)((0, 0, 1)) ++
      Seq.fill(4)((1, 0, 1)) ++ Seq.fill(1)((0, 1, 1))
    val df = rows.toDF("pa", "pb", "y")
    val r = Stats.mcnemarTest(df, col("pa"), col("pb"), col("y")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((10L, 3L, 2L, 4L, 1L)))
    assert(r.getDouble(5) == r6(math.pow(math.abs(4 - 1) - 1, 2) / 5.0)) // 0.8
    // models that never disagree → b + c = 0 → NULL statistic
    val same = Seq((1, 1, 1), (0, 0, 1)).toDF("pa", "pb", "y")
    assert(Stats.mcnemarTest(same, col("pa"), col("pb"), col("y")).collect().head.isNullAt(5))
  }

  test("probEvalReport: perfect confident probabilities; half-certain brier; exact ECE") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val perfect = Seq((1.0, true), (1.0, true), (0.0, false), (0.0, false)).toDF("p", "y")
    val pr = Stats.probEvalReport(perfect, col("p"), col("y")).collect().head
    assert(pr.getLong(0) == 4L && pr.getDouble(1) == 0.0 && pr.getDouble(3) == 0.0)
    assert(pr.getDouble(2) == r6(-math.log(0.999999))) // the clamp's floor cost
    // p = 0.5 everywhere, half the labels positive: brier 0.25, ece 0
    val half = Seq((0.5, true), (0.5, false), (0.5, true), (0.5, false)).toDF("p", "y")
    val hr = Stats.probEvalReport(half, col("p"), col("y")).collect().head
    assert(hr.getDouble(1) == 0.25 && hr.getDouble(3) == 0.0)
    assert(hr.getDouble(2) == r6(-math.log(0.5)))
    // systematic overconfidence: p = 0.9 but only half positive → ece = 0.4
    val over = Seq((0.9, true), (0.9, false)).toDF("p", "y")
    assert(Stats.probEvalReport(over, col("p"), col("y")).collect().head.getDouble(3) == 0.4)
  }

  test("twoProportionTest: hand z; Wilson intervals bracket the rates; 2-variant contract") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = Seq(("a", true), ("a", false), ("a", false), ("a", false)) ++
      Seq(("b", true), ("b", true), ("b", true), ("b", false))
    val r = Stats.twoProportionTest(rows.toDF("v", "s"), col("v"), col("s")).collect().head
    assert((r.getString(0), r.getString(1)) == (("a", "b")))
    assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) == ((4L, 1L, 4L, 3L)))
    assert(r.getDouble(6) == 0.25 && r.getDouble(7) == 0.75 && r.getDouble(8) == 0.5)
    assert(r.getDouble(9) == r6(0.5 / math.sqrt(0.5 * 0.5 * (0.25 + 0.25))))
    val (loA, hiA, loB, hiB) =
      (r.getDouble(10), r.getDouble(11), r.getDouble(12), r.getDouble(13))
    assert(loA >= 0 && loA < 0.25 && hiA > 0.25 && hiA <= 1)
    assert(loB >= 0 && loB < 0.75 && hiB > 0.75 && hiB <= 1)
    intercept[IllegalArgumentException] {
      Stats.twoProportionTest(
        Seq(("a", true), ("b", true), ("c", false)).toDF("v", "s"), col("v"), col("s"))
    }
  }

  test("brownForsythe: spread difference detected; zero deviations → NULL F") {
    import spark.implicits._
    // medians both 10; deviations (10,0,10) vs (1,0,1)
    val df = Seq(("w", 0.0), ("w", 10.0), ("w", 20.0), ("t", 9.0), ("t", 10.0), ("t", 11.0))
      .toDF("g", "v")
    val r = Stats.brownForsythe(df, col("v"), col("g")).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 6L)
    assert(r.getDouble(4) > 0.0)
    // every value equals its group median → all deviations 0 → ssw = 0 → NULL
    val const = Seq(("w", 5.0), ("w", 5.0), ("t", 7.0), ("t", 7.0)).toDF("g", "v")
    assert(Stats.brownForsythe(const, col("v"), col("g")).collect().head.isNullAt(4))
    // even group size picks the TYPE-1 (lower-middle) value, not an average
    val even = Seq(("w", 1.0), ("w", 2.0), ("w", 100.0), ("w", 200.0),
      ("t", 1.0), ("t", 2.0), ("t", 100.0), ("t", 200.0)).toDF("g", "v")
    val re = Stats.brownForsythe(even, col("v"), col("g")).collect().head
    // identical groups → identical deviation sets → between-group SS = 0 → F = 0
    assert(re.getDouble(4) == 0.0)
  }

  test("conformalQuantile: exact rank pick, realized coverage, infinite band on tiny groups") {
    import spark.implicits._
    // group g: 9 calibration scores 1..9 → need = ⌈10·0.9⌉ = 9 → qhat = 9
    val cal = (1 to 9).map(i => ("g", i.toDouble, true))
    val ev = Seq(("g", 5.0, false), ("g", 9.0, false), ("g", 12.0, false), ("g", 9.5, false))
    // group tiny: 3 calibration rows → need = ⌈4·0.9⌉ = 4 > 3 → NULL qhat, coverage 1
    val tiny = Seq(("t", 1.0, true), ("t", 2.0, true), ("t", 3.0, true), ("t", 99.0, false))
    val df = (cal ++ ev ++ tiny).toDF("g", "s", "cal")
    val got = Stats.conformalQuantile(df, col("s"), col("cal"), Seq("g"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) -1.0 else r.getDouble(3),
          r.getDouble(4)))).toMap
    // covered: 5 ≤ 9, 9 ≤ 9; uncovered: 12, 9.5 → coverage 2/4
    assert(got("g") == ((9L, 4L, 9.0, 0.5)))
    assert(got("t") == ((3L, 1L, -1.0, 1.0)))
  }

  test("hillEstimator: hand geometric sample; short strata dropped; k+1-th value is the anchor") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val vals = Seq(16.0, 8.0, 4.0, 2.0, 1.0).map(("a", _)) ++ Seq(("b", 3.0), ("b", 1.0))
    val got = Stats.hillEstimator(vals.toDF("g", "v"), col("v"), k = 2, strataCols = Seq("g"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
    // stratum b has only 2 ≤ k rows → dropped; a: top-3 = 16,8,4, tail 4,
    // hill = (ln 4 + ln 2)/2
    assert(got.length == 1)
    assert(got.head == (("a", 2, 4.0, r6((math.log(4.0) + math.log(2.0)) / 2))))
    // all-ties window: hill = 0 → NULL alpha, no division blowup
    val flat = Seq.fill(5)(("c", 7.0)).toDF("g", "v")
    val fr = Stats.hillEstimator(flat, col("v"), k = 2, strataCols = Seq("g")).collect().head
    assert(fr.getDouble(3) == 0.0 && fr.isNullAt(4))
    graft.Caches.clear()
  }

  test("mannKendall: monotone series hit ±(n−1 choose …) S; constant series → NULL z") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = (1 to 4).map(i => ("up", i.toLong, i.toDouble)) ++
      (1 to 4).map(i => ("down", i.toLong, (10 - i).toDouble)) ++
      (1 to 4).map(i => ("flat", i.toLong, 5.0))
    val got = Stats.mannKendall(rows.toDF("g", "x", "y"),
      x = col("x"), y = col("y"), strataCols = Seq("g"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3),
          if (r.isNullAt(4)) Double.NaN else r.getDouble(4)))).toMap
    val varNoTies = 4.0 * 3 * 13 / 18
    assert(got("up") == ((4L, 6L, r6(varNoTies), r6(5.0 / math.sqrt(varNoTies)))))
    assert(got("down") == ((4L, -6L, r6(varNoTies), r6(-5.0 / math.sqrt(varNoTies)))))
    // constant: every pair ties → S = 0 AND the tie correction zeroes Var
    assert(got("flat")._2 == 0L && got("flat")._3 == 0.0 && got("flat")._4.isNaN)
    graft.Caches.clear()
  }

  test("bhFdr: textbook step-up incl. the later-rank-rescues-earlier case") {
    import spark.implicits._
    // m=5, α=1/4: bounds 0.05i — p₍₃₎=0.04 passes, p₍₄₎=0.30 fails ⇒ k*=3
    val t1 = Seq((1L, 0.01), (2L, 0.02), (3L, 0.30), (4L, 0.04), (5L, 0.90))
      .toDF("id", "p")
    val r1 = Stats.bhFdr(t1, col("p"), col("id"), alphaNum = 1, alphaDen = 4)
      .select("id", "p_rank", "m", "reject")
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(r1 == Set((1L, 1L, 5L, true), (2L, 2L, 5L, true), (4L, 3L, 5L, true),
      (3L, 4L, 5L, false), (5L, 5L, 5L, false)))
    // step-up, not step-down: p₍₁₎=0.03 > 0.025 but p₍₂₎=0.049 ≤ 0.05
    // ⇒ k*=2 rejects BOTH (the rule walks down from the largest passing k)
    val t2 = Seq((1L, 0.03), (2L, 0.049)).toDF("id", "p")
    val r2 = Stats.bhFdr(t2, col("p"), col("id"), alphaNum = 1, alphaDen = 20)
      .select("reject").as[Boolean].collect()
    assert(r2.toSeq == Seq(true, true))
    // null p rows are excluded; empty frame degrades to empty
    val t3 = Seq((1L, Some(0.5)), (2L, None)).toDF("id", "p")
    assert(Stats.bhFdr(t3, col("p"), col("id")).count() == 1)
    assert(Stats.bhFdr(t1.limit(0), col("p"), col("id")).isEmpty)
    graft.Caches.clear()
  }

  test("effectiveSampleSize: uniform weights give ess=n, deff=1; skew collapses ess") {
    import spark.implicits._
    val uni = (1 to 8).map(i => ("u", 2.5)).toDF("g", "w")
    val skew = Seq(("s", 1.0), ("s", 1.0), ("s", 1.0), ("s", 97.0)).toDF("g", "w")
    val got = Stats.effectiveSampleSize(uni.union(skew), col("w"), Seq("g"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got("u") == ((8L, 20.0, 8.0, 1.0)))
    // sw=100, sq=9412: ess = 10000/9412, deff = 4·9412/10000
    assert(got("s") == ((4L, 100.0, 1.062473, 3.7648)))
    // zero weights carry no sample: ess/deff NULL
    val zero = Seq(("z", 0.0), ("z", 0.0)).toDF("g", "w")
    val rz = Stats.effectiveSampleSize(zero, col("w"), Seq("g")).collect().head
    assert(rz.isNullAt(3) && rz.isNullAt(4))
  }

  test("cohensD: hand pooled-SD case with the Hedges debias; degenerate group → NULL") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val df = Seq((2.0, true), (4.0, true), (0.0, false), (2.0, false)).toDF("v", "y")
    val r = Stats.cohensD(df, col("v"), col("y")).collect().head
    assert((r.getLong(0), r.getLong(1)) == ((2L, 2L)))
    assert((r.getDouble(2), r.getDouble(3)) == ((3.0, 1.0)))
    val d = 2.0 / math.sqrt(2.0)
    assert(r.getDouble(4) == r6(math.sqrt(2.0)) && r.getDouble(5) == r6(d))
    assert(r.getDouble(6) == r6(d * (1.0 - 3.0 / (4.0 * 4 - 9))))
    // single-row group: pooled variance undefined → NULL d/g
    val deg = Seq((2.0, true), (0.0, false), (2.0, false)).toDF("v", "y")
    val rd = Stats.cohensD(deg, col("v"), col("y")).collect().head
    assert(rd.isNullAt(5) && rd.isNullAt(6))
  }

  test("ebShrinkRates: shrinkage direction and magnitude; degenerate prior falls back") {
    import spark.implicits._
    // keys: a (1/10), b (9/10), c (1/2 on 2 trials) — c should shrink
    // hardest toward the prior mean 0.5; a and b pull in symmetrically
    val rows = (1 to 10).map(i => ("a", i == 1)) ++
      (1 to 10).map(i => ("b", i != 1)) ++ Seq(("c", true), ("c", false))
    val got = Stats.ebShrinkRates(rows.toDF("g", "s"), Seq("g"), col("s"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got("a")._1 == 10L && got("a")._2 == 0.1)
    // prior mean is 0.5 by symmetry: every shrunk rate moves toward it
    assert(got("a")._3 > 0.1 && got("a")._3 < 0.5)
    assert(got("b")._3 < 0.9 && got("b")._3 > 0.5)
    assert(got("c")._3 == 0.5) // already at the prior mean
    // the low-n key moves further (relative to its distance) than high-n
    assert((got("c")._3 - 0.5).abs <= (got("a")._3 - 0.1).abs)
    // identical rates: v = 0 -> degenerate prior, raw rates returned
    val flat = Seq(("x", true), ("x", false), ("y", true), ("y", false))
      .toDF("g", "s")
    val d = Stats.ebShrinkRates(flat, Seq("g"), col("s")).collect().head
    assert(d.getDouble(4) == d.getDouble(3) && d.isNullAt(5) && d.isNullAt(6))
    graft.Caches.clear()
  }

  test("isotonicCalibrate: hand PAVA pools; property vs brute-force on random rates") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // brute-force PAVA: rescan-and-pool until monotone (O(n^2) reference)
    def brute(rates: Seq[Double], ws: Seq[Double]): Seq[Double] = {
      var blocks = rates.zip(ws).map { case (r, w) => (r * w, w) }.toVector
      var changed = true
      while (changed) {
        changed = false
        val i = blocks.indices.dropRight(1)
          .find(i => blocks(i)._1 / blocks(i)._2 > blocks(i + 1)._1 / blocks(i + 1)._2)
        i.foreach { j =>
          val (s1, w1) = blocks(j); val (s2, w2) = blocks(j + 1)
          blocks = (blocks.take(j) :+ ((s1 + s2, w1 + w2))) ++ blocks.drop(j + 2)
          changed = true
        }
      }
      blocks.flatMap { case (sm, w) => Seq.fill(math.round(w / 10.0).toInt)(sm / w) }
    }
    // raw rows: 10 per score group, k positives -> bin rate k/10; bins =
    // #groups with equal sizes means one bin per distinct score
    def build(ks: Seq[Int]) = ks.zipWithIndex.flatMap { case (k, g) =>
      (0 until 10).map(i => ((g + 1) / 10.0, i < k, g.toLong * 10 + i))
    }.toDF("s", "y", "id")
    val hand = Stats.isotonicCalibrate(
      build(Seq(3, 1, 2, 6, 5)), col("s"), col("y"), bins = 5, tieCol = col("id"))
      .orderBy("bin").collect().map(_.getDouble(4)).toSeq
    assert(hand == Seq(0.2, 0.2, 0.2, 0.55, 0.55))
    val rnd = new scala.util.Random(11)
    (1 to 4).foreach { _ =>
      val ks = Seq.fill(2 + rnd.nextInt(8))(rnd.nextInt(11))
      val got = Stats.isotonicCalibrate(
        build(ks), col("s"), col("y"), bins = ks.size, tieCol = col("id"))
        .orderBy("bin").collect().map(_.getDouble(4)).toSeq
      val want = brute(ks.map(_ / 10.0), Seq.fill(ks.size)(10.0)).map(r6)
      assert(got == want, s"ks=$ks got=$got want=$want")
      assert(got.sliding(2).forall(p => p.size < 2 || p(0) <= p(1)))
    }
    graft.Caches.clear()
  }

  test("cochranArmitage: hand monotone trend; no-trend z~0; degenerate variance -> NULL") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doses 0/1/2 with rates 0.2/0.5/0.8 on n=10 each: textbook arithmetic
    def rows(ks: Seq[Int]) = ks.zipWithIndex.flatMap { case (k, w) =>
      (0 until 10).map(i => (w.toDouble, i < k)) }.toDF("w", "s")
    val r = Stats.cochranArmitage(rows(Seq(2, 5, 8)), col("w"), col("s")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 30L, 15L)))
    // num = Sum(w k) - pbar Sum(w n) = (5 + 16) - 0.5*30 = 6
    // vr = 0.25 * (Sum(w^2 n) - (Sum(w n))^2/N) = 0.25*(50 - 30)=5
    assert(r.getDouble(3) == r6(6.0 / math.sqrt(5.0)))
    // flat rates: numerator exactly 0
    val flat = Stats.cochranArmitage(rows(Seq(5, 5, 5)), col("w"), col("s")).collect().head
    assert(flat.getDouble(3) == 0.0)
    // single dose (zero weight spread) or all-success: variance 0 -> NULL
    val one = Stats.cochranArmitage(rows(Seq(5)), col("w"), col("s")).collect().head
    assert(one.isNullAt(3))
    val all = Stats.cochranArmitage(rows(Seq(10, 10)), col("w"), col("s")).collect().head
    assert(all.isNullAt(3))
  }

  test("prAuc: hand step area; tie groups collapse to one step; degenerate labels") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def ap(rows: Seq[(Double, Boolean)]) =
      Stats.prAuc(rows.toDF("s", "y"), col("s"), col("y")).collect().head
    // thresholds desc: P@0.9 = 1/1 (ΔR ½), P@0.7 = 2/3 (ΔR ½)
    val r = ap(Seq((0.9, true), (0.8, false), (0.7, true), (0.6, false)))
    assert((r.getLong(0), r.getLong(1)) == ((2L, 2L)))
    assert(r.getDouble(2) == r6(0.5 + 1.0 / 3))
    // tied scores are ONE threshold step: the 0.9 group has P = 1/2
    val t = ap(Seq((0.9, true), (0.9, false), (0.5, true)))
    assert(t.getDouble(2) == r6(0.25 + 1.0 / 3))
    assert(ap(Seq((0.9, true), (0.1, false))).getDouble(2) == 1.0) // perfect ranking
    assert(ap(Seq((0.9, false), (0.1, false))).isNullAt(2)) // no positives
    assert(ap(Seq((0.9, true), (0.1, true))).getDouble(2) == 1.0) // no negatives: P≡1
    graft.Caches.clear()
  }

  test("trimmedStats: exact count cuts; ties split by the tie-break; winsorized clamp") {
    import spark.implicits._
    // n=5, trim 1/5 → cut 1: kept {2,3,4}; winsorized sum 9 + 1·(2+4) = 15
    val df = Seq(1.0, 2.0, 3.0, 4.0, 100.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val r = Stats.trimmedStats(df, col("v"), Seq(col("id")), trimNum = 1, trimDen = 5)
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((5L, 3L, 1L)))
    assert((r.getDouble(3), r.getDouble(4), r.getDouble(5)) == ((22.0, 3.0, 3.0)))
    // all-tied values: the count cut still removes exactly cut per tail
    val ties = Seq.fill(4)(5.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val t = Stats.trimmedStats(ties, col("v"), Seq(col("id")), trimNum = 1, trimDen = 4)
      .collect().head
    assert(t.getLong(1) == 2L && t.getDouble(4) == 5.0 && t.getDouble(5) == 5.0)
    intercept[IllegalArgumentException](
      Stats.trimmedStats(df, col("v"), Seq(col("id")), trimNum = 1, trimDen = 2))
    graft.Caches.clear()
  }

  test("weightedQuantile: type-1 pick on cumulative weight; micro-grid; empty on zero W") {
    import spark.implicits._
    val df = Seq((1L, 1.0, 1.0), (2L, 2.0, 1.0), (3L, 3.0, 8.0)).toDF("id", "v", "w")
    def q(qn: Int, qd: Int) = Stats.weightedQuantile(
      df, col("v"), col("w"), Seq(col("id")), qn, qd).collect().head
    assert((q(1, 2).getLong(0), q(1, 2).getDouble(1)) == ((10L, 3.0)))
    assert(q(1, 10).getDouble(1) == 1.0) // first row already holds 10% of mass
    // fractional weights on the micro grid: 0.5 at scale 1 = 5 units
    val frac = Seq((1L, 1.0, 0.5), (2L, 2.0, 0.5)).toDF("id", "v", "w")
    val rf = Stats.weightedQuantile(
      frac, col("v"), col("w"), Seq(col("id")), 1, 2, weightScale = 1).collect().head
    assert((rf.getLong(0), rf.getDouble(1)) == ((10L, 1.0)))
    val zero = Seq((1L, 1.0, 0.0)).toDF("id", "v", "w")
    assert(Stats.weightedQuantile(zero, col("v"), col("w"), Seq(col("id")), 1, 2).isEmpty)
    graft.Caches.clear()
  }

  test("smdBalance: planted shift flagged; identical arms score 0") {
    import spark.implicits._
    // cov "shift": treated runs 10 higher; cov "same": identical distributions
    val rows = (1 to 20).map(i => (true, 10.0 + i % 5, i % 3 * 1.0)) ++
      (1 to 20).map(i => (false, (i % 5).toDouble, i % 3 * 1.0))
    val got = Stats.smdBalance(rows.toDF("t", "shift", "same"), col("t"),
      Seq("shift" -> col("shift"), "same" -> col("same")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(5), r.getBoolean(6)))).toMap
    assert(got("shift")._1 == 20L && got("shift")._2 == 20L)
    assert(got("shift")._3 > 0.1 && !got("shift")._4)
    assert(got("same")._3 == 0.0 && got("same")._4)
  }

  test("cuped: perfectly-correlated covariate removes all variance; constant → NULL theta") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // y = 2x + 3 exactly → theta 2, reduction 1, var_adj 0
    val perfect = (1 to 10).map(i => (i.toDouble, 2.0 * i + 3)).toDF("x", "y")
    val p = Stats.cuped(perfect, col("y"), col("x")).collect().head
    assert(p.getDouble(1) == 2.0 && p.getDouble(3) == 0.0 && p.getDouble(4) == 1.0)
    // independent-ish: reduction strictly between 0 and 1, var_adj ≤ var_y
    val mixed = Seq((1.0, 5.0), (2.0, 3.0), (3.0, 8.0), (4.0, 4.0), (5.0, 9.0))
      .toDF("x", "y")
    val m = Stats.cuped(mixed, col("y"), col("x")).collect().head
    assert(m.getDouble(4) > 0 && m.getDouble(4) < 1 && m.getDouble(3) < m.getDouble(2))
    assert(r6(m.getDouble(2) * (1 - m.getDouble(4))) == m.getDouble(3)
      || math.abs(m.getDouble(2) * (1 - m.getDouble(4)) - m.getDouble(3)) < 1e-5)
    // constant covariate: nothing to regress on
    val const = Seq((7.0, 1.0), (7.0, 2.0), (7.0, 3.0)).toDF("x", "y")
    assert(Stats.cuped(const, col("y"), col("x")).collect().head.isNullAt(1))
  }

  test("mantelHaenszel: recovers a common OR the crude pooled table reverses") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // stratum A: a=9 b=1 c=6 d=4 (OR 6); stratum B: a=4 b=6 c=1 d=9 (OR 6)
    def cells(s: String, a: Int, b: Int, c: Int, d: Int) =
      Seq.fill(a)((s, true, true)) ++ Seq.fill(b)((s, true, false)) ++
        Seq.fill(c)((s, false, true)) ++ Seq.fill(d)((s, false, false))
    val df = (cells("A", 9, 1, 6, 4) ++ cells("B", 4, 6, 1, 9)).toDF("s", "t", "y")
    val r = Stats.mantelHaenszel(df, col("s"), col("t"), col("y")).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 40L)
    // OR_MH = (9·4/20 + 4·9/20) / (1·6/20 + 6·1/20) = 3.6/0.6 = 6
    assert(r.getDouble(4) == r6(3.6 / 0.6))
    // no control-side discordance → NULL, not a blowup
    val degenerate = cells("A", 3, 0, 2, 0).toDF("s", "t", "y")
    assert(Stats.mantelHaenszel(degenerate, col("s"), col("t"), col("y"))
      .collect().head.isNullAt(4))
  }

  test("nzvScreen: dominant-mode column flagged; ties at the top give ratio 1") {
    import spark.implicits._
    val df = (1 to 100).map { i =>
      (i.toLong, if (i <= 98) "x" else s"y$i", if (i % 2 == 0) "a" else "b")
    }.toDF("id", "dominated", "balanced")
    val got = Stats.nzvScreen(df, Seq("id", "dominated", "balanced"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) Double.NaN else r.getDouble(3), r.getBoolean(5)))).toMap
    // dominated: 98 vs 1 → ratio 98, 3 distinct of 100 → nzv
    assert(got("dominated") == ((100L, 3L, 98.0, true)))
    // balanced: 50 vs 50 → ratio 1 → keep
    assert(got("balanced") == ((100L, 2L, 1.0, false)))
    // id: unique everywhere → ratio 1, pct_unique 1 → keep
    assert(got("id")._3 == 1.0 && !got("id")._4)
    graft.Caches.clear()
  }

  test("dispersionIndex: Poisson-like vs bursty vs constant series") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // regular: 2,2,2,2 → var 0, vmr 0; bursty: 0,0,0,8 → mean 2, var 16, vmr 8
    val rows = Seq.fill(4)(("flat", 2.0)) ++ Seq(("burst", 0.0), ("burst", 0.0),
      ("burst", 0.0), ("burst", 8.0))
    val got = Stats.dispersionIndex(rows.toDF("g", "x"), col("x"), Seq("g"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3),
          if (r.isNullAt(4)) Double.NaN else r.getDouble(4)))).toMap
    assert(got("flat") == ((4L, 2.0, 0.0, 0.0)))
    assert(got("burst") == ((4L, 2.0, 16.0, 8.0)))
    // d = (n−1)·vmr
    val d = Stats.dispersionIndex(rows.toDF("g", "x"), col("x"), Seq("g"))
      .where(col("g") === "burst").collect().head.getDouble(5)
    assert(d == r6(3.0 * 8.0))
  }

  test("captureRecapture: Chapman on hand samples; estimate brackets a known universe") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // universe 1..100; A = 1..40, B = 25..60 → m = 16
    val a = (1 to 40).map(_.toLong).toDF("k")
    val b = (25 to 60).map(_.toLong).toDF("k")
    val r = Stats.captureRecapture(a, b).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((40L, 36L, 16L)))
    val nhat = 41.0 * 37 / 17 - 1
    assert(r.getDouble(3) == r6(nhat))
    // the 95% band brackets the true N = 100 on this overlap
    assert(r.getDouble(4) < 100.0 && 100.0 < r.getDouble(5))
    graft.Caches.clear()
  }

  test("hellingerFromHists: identical states → 0; disjoint supports → exactly 1") {
    import spark.implicits._
    val a = Seq((0L, 5L), (1L, 5L)).toDF("bin", "n")
    val b = Seq((2L, 3L), (3L, 7L)).toDF("bin", "n")
    val same = Stats.hellingerFromHists(a, a).collect().head
    assert(same.getDouble(2) == 1.0 && same.getDouble(3) == 0.0)
    val disj = Stats.hellingerFromHists(a, b).collect().head
    assert(disj.getDouble(2) == 0.0 && disj.getDouble(3) == 1.0)
    // half-overlap hand value: p=(.5,.5,0), q=(0,.5,.5) → BC=.5, H=√.5
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val c = Seq((1L, 5L), (2L, 5L)).toDF("bin", "n")
    val half = Stats.hellingerFromHists(a, c).collect().head
    assert(half.getDouble(2) == 0.5 && half.getDouble(3) == r6(math.sqrt(0.5)))
  }

  test("brierDecomposition: Murphy identity holds on a hand panel; perfect model has 0 REL") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // two bins: p=0.25 (1 of 4 positive — perfectly calibrated),
    // p=0.75 (3 of 4 positive — perfectly calibrated)
    val rows = Seq((0.25, true), (0.25, false), (0.25, false), (0.25, false),
      (0.75, true), (0.75, true), (0.75, true), (0.75, false))
    val r = Stats.brierDecomposition(rows.toDF("p", "y"), col("p"), col("y")).collect().head
    assert(r.getLong(0) == 8L)
    assert(r.getDouble(2) == 0.0) // calibrated → zero reliability penalty
    assert(r.getDouble(4) == 0.25) // base rate 1/2 → UNC = .25
    // Murphy: brier = REL − RES + UNC
    assert(math.abs(r.getDouble(1) - (r.getDouble(2) - r.getDouble(3) + r.getDouble(4))) < 2e-6)
    assert(r.getDouble(1) == r6((3 * 0.0625 + 0.5625 + 3 * 0.0625 + 0.5625) / 8))
  }

  test("cochranQ: textbook panel; unbalanced panel → NULL with the flag down") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // 4 subjects × 3 treatments; column totals C = (3, 2, 1), row sums R = (3, 2, 1, 0)
    val rows = Seq(
      (1L, "a", true), (1L, "b", true), (1L, "c", true),
      (2L, "a", true), (2L, "b", true), (2L, "c", false),
      (3L, "a", true), (3L, "b", false), (3L, "c", false),
      (4L, "a", false), (4L, "b", false), (4L, "c", false))
    val r = Stats.cochranQ(rows.toDF("i", "j", "x"), col("i"), col("j"), col("x"))
      .collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 4L && r.getBoolean(3))
    // Q = (k−1)(k·ΣC² − (ΣC)²)/(k·ΣR − ΣR²) = 2·(3·14 − 36)/(3·6 − 14) = 12/4
    assert(r.getDouble(2) == r6(2.0 * (3 * 14 - 36) / (3 * 6 - 14)))
    val unbal = Stats.cochranQ(
      rows.drop(1).toDF("i", "j", "x"), col("i"), col("j"), col("x")).collect().head
    assert(unbal.isNullAt(2) && !unbal.getBoolean(3))
    graft.Caches.clear()
  }

  test("runsTest: perfect alternation maxes runs; median-equal points excluded") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // 1,9 alternating ×4 each, plus one median-equal point that must drop:
    // median pick of 9 values sorted (1,1,1,1,5,9,9,9,9) at rank 5 = 5 → excluded
    val xs = Seq(1.0, 9.0, 1.0, 9.0, 1.0, 9.0, 1.0, 9.0, 5.0)
    val series = xs.zipWithIndex.map { case (x, t) => (t.toLong, x) }.toDF("t", "x")
    val r = Stats.runsTest(series, col("t"), col("x")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((4L, 4L, 8L)))
    val mu = 2.0 * 4 * 4 / 8 + 1.0 // 5
    val sig2 = 2.0 * 4 * 4 * (2.0 * 4 * 4 - 4 - 4) / (8.0 * 8 * 7)
    assert(r.getDouble(3) == 5.0 && r.getDouble(4) == r6((8 - mu) / math.sqrt(sig2)))
    // one-sided series (all above/below impossible post-median-cut with
    // distinct values, but a 2-point series keeps σ² = 0) → NULL z
    val two = Seq((0L, 1.0), (1L, 2.0)).toDF("t", "x")
    assert(Stats.runsTest(two, col("t"), col("x")).collect().head.isNullAt(4))
    graft.Caches.clear()
  }

  test("changepoint: plants the level shift at the true boundary; means recovered") {
    import spark.implicits._
    // 10 points at level 2, then 10 at level 12 — split after t=9
    val xs = (0 until 10).map(t => (t.toLong, 2.0)) ++ (10 until 20).map(t => (t.toLong, 12.0))
    val r = Stats.changepoint(xs.toDF("t", "x"), col("t"), col("x")).collect().head
    assert(r.getLong(0) == 9L && r.getLong(1) == 10L && r.getLong(2) == 20L)
    assert(r.getDouble(4) == 2.0 && r.getDouble(5) == 12.0)
    // constant series: every split scores 0; tie-break picks the earliest t
    val const = (0 until 6).map(t => (t.toLong, 3.0)).toDF("t", "x")
    val c = Stats.changepoint(const, col("t"), col("x")).collect().head
    assert(c.getDouble(3) == 0.0 && c.getLong(0) == 0L)
    graft.Caches.clear()
  }

  test("dunnTest: hand-computed pairwise z off joint midranks; all-tied degenerates NULL") {
    import spark.implicits._
    // the kruskalWallis fixture: A={1,2}, B={2,3}, C={3,3,5}
    // midranks 1, 2.5, 2.5, 5, 5, 5, 7 → R̄_A=1.75 R̄_B=3.75 R̄_C=17/3
    // S² = 7·8/12 − 30/(12·6) = 4.25
    val df = Seq((1.0, "a"), (2.0, "a"), (2.0, "b"), (3.0, "b"),
      (3.0, "c"), (3.0, "c"), (5.0, "c")).toDF("v", "g")
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = Stats.dunnTest(df, col("v"), col("g")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    assert(rows.size == 3)
    val s2 = 7.0 * 8 / 12 - 30.0 / (12 * 6)
    def z(ma: Double, mb: Double, na: Long, nb: Long) =
      r6((ma - mb) / math.sqrt(s2 * (1.0 / na + 1.0 / nb)))
    val (mA, mB, mC) = (1.75, 3.75, 17.0 / 3)
    assert(rows(("a", "b")) == ((2L, 2L, r6(mA), r6(mB), z(mA, mB, 2, 2))))
    assert(rows(("a", "c")) == ((2L, 3L, r6(mA), r6(mC), z(mA, mC, 2, 3))))
    assert(rows(("b", "c")) == ((2L, 3L, r6(mB), r6(mC), z(mB, mC, 2, 3))))
    // all values tied → S² = 0 → NULL z, mean ranks still real
    val tied = Seq((7.0, "a"), (7.0, "a"), (7.0, "b")).toDF("v", "g")
    val t = Stats.dunnTest(tied, col("v"), col("g")).collect().head
    assert(t.isNullAt(6) && t.getDouble(4) == 2.0 && t.getDouble(5) == 2.0)
    graft.Caches.clear()
  }

  test("kruskalWallis: hand-computed tie-corrected H; partitioning-invariant") {
    import spark.implicits._
    // A={1,2}, B={2,3}, C={3,3,5}: midranks 1, 2.5, 2.5, 5, 5, 5, 7
    // R_A=3.5 R_B=7.5 R_C=17 → ΣR²/n = 130.58333…; H = 12/56·ΣR²/n − 24
    // ties Σ(t³−t) = 6+24 = 30 → c = 1 − 30/336
    val df = Seq((1.0, "a"), (2.0, "a"), (2.0, "b"), (3.0, "b"),
      (3.0, "c"), (3.0, "c"), (5.0, "c")).toDF("v", "g")
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = Stats.kruskalWallis(df, col("v"), col("g")).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 7L)
    val sr = 3.5 * 3.5 / 2 + 7.5 * 7.5 / 2 + 17.0 * 17.0 / 3
    val h = 12.0 / (7.0 * 8) * sr - 3.0 * 8
    val cc = 1.0 - 30.0 / 336
    assert(r.getDouble(2) == r6(h))
    assert(r.getDouble(3) == r6(h / cc))
    assert(r.getDouble(4) == r6((h / cc - 3 + 1) / 4))
    val r17 = Stats.kruskalWallis(df.repartition(17), col("v"), col("g")).collect().head
    assert(r17 == r)
    // all values tied → tie correction hits zero → NULL h_adj/ε²
    val tied = Seq((7.0, "a"), (7.0, "a"), (7.0, "b")).toDF("v", "g")
    val t = Stats.kruskalWallis(tied, col("v"), col("g")).collect().head
    assert(t.isNullAt(3) && t.isNullAt(4))
    graft.Caches.clear()
  }

  test("wilcoxonSignedRank: hand-computed paired W+ with ties; zero diffs excluded") {
    import spark.implicits._
    // d = {+1, −1, +2, +2, −3, 0}: the 0 drops; |d| midranks 1.5,1.5,3.5,3.5,5
    // W+ = 1.5+3.5+3.5 = 8.5; μ=7.5; σ² = 13.75 − 12/48 = 13.5; r_rb = 2/15
    val df = Seq((2.0, 1.0), (0.0, 1.0), (3.0, 1.0), (5.0, 3.0), (0.0, 3.0), (4.0, 4.0))
      .toDF("x", "y")
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = Stats.wilcoxonSignedRank(df, col("x"), col("y")).collect().head
    assert(r.getLong(0) == 5L)
    assert(r.getDouble(1) == 8.5)
    assert(r.getDouble(2) == r6(1.0 / math.sqrt(13.5)))
    assert(r.getDouble(3) == r6(2.0 / 15))
    val r17 = Stats.wilcoxonSignedRank(df.repartition(17), col("x"), col("y")).collect().head
    assert(r17 == r)
    // all pairs equal → every diff drops → n=0, all stats NULL
    val same = Seq((1.0, 1.0), (2.0, 2.0)).toDF("x", "y")
    val s = Stats.wilcoxonSignedRank(same, col("x"), col("y")).collect().head
    assert(s.getLong(0) == 0L && s.isNullAt(1) && s.isNullAt(2) && s.isNullAt(3))
    graft.Caches.clear()
  }

  test("friedmanTest: hand-computed Conover form with within-block ties; incomplete blocks dropped") {
    import spark.implicits._
    // 3 blocks × 3 treatments, block2 has a within-block tie:
    // ranks b1=(1,2,3) b2=(1.5,1.5,3) b3=(1,3,2) → R=(3.5,6.5,8)
    // A=41.5 C=36 → χ² = 2·10.5/5.5; W = χ²/6
    val rows = Seq(
      (1L, "t1", 1.0), (1L, "t2", 2.0), (1L, "t3", 3.0),
      (2L, "t1", 2.0), (2L, "t2", 2.0), (2L, "t3", 5.0),
      (3L, "t1", 1.0), (3L, "t2", 3.0), (3L, "t3", 2.0))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val df = rows.toDF("b", "t", "v")
    val r = Stats.friedmanTest(df, col("b"), col("t"), col("v")).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == r6(21.0 / 5.5))
    assert(r.getDouble(3) == r6(21.0 / 5.5 / 6))
    // an incomplete block (missing t3) is dropped whole — result unchanged
    val extra = (rows ++ Seq((4L, "t1", 9.0), (4L, "t2", 1.0))).toDF("b", "t", "v")
    val e = Stats.friedmanTest(extra, col("b"), col("t"), col("v")).collect().head
    assert(e == r)
    val r17 = Stats.friedmanTest(df.repartition(17), col("b"), col("t"), col("v"))
      .collect().head
    assert(r17 == r)
    // every block internally tied → A = C → NULL statistics
    val flat = Seq((1L, "t1", 1.0), (1L, "t2", 1.0), (2L, "t1", 2.0), (2L, "t2", 2.0))
      .toDF("b", "t", "v")
    val f = Stats.friedmanTest(flat, col("b"), col("t"), col("v")).collect().head
    assert(f.isNullAt(2) && f.isNullAt(3))
    graft.Caches.clear()
  }

  test("holmBonferroni: step-down stops at the first failure; never more rejections than BH") {
    import spark.implicits._
    // sorted p = .001, .03, .04 at α=.05, m=3: bounds .01667, .025, .05 —
    // rank 2 fails, so rank 3 stays accepted EVEN THOUGH .04 ≤ .05
    val df = Seq(("a", 0.001), ("b", 0.03), ("c", 0.04)).toDF("id", "p")
    val r = Stats.holmBonferroni(df, col("p"), col("id"))
      .collect().map(x => x.getString(0) -> x.getBoolean(4)).toMap
    assert(r == Map("a" -> true, "b" -> false, "c" -> false))
    // BH on the same grid rejects everything (.04 ≤ 3·.05/3 at rank 3):
    // Holm ⊆ BH by construction
    val bh = Stats.bhFdr(df, col("p"), col("id"))
      .collect().map(x => x.getString(0) -> x.getBoolean(4)).toMap
    assert(bh == Map("a" -> true, "b" -> true, "c" -> true))
    // all pass → everything rejected; partitioning-invariant
    val all = Seq(("a", 0.001), ("b", 0.002)).toDF("id", "p")
    val ra = Stats.holmBonferroni(all.repartition(17), col("p"), col("id"))
      .collect().map(_.getBoolean(4))
    assert(ra.forall(identity))
    graft.Caches.clear()
  }

  test("hosmerLemeshow: hand-computed 3-bin HL; degenerate zero-expectation bin excluded") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // bins of 2: e=(.3,.9,1.7), o=(0,1,2) →
    // HL = .09/.255 + .01/.495 + .09/.255
    val df = Seq((1L, 0.1, 0), (2L, 0.2, 0), (3L, 0.4, 0), (4L, 0.5, 1),
      (5L, 0.8, 1), (6L, 0.9, 1)).toDF("id", "s", "y")
    val r = Stats.hosmerLemeshow(df, col("s"), col("y"), bins = 3, tieCol = col("id"))
      .collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 6L && r.getLong(3) == 1L)
    assert(r.getDouble(2) == r6(0.09 / 0.255 + 0.01 / 0.495 + 0.09 / 0.255))
    // a bin whose scores are all zero (e = 0) drops out of the statistic
    val zed = Seq((1L, 0.0, 0), (2L, 0.0, 0), (3L, 0.5, 0), (4L, 0.5, 1),
      (5L, 0.8, 1), (6L, 0.9, 1)).toDF("id", "s", "y")
    val z = Stats.hosmerLemeshow(zed, col("s"), col("y"), bins = 3, tieCol = col("id"))
      .collect().head
    assert(z.getLong(0) == 2L && z.getLong(3) == 0L)
    graft.Caches.clear()
  }

  test("jarqueBera: symmetric uniform is pure kurtosis; skew fires on the lopsided set; grid-scale invariant") {
    import spark.implicits._
    // 1..5: m₃=0 so skew=0; m₄/m₂²=6.8/4 → excess −1.3; JB = 5/6·(1.69/4)
    val u = Stats.jarqueBera(Seq(1, 2, 3, 4, 5).toDF("v"), col("v")).collect().head
    assert(u.getLong(0) == 5L)
    assert(u.getDouble(1) == 0.0 && u.getDouble(2) == -1.3)
    assert(u.getDouble(3) == 0.352083)
    // (1,1,1,1,10): hand-worked B/A^1.5 = 1.5, C/A² − 3 = 0.25
    val sk = Stats.jarqueBera(Seq(1, 1, 1, 1, 10).toDF("v"), col("v")).collect().head
    assert(sk.getDouble(1) == 1.5 && sk.getDouble(2) == 0.25)
    assert(sk.getDouble(3) == 1.888021)
    // skew/kurt are scale-invariant: the ×10 grid reproduces 1..5 exactly
    val g = Stats.jarqueBera(Seq(0.1, 0.2, 0.3, 0.4, 0.5).toDF("v"), col("v"),
      valueScale = 1).collect().head
    assert(g.getDouble(1) == 0.0 && g.getDouble(2) == -1.3 && g.getDouble(3) == 0.352083)
    // constant input → zero variance → all NULL
    val c = Stats.jarqueBera(Seq(7, 7, 7).toDF("v"), col("v")).collect().head
    assert(c.isNullAt(1) && c.isNullAt(2) && c.isNullAt(3))
    // partitioning-invariant (exact decimal power sums)
    val p = Stats.jarqueBera(Seq(1, 1, 1, 1, 10).toDF("v").repartition(17),
      col("v")).collect().head
    assert(p.getDouble(3) == 1.888021)
  }

  test("durbinWatson: hand-computed fit + lag-pair ratio; perfect fit yields NULL") {
    import spark.implicits._
    // t=0..5, x=(3,1,4,1,5,9): slope 39/35, intercept 22/21, DW hand-run
    val s = (0 to 5).zip(Seq(3L, 1L, 4L, 1L, 5L, 9L))
      .map { case (t, x) => (t.toLong, x) }.toDF("t", "x")
    val r = Stats.durbinWatson(s).collect().head
    assert(r.getLong(0) == 6L)
    assert(r.getDouble(1) == 1.114286 && r.getDouble(2) == 1.047619)
    assert(r.getDouble(3) == 2.027146)
    // exact line → zero residuals → DW undefined, not 0/0
    val line = (0 to 4).map(t => (t.toLong, 2L * t + 1L)).toDF("t", "x")
    val l = Stats.durbinWatson(line).collect().head
    assert(l.isNullAt(3))
    // partitioning-invariant
    val p = Stats.durbinWatson(s.repartition(17)).collect().head
    assert(p.getDouble(3) == 2.027146)
    graft.Caches.clear()
  }

  test("ljungBox: hand-computed two-lag Q; white-noise r_k small but jointly summed") {
    import spark.implicits._
    val s = (0 to 5).zip(Seq(3L, 1L, 4L, 1L, 5L, 9L))
      .map { case (t, x) => (t.toLong, x) }.toDF("t", "x")
    val r = Stats.ljungBox(s, maxLag = 2).collect().head
    assert(r.getLong(0) == 6L && r.getInt(1) == 2)
    assert(r.getDouble(2) == 0.338381)
    // constant series → zero variance denominator → Q degenerates to 0
    // (every term NULL-guarded out of the sum, never a division error)
    val c = (0 to 4).map(t => (t.toLong, 5L)).toDF("t", "x")
    val cc = Stats.ljungBox(c, maxLag = 2).collect().head
    assert(cc.isNullAt(2) || cc.getDouble(2) == 0.0)
    graft.Caches.clear()
  }

  test("breuschPagan: hand-computed Koenker LM and classic BP on a fan-shaped set") {
    import spark.implicits._
    val df = Seq((1.0, 1.1), (2.0, 1.8), (3.0, 3.4), (4.0, 3.2), (5.0, 6.0),
      (6.0, 4.8)).toDF("x", "y")
    val r = Stats.breuschPagan(df, col("x"), col("y")).collect().head
    assert(r.getLong(0) == 6L)
    assert(r.getDouble(1) == 0.882857 && r.getDouble(2) == 0.293333)
    assert(r.getDouble(3) == 0.488226)
    assert(r.getDouble(4) == 2.929357)
    assert(r.getDouble(5) == 1.907947)
    // partitioning-invariant (decimal re-summed pass-2 moments)
    val p = Stats.breuschPagan(df.repartition(17), col("x"), col("y"))
      .collect().head
    assert(p.getDouble(4) == 2.929357)
    graft.Caches.clear()
  }

  test("cooksDistance: the planted outlier owns the fit; leverage/resid hand-checked") {
    import spark.implicits._
    // y = 2x except y(5)=100: hand-worked D = e²h/(2s²(1−h)²)
    val df = Seq((1L, 1.0, 2.0), (2L, 2.0, 4.0), (3L, 3.0, 6.0),
      (4L, 4.0, 8.0), (5L, 5.0, 100.0)).toDF("id", "x", "y")
    val rows = Stats.cooksDistance(df, col("x"), col("y"), col("id"), topK = 3)
      .collect()
    assert(rows.length == 3)
    assert(rows(0).getLong(0) == 5L && rows(0).getDouble(3) == 36.0 &&
      rows(0).getDouble(4) == 0.6 && rows(0).getDouble(5) == 2.25)
    assert(rows(1).getLong(0) == 1L && rows(1).getDouble(5) == 0.5625)
    assert(rows(2).getLong(0) == 4L && rows(2).getDouble(5) == 0.367347)
    // n ≤ 2 → s² undefined → empty frame, not a crash
    val tiny = Seq((1L, 1.0, 2.0), (2L, 2.0, 4.0)).toDF("id", "x", "y")
    assert(Stats.cooksDistance(tiny, col("x"), col("y"), col("id")).count() == 0L)
    graft.Caches.clear()
  }

  test("moodsMedianTest: perfectly separated groups hit the 2×k χ² maximum; degenerate margin → NULL") {
    import spark.implicits._
    // a=(1,2,3), b=(4,5,6): median = value at rank 3 = 3; table is
    // (0,3)/(3,0) → every cell is 1.5 from expectation → χ² = 6
    val df = Seq(("a", 1), ("a", 2), ("a", 3), ("b", 4), ("b", 5), ("b", 6))
      .toDF("g", "v")
    val r = Stats.moodsMedianTest(df, col("v"), col("g")).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 6L)
    assert(r.getDouble(2) == 3.0 && r.getDouble(3) == 6.0 && r.getLong(4) == 1L)
    // everything ≤ median (constant data) → a zero margin → χ² NULL
    val c = Seq(("a", 5), ("a", 5), ("b", 5), ("b", 5)).toDF("g", "v")
    val cr = Stats.moodsMedianTest(c, col("v"), col("g")).collect().head
    assert(cr.isNullAt(3))
    graft.Caches.clear()
  }

  test("gkGamma: hand-computed concordance; gamma drops ties, Somers' D charges the dependent axis") {
    import spark.implicits._
    // cells (1,1)×3 (1,2)×1 (2,1)×1 (2,2)×3: C=9, D=1, n=8,
    // n0=28, tie-pairs 12 each axis → γ=0.8, D_yx=D_xy=0.5
    val rows = Seq.fill(3)((1, 1)) ++ Seq((1, 2), (2, 1)) ++ Seq.fill(3)((2, 2))
    val r = Stats.gkGamma(rows.toDF("x", "y"), col("x"), col("y")).collect().head
    assert(r.getLong(0) == 8L)
    assert(r.getDouble(1) == 0.8 && r.getDouble(2) == 0.5 && r.getDouble(3) == 0.5)
    // fully tied y-axis: γ NULL (C+D=0), D_yx = 0 (x has no ties, so its
    // denominator n₀−n₁ survives), D_xy NULL (every pair tied on y)
    val flat = Seq((1, 1), (2, 1), (3, 1)).toDF("x", "y")
    val f = Stats.gkGamma(flat, col("x"), col("y")).collect().head
    assert(f.isNullAt(1) && f.getDouble(2) == 0.0 && f.isNullAt(3))
    graft.Caches.clear()
  }

  test("gkLambda: the textbook asymmetric table — zero one way, half the errors the other") {
    import spark.implicits._
    // A:(p×10), B:(p×5,q×5): knowing x never changes the modal y guess
    // (λ_yx=0) but knowing y halves the x errors (λ_xy=0.5)
    val rows = Seq.fill(10)(("A", "p")) ++ Seq.fill(5)(("B", "p")) ++
      Seq.fill(5)(("B", "q"))
    val r = Stats.gkLambda(rows.toDF("x", "y"), col("x"), col("y")).collect().head
    assert(r.getLong(0) == 20L)
    assert(r.getDouble(1) == 0.0 && r.getDouble(2) == 0.5)
    graft.Caches.clear()
  }

  test("pointBiserial: hand-computed r and t; empty arm → NULL") {
    import spark.implicits._
    val df = Seq((4, true), (5, true), (6, true), (1, false), (2, false),
      (3, false)).toDF("v", "f")
    val r = Stats.pointBiserial(df, col("v"), col("f")).collect().head
    assert(r.getLong(0) == 6L && r.getLong(1) == 3L && r.getLong(2) == 3L)
    assert(r.getDouble(3) == 5.0 && r.getDouble(4) == 2.0)
    assert(r.getDouble(5) == 0.87831 && r.getDouble(6) == 3.674235)
    val one = Seq((1, true), (2, true)).toDF("v", "f")
    val o = Stats.pointBiserial(one, col("v"), col("f")).collect().head
    assert(o.isNullAt(5))
  }

  test("partialCorr: y = x + z makes the partial exactly 1; pairwise r's hand-checked") {
    import spark.implicits._
    val xs = Seq(1, 2, 3, 4, 5); val zs = Seq(2, 1, 4, 3, 5)
    val df = xs.zip(zs).map { case (x, z) => (x, x + z, z) }.toDF("x", "y", "z")
    val r = Stats.partialCorr(df, col("x"), col("y"), col("z")).collect().head
    assert(r.getLong(0) == 5L)
    assert(r.getDouble(1) == 0.948683 && r.getDouble(2) == 0.8 &&
      r.getDouble(3) == 0.948683)
    assert(r.getDouble(4) == 1.0)
    // constant z → r_xz undefined → partial NULL, pairwise r_xy intact
    val cz = Seq((1, 2, 7), (2, 4, 7), (3, 5, 7)).toDF("x", "y", "z")
    val c = Stats.partialCorr(cz, col("x"), col("y"), col("z")).collect().head
    assert(!c.isNullAt(1) && c.isNullAt(2) && c.isNullAt(4))
  }

  test("iccOneWay: separated groups give ICC near 1; hand-computed mean squares") {
    import spark.implicits._
    val df = Seq(("a", 1), ("a", 2), ("a", 3), ("b", 7), ("b", 8), ("b", 9))
      .toDF("g", "v")
    val r = Stats.iccOneWay(df, col("v"), col("g")).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 6L)
    assert(r.getDouble(2) == 54.0 && r.getDouble(3) == 1.0)
    assert(r.getDouble(4) == 3.0 && r.getDouble(5) == 0.946429)
    // one group → between-groups undefined → NULLs, not a crash
    val one = Seq(("a", 1), ("a", 2)).toDF("g", "v")
    val o = Stats.iccOneWay(one, col("v"), col("g")).collect().head
    assert(o.isNullAt(2) && o.isNullAt(5))
  }

  test("fleissKappa: two-item hand case; off-panel items dropped and counted") {
    import spark.implicits._
    // item1 (a,a,a), item2 (a,b,b): P̄=2/3, P_e=5/9, κ=0.25; item3 has
    // only 2 ratings → excluded from the panel, counted in dropped
    val df = Seq((1, "a"), (1, "a"), (1, "a"), (2, "a"), (2, "b"), (2, "b"),
      (3, "a"), (3, "a")).toDF("i", "c")
    val r = Stats.fleissKappa(df, col("i"), col("c"), nRaters = 3).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 1L && r.getInt(2) == 3)
    assert(r.getDouble(3) == 0.666667 && r.getDouble(4) == 0.555556)
    assert(r.getDouble(5) == 0.25)
    // unanimous raters on one category → P_e = 1 → κ NULL (vacuous)
    val u = Seq((1, "a"), (1, "a"), (2, "a"), (2, "a")).toDF("i", "c")
    val ur = Stats.fleissKappa(u, col("i"), col("c"), nRaters = 2).collect().head
    assert(ur.isNullAt(5))
    graft.Caches.clear()
  }

  test("chao1: hand-computed richness off the ragged frequency-table bottom") {
    import spark.implicits._
    // counts a×1 b×1 c×2 d×3 → n=7, S=4, f1=2, f2=1 →
    // chao1 = 4 + 2·1/(2·2) = 4.5, coverage = 1 − 2/7
    val toks = Seq("a", "b", "c", "c", "d", "d", "d").toDF("k")
    val r = Stats.chao1(toks, col("k")).collect().head
    assert(r.getLong(0) == 7L && r.getLong(1) == 4L &&
      r.getLong(2) == 2L && r.getLong(3) == 1L)
    assert(r.getDouble(4) == 4.5 && r.getDouble(5) == 0.714286)
    // no singletons at all → chao1 = S_obs (nothing unseen predicted)
    val full = Seq("a", "a", "b", "b").toDF("k")
    val f = Stats.chao1(full, col("k")).collect().head
    assert(f.getDouble(4) == 2.0 && f.getDouble(5) == 1.0)
  }

  test("diversityProfile: hand-computed index card; uniform stratum maxes evenness") {
    import spark.implicits._
    val df = Seq(("s", "a"), ("s", "a"), ("s", "b"), ("s", "c"),
      ("u", "x"), ("u", "y")).toDF("g", "k")
    val got = Stats.diversityProfile(df, col("k"), Seq("g"))
      .collect().map(r => r.getString(0) -> r).toMap
    val s = got("s")
    assert(s.getLong(1) == 4L && s.getLong(2) == 3L)
    assert(s.getDouble(3) == 1.039721 && s.getDouble(4) == 0.946395)
    assert(s.getDouble(5) == 0.375 && s.getDouble(6) == 0.625)
    assert(s.getDouble(7) == 2.666667 && s.getDouble(8) == 0.5)
    // two keys once each: H = ln 2, Pielou exactly 1, BP = 0.5
    val u = got("u")
    assert(u.getDouble(4) == 1.0 && u.getDouble(8) == 0.5)
    graft.Caches.clear()
  }

  test("yuleWalkerAr2: hand-run closed form; phi2 is the lag-2 PACF") {
    import spark.implicits._
    val s = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L).zipWithIndex
      .map { case (x, t) => (t.toLong, x) }.toDF("t", "x")
    val r = Stats.yuleWalkerAr2(s).collect().head
    assert(r.getLong(0) == 8L)
    assert(r.getDouble(1) == -0.175236 && r.getDouble(2) == 0.044326)
    assert(r.getDouble(3) == -0.172774 && r.getDouble(4) == 0.01405)
    assert(r.getDouble(5) == 0.969101)
    // constant series → zero-variance denominator → all NULL
    val c = (0 to 5).map(t => (t.toLong, 4L)).toDF("t", "x")
    val cr = Stats.yuleWalkerAr2(c).collect().head
    assert(cr.isNullAt(1) && cr.isNullAt(3))
    graft.Caches.clear()
  }

  test("sprtBinomial: success streak crosses the upper bound at the hand-computed step; no crossing → continue") {
    import spark.implicits._
    val l1 = 0.6931471805599453; val l0 = -0.11778303565638339
    val a = 2.9444389791664403
    // five straight successes: llr = 5·ln2 = 3.4657… first ≥ logA at t=5
    val df = (1 to 5).map(i => (i.toLong, true)).toDF("ord", "s")
    val r = Stats.sprtBinomial(df, col("s"), Seq(col("ord")), l1, l0, a, -a)
      .collect().head
    assert(r.getLong(0) == 5L && r.getString(2) == "accept_h1")
    assert(r.getLong(3) == 5L && r.getLong(4) == 5L)
    assert(r.getDouble(5) == 3.465736)
    // 30 straight failures cross the LOWER bound at t = 25
    val f = (1 to 30).map(i => (i.toLong, false)).toDF("ord", "s")
    val rf = Stats.sprtBinomial(f, col("s"), Seq(col("ord")), l1, l0, a, -a)
      .collect().head
    assert(rf.getString(2) == "accept_h0" && rf.getLong(3) == 25L)
    assert(rf.getDouble(5) == -2.944576)
    // too few trials to decide → continue with the final state
    val few = (1 to 3).map(i => (i.toLong, i % 2 == 0)).toDF("ord", "s")
    val rc = Stats.sprtBinomial(few, col("s"), Seq(col("ord")), l1, l0, a, -a)
      .collect().head
    assert(rc.getString(2) == "continue" && rc.getLong(3) == 3L)
    graft.Caches.clear()
  }

  test("moransI: homophilous pairs give I = 0.6 on the hand graph; disassortative flips the sign") {
    import spark.implicits._
    val vals = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0)).toDF("id", "v")
    // neighbors with adjacent values: 1–2, 3–4 (both directions)
    val e1 = Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L)).toDF("src", "dst")
    val r = Stats.moransI(e1, vals, col("id"), col("v")).collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 4L)
    assert(r.getDouble(2) == 0.6 && r.getDouble(3) == -0.333333)
    // extremes wired together: 1–4, 2–3 → negative autocorrelation
    val e2 = Seq((1L, 4L), (4L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val r2 = Stats.moransI(e2, vals, col("id"), col("v")).collect().head
    assert(r2.getDouble(2) < 0)
    graft.Caches.clear()
  }

  test("gearysC: hand graph gives C = 0.3 under homophily, 1.5 under contrast") {
    import spark.implicits._
    // the moransI fixture: mean 2.5, Σz² = 5
    val vals = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0)).toDF("id", "v")
    // adjacent values wired: Σ(xu−xv)² = 4 → C = 3/(2·4) · 4/5 = 0.3 (< 1)
    val e1 = Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L)).toDF("src", "dst")
    val r = Stats.gearysC(e1, vals, col("id"), col("v")).collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 4L)
    assert(r.getDouble(2) == 0.3 && r.getDouble(3) == 1.0)
    // extremes wired: Σ(xu−xv)² = 20 → C = 3/8 · 4 = 1.5 (> 1)
    val e2 = Seq((1L, 4L), (4L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val r2 = Stats.gearysC(e2, vals, col("id"), col("v")).collect().head
    assert(r2.getDouble(2) == 1.5)
    graft.Caches.clear()
  }

  test("expectedCalibrationError: hand-computed weighted gap and worst bin") {
    import spark.implicits._
    // 2 bins of 2: (conf .15, acc 0) and (conf .85, acc .5) →
    // ECE = (2·.15 + 2·.35)/4 = 0.25, MCE = 0.35
    val df = Seq((1L, 0.1, false), (2L, 0.2, false), (3L, 0.8, true),
      (4L, 0.9, false)).toDF("id", "s", "y")
    val r = Stats.expectedCalibrationError(df, col("s"), col("y"), bins = 2,
      tieCol = col("id")).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 4L)
    assert(r.getDouble(2) == 0.25 && r.getDouble(3) == 0.35)
    // perfectly calibrated constant scorer: conf = acc in every bin
    val cal = Seq((1L, 0.5, true), (2L, 0.5, false), (3L, 0.5, true),
      (4L, 0.5, false)).toDF("id", "s", "y")
    val c = Stats.expectedCalibrationError(cal, col("s"), col("y"), bins = 2,
      tieCol = col("id")).collect().head
    assert(c.getDouble(2) == 0.0 && c.getDouble(3) == 0.0)
    graft.Caches.clear()
  }

  test("powerTwoProportions: hand MDE at p=0.1, balanced 100/100 arms") {
    import spark.implicits._
    val rows = (1 to 100).map(i => (true, i <= 10)) ++
      (1 to 100).map(i => (false, i <= 10))
    val r = Stats.powerTwoProportions(rows.toDF("a", "y"), col("a"), col("y"),
      targetLift = 0.02).collect().head
    assert(r.getLong(0) == 100L && r.getLong(1) == 100L)
    assert(r.getDouble(2) == 0.1)
    assert(r.getDouble(3) == 0.118861 && r.getDouble(4) == 1.188612)
    assert(r.getLong(5) == 3532L)
    // empty arm → MDE undefined, pooled rate still reported
    val one = Seq((true, true), (true, false)).toDF("a", "y")
    val o = Stats.powerTwoProportions(one, col("a"), col("y"), targetLift = 0.02)
      .collect().head
    assert(o.isNullAt(3) && o.getDouble(2) == 0.5)
  }

  test("pageTrend: perfectly monotone blocks hit the hand-computed L and z") {
    import spark.implicits._
    // two users, values rise with the dose: L₂ = Σc·R₂ = 56 → L = 28;
    // E = 24, V = b·k²(k+1)(k²−1)/144 = 4 → z = 2
    val df = Seq((1L, 0L, 1L), (1L, 1L, 2L), (1L, 2L, 3L),
      (2L, 0L, 1L), (2L, 1L, 2L), (2L, 2L, 3L)).toDF("u", "p", "v")
    val r = Stats.pageTrend(df, col("u"), col("p"), col("v")).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 28.0 && r.getDouble(3) == 2.0)
    // reversed order flips the sign symmetrically
    val rev = Seq((1L, 0L, 3L), (1L, 1L, 2L), (1L, 2L, 1L),
      (2L, 0L, 3L), (2L, 1L, 2L), (2L, 2L, 1L)).toDF("u", "p", "v")
    val rr = Stats.pageTrend(rev, col("u"), col("p"), col("v")).collect().head
    assert(rr.getDouble(2) == 20.0 && rr.getDouble(3) == -2.0)
    graft.Caches.clear()
  }

  test("jonckheereTerpstra: fully ordered groups hit the hand z; half-credit ties") {
    import spark.implicits._
    // A=(1,2) B=(3,4) C=(5,6): JT = 12, E = 6, V = (510−54)/72 → z hand
    val df = Seq(("1", 1), ("1", 2), ("2", 3), ("2", 4), ("3", 5), ("3", 6))
      .map { case (g, v) => (g.toInt, v) }.toDF("g", "v")
    val r = Stats.jonckheereTerpstra(df, col("g"), col("v")).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 6L)
    assert(r.getDouble(2) == 12.0 && r.getDouble(3) == 2.384158)
    // cross-group tie counts half: A=(1,1), B=(1,2) → JT = ½+1+½+1 = 3
    val t = Seq((1, 1), (1, 1), (2, 1), (2, 2)).toDF("g", "v")
    val tr = Stats.jonckheereTerpstra(t, col("g"), col("v")).collect().head
    assert(tr.getDouble(2) == 3.0)
    graft.Caches.clear()
  }

  test("forecastErrors: hand card on a ramp; sMAPE skips zero/zero periods honestly") {
    import spark.implicits._
    // x = 1..6, season 2: e ≡ 2, e₁ ≡ 1 → ME=MAE=RMSE=2, U₂=2
    val s = (0 to 5).map(t => (t.toLong, (t + 1).toLong)).toDF("t", "x")
    val r = Stats.forecastErrors(s, season = 2).collect().head
    assert(r.getLong(0) == 4L)
    assert(r.getDouble(1) == 2.0 && r.getDouble(2) == 2.0 && r.getDouble(3) == 2.0)
    assert(r.getDouble(4) == 0.641667 && r.getLong(5) == 4L)
    assert(r.getDouble(6) == 2.0)
    // an all-zero stretch: those periods leave the sMAPE count
    val z = Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 5L)).toDF("t", "x")
    val zr = Stats.forecastErrors(z, season = 2).collect().head
    assert(zr.getLong(0) == 2L && zr.getLong(5) == 1L && zr.getDouble(4) == 2.0)
    graft.Caches.clear()
  }

  test("blandAltman: hand bias/limits; everything inside at z=1.96 on the small set") {
    import spark.implicits._
    val df = Seq((2.0, 1.0), (4.0, 2.0), (6.0, 3.0), (20.0, 10.0)).toDF("x", "y")
    val r = Stats.blandAltman(df, col("x"), col("y")).collect().head
    assert(r.getLong(0) == 4L)
    assert(r.getDouble(1) == 4.0 && r.getDouble(2) == 4.082483)
    assert(r.getDouble(3) == -4.001519 && r.getDouble(4) == 12.001519)
    assert(r.getLong(5) == 0L && r.getDouble(6) == 0.0)
    graft.Caches.clear()
  }

  test("linCcc: perfect correlation with a scale bias scores low concordance") {
    import spark.implicits._
    // y = 2x: r = 1 exactly, but CCC = 0.363636 — the whole point
    val df = Seq((1, 2), (2, 4), (3, 6)).toDF("x", "y")
    val r = Stats.linCcc(df, col("x"), col("y")).collect().head
    assert(r.getLong(0) == 3L)
    assert(r.getDouble(1) == 1.0 && r.getDouble(2) == 0.363636 &&
      r.getDouble(3) == 0.363636)
    // identity pairs: full concordance
    val id = Seq((1, 1), (2, 2), (3, 3)).toDF("x", "y")
    val i = Stats.linCcc(id, col("x"), col("y")).collect().head
    assert(i.getDouble(3) == 1.0)
  }

  test("demingFit: exact line recovered under orthogonal errors; constant x is NULL") {
    import spark.implicits._
    // y = 2x + 1: cyy−cxx = 18, disc = 900 → slope 2, intercept 1
    val df = Seq((1, 3), (2, 5), (3, 7)).toDF("x", "y")
    val r = Stats.demingFit(df, col("x"), col("y")).collect().head
    assert(r.getLong(0) == 3L)
    assert(r.getDouble(1) == 2.0 && r.getDouble(2) == 1.0)
    // zero covariance → no linear information → NULL, not a division blowup
    val flat = Seq((1, 5), (2, 5), (3, 5)).toDF("x", "y")
    val f = Stats.demingFit(flat, col("x"), col("y")).collect().head
    assert(f.isNullAt(1) && f.isNullAt(2))
  }

  test("quadeTest: wide blocks dominate the hand F; identical sorts go NULL not infinite") {
    import spark.implicits._
    // b1=(1,2,3) range 2, b2=(10,30,20) range 20: S₄ grid hand-folded →
    // A₄=160, B₄=224 → F = 1·224/(2·160−224) = 2.333333
    val df = Seq((1, "t1", 1), (1, "t2", 2), (1, "t3", 3),
      (2, "t1", 10), (2, "t2", 30), (2, "t3", 20)).toDF("b", "t", "v")
    val r = Stats.quadeTest(df, col("b"), col("t"), col("v")).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 2.333333)
    assert(r.getLong(3) == 2L && r.getLong(4) == 2L)
    // identical sorts AND identical ranges → S_ij equal across blocks →
    // A = B (the Cauchy–Schwarz equality case) → F undefined → NULL
    val same = Seq((1, "t1", 1), (1, "t2", 2), (2, "t1", 11), (2, "t2", 12))
      .toDF("b", "t", "v")
    val s = Stats.quadeTest(same, col("b"), col("t"), col("v")).collect().head
    assert(s.isNullAt(2))
    graft.Caches.clear()
  }

  test("olsTwo: exact plane recovered; VIF hand-checked on correlated regressors") {
    import spark.implicits._
    // y = 1 + 2a + 3b exactly; corr(a,b)² = 0.36 → VIF = 1.5625
    val df = Seq((1, 2), (2, 1), (3, 4), (4, 3))
      .map { case (a, b) => (a, b, 1.0 + 2.0 * a + 3.0 * b) }.toDF("a", "b", "y")
    val r = Stats.olsTwo(df, col("a"), col("b"), col("y")).collect().head
    assert(r.getLong(0) == 4L)
    assert(r.getDouble(1) == 1.0 && r.getDouble(2) == 2.0 && r.getDouble(3) == 3.0)
    assert(r.getDouble(4) == 1.0 && r.getDouble(5) == 1.5625)
    // perfectly collinear regressors → singular normal equations → NULLs
    val col2 = Seq((1, 2, 5.0), (2, 4, 8.0), (3, 6, 11.0)).toDF("a", "b", "y")
    val c = Stats.olsTwo(col2, col("a"), col("b"), col("y")).collect().head
    assert(c.isNullAt(1) && c.isNullAt(2) && c.isNullAt(5))
  }

  test("winsorizedCorr: one wild pair clamps back onto the identity line") {
    import spark.implicits._
    // identity except (10, 100): at trim 0.1 both clamps land on rank 9
    // → the wild pair becomes (9, 9) → corr_w exactly 1
    val rows = (1 to 9).map(i => (i.toDouble, i.toDouble)) :+ ((10.0, 100.0))
    val r = Stats.winsorizedCorr(rows.toDF("x", "y"), col("x"), col("y"),
      trim = 0.1).collect().head
    assert(r.getLong(0) == 10L)
    assert(r.getDouble(1) == 1.0 && r.getDouble(2) == 9.0)
    assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 9.0)
    assert(r.getDouble(5) == 1.0)
    // the plain fold on the same pairs is held hostage by the outlier
    val plain = Stats.linearFit(rows.toDF("x", "y"), col("x"), col("y"))
      .collect().head
    assert(plain.getDouble(1) < 0.9)
    graft.Caches.clear()
  }

  test("neweyWest: hand LRV on a ramp — positive autocorrelation inflates the SE") {
    import spark.implicits._
    // x = 1..6, m = 1: γ₀ = 35/12, γ₁ hand → LRV = 4.375, inflation 1.5
    val s = (0 to 5).map(t => (t.toLong, (t + 1).toLong)).toDF("t", "x")
    val r = Stats.neweyWest(s, maxLag = 1).collect().head
    assert(r.getLong(0) == 6L && r.getInt(1) == 1)
    assert(r.getDouble(2) == 2.916667 && r.getDouble(3) == 4.375)
    assert(r.getDouble(4) == 0.853913 && r.getDouble(5) == 0.697217)
    assert(r.getDouble(6) == 1.5)
    // constant series: γ₀ = 0 → LRV 0, inflation NULL (not 0/0)
    val c = (0 to 4).map(t => (t.toLong, 7L)).toDF("t", "x")
    val cr = Stats.neweyWest(c, maxLag = 1).collect().head
    assert(cr.getDouble(3) == 0.0 && cr.isNullAt(6))
    graft.Caches.clear()
  }

  test("inequalityIndices: equality zeroes every index; hand card on the skewed set") {
    import spark.implicits._
    val eq = Seq(5.0, 5.0, 5.0, 5.0).toDF("x")
    val e = Stats.inequalityIndices(eq, col("x")).collect().head
    assert(e.getLong(0) == 4L && e.getDouble(1) == 5.0)
    assert(e.getDouble(2) == 0.0 && e.getDouble(3) == 0.0 &&
      e.getDouble(4) == 0.0 && e.getDouble(5) == 0.0)
    // (1,1,1,1,6): hand-worked T/L/Atkinson/Hoover
    val sk = Seq(1.0, 1.0, 1.0, 1.0, 6.0).toDF("x")
    val s = Stats.inequalityIndices(sk, col("x")).collect().head
    assert(s.getDouble(2) == 0.381909 && s.getDouble(3) == 0.334795)
    assert(s.getDouble(4) == 0.284515 && s.getDouble(5) == 0.4)
    // non-positive rows are excluded, not log-crashed
    val z = Seq(0.0, -3.0, 2.0, 2.0).toDF("x")
    val zr = Stats.inequalityIndices(z, col("x")).collect().head
    assert(zr.getLong(0) == 2L && zr.getDouble(2) == 0.0)
    graft.Caches.clear()
  }

  test("grubbs: the planted extreme is the witness; hand-computed G") {
    import spark.implicits._
    val df = Seq(1.0, 2.0, 3.0, 4.0, 100.0).toDF("v")
    val r = Stats.grubbs(df, col("v")).collect().head
    assert(r.getLong(0) == 5L)
    assert(r.getDouble(1) == 22.0 && r.getDouble(2) == 43.617657)
    assert(r.getDouble(3) == 1.788267 && r.getDouble(4) == 100.0)
    // symmetric two-sided tie → max(value) wins deterministically
    val sym = Seq(-5.0, 0.0, 5.0).toDF("v")
    val sr = Stats.grubbs(sym, col("v")).collect().head
    assert(sr.getDouble(4) == 5.0)
    graft.Caches.clear()
  }
}