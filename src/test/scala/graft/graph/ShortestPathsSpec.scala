package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ShortestPathsSpec extends SparkSpec {

  /** Reference BFS on an adjacency set. */
  private def brute(edges: Set[(Long, Long)], sources: Set[Long], maxDist: Int): Map[Long, Int] = {
    val adj = edges.flatMap(e => Seq(e, e.swap)).filter(e => e._1 != e._2)
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
    var dist = sources.map(_ -> 0).toMap
    var frontier = sources
    var d = 0
    while (frontier.nonEmpty && d < maxDist) {
      val next = frontier.flatMap(v => adj.getOrElse(v, Set.empty[Long])) -- dist.keySet
      next.foreach(v => dist += v -> (d + 1))
      frontier = next
      d += 1
    }
    dist
  }

  private def run(edges: Seq[(Long, Long)], sources: Seq[Long], maxDist: Int = 50): Map[Long, Int] = {
    import spark.implicits._
    GraphQueries.shortestPaths(spark, edges.toDF("src", "dst"), sources, maxDist = maxDist)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
  }

  test("path graph: dists count hops from the source; unreachable vertices absent") {
    // 1-2-3-4-5 plus a disconnected pair 8-9 and nothing referencing 7
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (8L, 9L))
    assert(run(e, Seq(1L)) == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4))
  }

  test("multi-source: dist is to the NEAREST source; isolated source reports 0") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    // 99 appears in no edge but is a source
    assert(run(e, Seq(1L, 5L, 99L)) ==
      Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 1, 5L -> 0, 99L -> 0))
  }

  test("maxDist truncates the radius; one-way vs bidirectional input agree") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(run(e, Seq(1L), maxDist = 2) == Map(1L -> 0, 2L -> 1, 3L -> 2))
    // undirected reading: reversed and doubled edge lists give the same answer
    assert(run(e.map(_.swap), Seq(1L)) == run(e, Seq(1L)))
    assert(run(e ++ e.map(_.swap), Seq(1L)) == run(e, Seq(1L)))
  }

  test("matches reference BFS on a pseudorandom graph (multi-round, with cycles)") {
    val rnd = new scala.util.Random(7)
    val edges = (1 to 400).map(_ => (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter(e => e._1 != e._2)
    val sources = Seq(0L, 1L, 2L)
    val expect = brute(edges.toSet, sources.toSet, 50)
    assert(run(edges, sources) == expect)
  }

  test("maxDist=0 returns exactly the source set at dist 0") {
    assert(run(Seq((1L, 2L)), Seq(1L), maxDist = 0) == Map(1L -> 0))
  }

  private def runLm(edges: Seq[(Long, Long)], lms: Seq[Long], maxDist: Int = 50): Map[(Long, Long), Int] = {
    import spark.implicits._
    GraphQueries.landmarkDistances(spark, edges.toDF("src", "dst"), lms, maxDist = maxDist)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
  }

  test("landmarkDistances: one distance PER landmark, agrees with per-source BFS") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (8L, 9L))
    val got = runLm(e, Seq(1L, 5L, 8L))
    // vertex 3 is 2 hops from landmark 1 AND 2 hops from landmark 5;
    // nothing reaches landmark 8 from the path component
    assert(got((3L, 1L)) == 2 && got((3L, 5L)) == 2)
    assert(got((9L, 8L)) == 1 && !got.contains((9L, 1L)))
    // slice per landmark ≡ single-source shortestPaths
    for (lm <- Seq(1L, 5L, 8L)) {
      val slice = got.collect { case ((v, l), dd) if l == lm => v -> dd }
      assert(slice == run(e, Seq(lm)), s"landmark $lm slice diverges")
    }
  }

  test("relaxDistances: cold ≡ shortestPaths; warm on a grown graph ≡ cold; caps respected") {
    import spark.implicits._
    val e1 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val init0 = Seq((1L, 0)).toDF("id", "dist")
    val relaxCold = GraphQueries.relaxDistances(spark, e1.toDF("src", "dst"), init0)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(relaxCold == run(e1, Seq(1L)))
    // grow the graph: a 1-5 shortcut LOWERS existing distances, vertex 7
    // is brand new; warm-start from the stale distance table
    val e2 = e1 ++ Seq((1L, 5L), (6L, 7L))
    val stale = Seq((1L, 0), (2L, 1), (3L, 2), (4L, 3), (5L, 4), (6L, 5)).toDF("id", "dist")
    val warm = GraphQueries.relaxDistances(spark, e2.toDF("src", "dst"), stale)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(warm == run(e2, Seq(1L)))
    assert(warm(5L) == 1 && warm(6L) == 2 && warm(7L) == 3)
    // the radius cap composes with warm start like the cold one
    val capped = GraphQueries.relaxDistances(spark, e2.toDF("src", "dst"), stale, maxDist = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(capped == run(e2, Seq(1L), maxDist = 2))
  }

  test("relaxDistances: pseudorandom grown graph, warm from the old half ≡ cold full") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val all = (1 to 360).map(_ => (rnd.nextInt(100).toLong, rnd.nextInt(100).toLong))
      .filter(e => e._1 != e._2)
    val (half, rest) = all.splitAt(180)
    val sources = Seq(0L, 1L)
    val old = GraphQueries.shortestPaths(spark, half.toDF("src", "dst"), sources)
    val warm = GraphQueries.relaxDistances(spark, (half ++ rest).toDF("src", "dst"), old)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(warm == run(half ++ rest, sources))
  }

  test("landmarkDistances: pseudorandom graph ≡ per-landmark reference BFS; radius cap honored") {
    val rnd = new scala.util.Random(13)
    val edges = (1 to 300).map(_ => (rnd.nextInt(90).toLong, rnd.nextInt(90).toLong))
      .filter(e => e._1 != e._2)
    val lms = Seq(0L, 1L)
    val expect = lms.flatMap(lm =>
      brute(edges.toSet, Set(lm), 3).map { case (v, dd) => (v, lm) -> dd }).toMap
    assert(runLm(edges, lms, maxDist = 3) == expect)
  }
}

class NeighborhoodFunctionSpec extends SparkSpec {
  import spark.implicits._

  test("neighborhoodFunction: small balls are exact (HLL sparse mode); path graph hops") {
    // path 1—2—3—4, undirected (both directions passed explicitly)
    val canon = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val e = (canon ++ canon.map(_.swap)).toDF("src", "dst")
    val v = e.select(col("src").as("id")).distinct()
    val got = GraphQueries.neighborhoodFunction(spark, v, e, maxHops = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> math.round(r.getDouble(2))).toMap
    // hop 1: endpoint balls 2, inner balls 3
    assert(got((1L, 1)) == 2L && got((2L, 1)) == 3L && got((3L, 1)) == 3L && got((4L, 1)) == 2L)
    // hop 2: endpoints reach 3, inner reach all 4
    assert(got((1L, 2)) == 3L && got((2L, 2)) == 4L && got((3L, 2)) == 4L && got((4L, 2)) == 3L)
    // hop 3: everyone reaches everyone
    assert(Seq(1L, 2L, 3L, 4L).forall(id => got((id, 3)) == 4L))
    graft.Caches.clear()
  }

  test("neighborhoodFunction: directed out-reach; estimates track exact balls on a random graph") {
    // directed: 1→2 only — ball(1)={1,2}, ball(2)={2}
    val dir = Seq((1L, 2L)).toDF("src", "dst")
    val vd = Seq(1L, 2L).toDF("id")
    val d = GraphQueries.neighborhoodFunction(spark, vd, dir, maxHops = 1)
      .collect().map(r => r.getLong(0) -> math.round(r.getDouble(2))).toMap
    assert(d(1L) == 2L && d(2L) == 1L)
    // pseudorandom undirected graph: hop-2 estimates vs exact BFS balls
    val rnd = new scala.util.Random(7)
    val es = (0 until 120).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }.distinct
    val bi = (es ++ es.map(_.swap)).distinct
    val eDf = bi.toDF("src", "dst")
    val vDf = eDf.select(col("src").as("id")).distinct()
    val est = GraphQueries.neighborhoodFunction(spark, vDf, eDf, maxHops = 2)
      .where(col("hop") === 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1 + 1)).toMap
    val adj = bi.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    est.foreach { case (id, e2) =>
      val b1 = adj.getOrElse(id, Set.empty) + id
      val b2 = b1 ++ b1.flatMap(adj.getOrElse(_, Set.empty))
      // balls ≤ 40 ≪ 2^12 registers — the sketch is still in exact sparse mode
      assert(math.round(e2) == b2.size.toLong, s"vertex $id: est $e2 vs exact ${b2.size}")
    }
    graft.Caches.clear()
  }

  test("neighborhoodFunction: converged frontier — hops past the diameter replicate the final reach") {
    // star: center 0 ↔ leaves 1..5, diameter 2 — everyone saturates at hop 2,
    // hops 3..5 must ride the early-exit path and still report full reach.
    val canon = (1L to 5L).map(l => (0L, l))
    val e = (canon ++ canon.map(_.swap)).toDF("src", "dst")
    val v = (0L to 5L).toDF("id")
    val got = GraphQueries.neighborhoodFunction(spark, v, e, maxHops = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> math.round(r.getDouble(2))).toMap
    assert(got.size == 6 * 5, "every (vertex, hop) pair present after convergence")
    (0L to 5L).foreach { id =>
      (2 to 5).foreach(h => assert(got((id, h)) == 6L, s"vertex $id hop $h full reach"))
    }
    // hop 1: center sees all 6; each leaf sees itself + center
    assert(got((0L, 1)) == 6L && (1L to 5L).forall(l => got((l, 1)) == 2L))
    graft.Caches.clear()
  }

  test("effectiveDiameter: exact interpolation on small curves (HLL sparse mode is exact)") {
    // path 1—2—3—4: N(1)=10, N(2)=14, N(3)=16; q=0.9 → target 14.4 →
    // first hop ≥ target is 3, interpolated 2 + (14.4−14)/(16−14) = 2.2
    val canon = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val e = (canon ++ canon.map(_.swap)).toDF("src", "dst")
    val v = e.select(col("src").as("id")).distinct()
    val anf = GraphQueries.neighborhoodFunction(spark, v, e, maxHops = 3)
    val r = GraphQueries.effectiveDiameter(anf, q = 0.9).collect().head
    assert(r.getInt(0) == 3 && r.getLong(1) == 16L)
    assert(math.abs(r.getDouble(2) - 2.2) < 1e-6, s"got ${r.getDouble(2)}")
    graft.Caches.clear()
    // star saturates at hop 2 with maxHops=5: N(1)=16, N(2..5)=36;
    // target 32.4 → hop 2, interpolated 1 + (32.4−16)/(36−16) = 1.82
    val sc = (1L to 5L).map(l => (0L, l))
    val se = (sc ++ sc.map(_.swap)).toDF("src", "dst")
    val sv = (0L to 5L).toDF("id")
    val sanf = GraphQueries.neighborhoodFunction(spark, sv, se, maxHops = 5)
    val sr = GraphQueries.effectiveDiameter(sanf, q = 0.9).collect().head
    assert(sr.getInt(0) == 5 && sr.getLong(1) == 36L)
    assert(math.abs(sr.getDouble(2) - 1.82) < 1e-6, s"got ${sr.getDouble(2)}")
    // q = 1.0 on the saturated curve picks the first saturated hop exactly
    val full = GraphQueries.effectiveDiameter(sanf, q = 1.0).collect().head
    assert(full.getDouble(2) == 2.0, s"got ${full.getDouble(2)}")
    graft.Caches.clear()
    // hop-0 interpolation (the Palmer/Faloutsos convention below hop 1):
    // triangle saturates AT hop 1 — N(0)=3, N(1)=N(2)=9; q=0.9 → target
    // 8.1 → interpolated 0 + (8.1−3)/(9−3) = 0.85, not a 1.0 pin
    val tc = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val te = (tc ++ tc.map(_.swap)).toDF("src", "dst")
    val tv = (1L to 3L).toDF("id")
    val tanf = GraphQueries.neighborhoodFunction(spark, tv, te, maxHops = 2)
    val tr = GraphQueries.effectiveDiameter(tanf, q = 0.9).collect().head
    assert(math.abs(tr.getDouble(2) - 0.85) < 1e-6, s"got ${tr.getDouble(2)}")
    // a target the self-pairs alone satisfy lands exactly on hop 0
    val t0 = GraphQueries.effectiveDiameter(tanf, q = 0.3).collect().head
    assert(t0.getDouble(2) == 0.0, s"got ${t0.getDouble(2)}")
    graft.Caches.clear()
  }

  test("neighborhoodSketches: warm resume after edge additions ≡ cold rebuild (exact estimates)") {
    import org.apache.spark.sql.DataFrame
    def est(st: DataFrame): Map[Long, Double] = st
      .select(col("id"), hll_sketch_estimate(col("sketch")).cast("double"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // old graph: directed path 1→2→3; additions close the loop and add a
    // new vertex: 3→4, 4→1
    val oldE = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val addE = Seq((3L, 4L), (4L, 1L)).toDF("src", "dst")
    val allE = oldE.unionAll(addE)
    val oldV = (1L to 3L).toDF("id")
    val allV = (1L to 4L).toDF("id")
    val prior = GraphQueries.neighborhoodSketches(spark, oldV, oldE, maxHops = 6)
    val cold = est(GraphQueries.neighborhoodSketches(spark, allV, allE, maxHops = 8))
    val warmSeeded = est(GraphQueries.neighborhoodSketches(spark, allV, allE, maxHops = 8,
      initState = Some(prior), newEdges = Some(addE)))
    assert(warmSeeded == cold, s"seeded warm $warmSeeded vs cold $cold")
    // conservative resume (no newEdges hint) reaches the same fixed point
    val warmFull = est(GraphQueries.neighborhoodSketches(spark, allV, allE, maxHops = 8,
      initState = Some(prior)))
    assert(warmFull == cold, s"full-refrontier warm $warmFull vs cold $cold")
    // every vertex reaches all 4 on the cycle (sparse HLL is exact here)
    assert(cold.values.forall(v => math.round(v) == 4L), cold.toString)
    graft.Caches.clear()
  }

  test("anfAutoLgK: budget arithmetic; a budget-capped run still matches exact small balls") {
    import graft.graph.GraphQueries.anfAutoLgK
    // 1M contribution rows against 1 GB: lgK=9 costs (512+64)·1M = 576 MB
    // (fits), lgK=10 costs 1088 MB (does not)
    assert(anfAutoLgK(1000000L, 1L << 30) == 9)
    // generous budget keeps the caller's lgK; absurd row counts floor at 4
    assert(anfAutoLgK(1000L, 1L << 30, lgKMax = 11) == 11)
    assert(anfAutoLgK(Long.MaxValue / 2, 1L << 30) == 4)
    // degenerate edge frame still resolves (rows clamped to 1)
    assert(anfAutoLgK(0L, 1L << 30, lgKMax = 12) == 12)

    // a budget that forces lgK down must not change SMALL-ball estimates:
    // HLL sparse mode is exact below the register threshold at any lgK
    val canon = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val e = (canon ++ canon.map(_.swap)).toDF("src", "dst")
    val v = e.select(col("src").as("id")).distinct()
    def est(budget: Option[Long]) = GraphQueries.neighborhoodFunction(
        spark, v, e, maxHops = 3, lgK = 12, shuffleBudgetBytes = budget)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> math.round(r.getDouble(2))).toMap
    val full = est(None)
    val capped = est(Some(6L * ((1L << 4) + 64L))) // 6 rows ⇒ exactly lgK=4 fits
    assert(capped == full, s"budget-capped $capped vs default $full")
    graft.Caches.clear()
  }

  test("hyperBall adaptive merge: forced narrow anti+inner ≡ forced full-outer ≡ default, per round") {
    import org.apache.spark.sql.DataFrame
    // Long-tail graph: K6 clique (1..6) + directed path 14→15→…→20 with
    // 20→1 bridging into the clique. The clique converges in 2 rounds but
    // the path head keeps gaining reach for ~8 — the narrow-frontier
    // regime the anti+inner branch exists for, which tiny test graphs
    // never reach (they converge before frontier < state/4).
    val clique = for { a <- 1L to 6L; b <- 1L to 6L if a != b } yield (a, b)
    val path = (14L until 20L).map(i => (i, i + 1)) :+ (20L, 1L)
    val e = (clique ++ path).toDF("src", "dst")
    val v = e.select(col("src").as("id"))
      .unionAll(e.select(col("dst").as("id"))).distinct()
    val state0 = v.groupBy(col("id"))
      .agg(hll_sketch_agg(col("id"), lit(12)).as("_sk"))

    def run(narrowDen: Long): (Seq[Map[Long, Double]], Map[Long, Seq[Byte]], Seq[Boolean]) = {
      val (states, fin, log) =
        GraphQueries.hyperBallBranchLog(spark, e, state0, maxHops = 10, narrowDen)
      val perHop = states.map(_.select(col("id"),
          hll_sketch_estimate(col("_sk")).cast("double"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap)
      val bytes = fin.select(col("id"), col("_sk"))
        .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
      (perHop, bytes, log)
    }
    val (hopsNarrow, bytesNarrow, logNarrow) = run(1L)           // narrow from round 2
    val (hopsFull, bytesFull, logFull)       = run(Long.MaxValue) // always full-outer
    val (hopsDef, bytesDef, logDef)          = run(4L)            // the production policy

    assert(logFull.forall(identity), s"forced-full log took a narrow round: $logFull")
    assert(logNarrow.count(!_) >= 3, s"forced-narrow log barely narrowed: $logNarrow")
    // the production threshold must CROSS on this graph — both branches live
    assert(logDef.contains(true) && logDef.contains(false),
      s"default policy never switched branches: $logDef")

    (hopsNarrow lazyZip hopsFull lazyZip hopsDef).zipWithIndex.foreach {
      case ((n, f, d), h) =>
        assert(n == f, s"hop ${h + 1}: narrow $n != full $f")
        assert(d == f, s"hop ${h + 1}: default $d != full $f")
    }
    assert(bytesNarrow == bytesFull && bytesDef == bytesFull,
      "final sketches must be byte-identical across merge branches")
    // sanity: the path head really did keep growing (reaches all 13)
    assert(math.round(hopsFull.last(14L)) == 13L, hopsFull.last.toString)
    graft.Caches.clear()
  }

  test("hll_union with a no-new-data delta is serialization-stable after one settling round") {
    // Pins neighborhoodFunction's change detector against library upgrades:
    // the delta-frontier loop compares serialized sketch bytes, relying on
    // the union with a subset delta being byte-identical once the
    // representation has settled (at most ONE representation-only change —
    // e.g. sparse→dense promotion — may follow the last register change).
    // If this ever fails, stabilized vertices would silently re-ship every
    // round up to maxHops (perf-only, but exactly the cost the frontier
    // exists to avoid).
    val sk = spark.range(0, 1000)
      .agg(hll_sketch_agg(col("id"), lit(12)).as("sk"))
    val delta = spark.range(0, 100) // strict subset: no new registers
      .agg(hll_sketch_agg(col("id"), lit(12)).as("dsk"))
    val r = sk.crossJoin(delta)
      .select(hll_union(col("sk"), col("dsk")).as("u1"), col("dsk"))
      .select(col("u1"), hll_union(col("u1"), col("dsk")).as("u2"))
      .select((col("u1") <=> col("u2")).as("stable"))
      .collect().head
    assert(r.getBoolean(0), "second no-new-data union must serialize byte-identically")
  }

  test("neighborhoodFunction: edge source absent from the vertex set still materializes once reached") {
    // 9 → 1 directed; vertices = {1} only — legacy contract: 9 appears in the
    // state (without its own id in the ball) because it sources an edge.
    val e = Seq((9L, 1L)).toDF("src", "dst")
    val v = Seq(1L).toDF("id")
    val got = GraphQueries.neighborhoodFunction(spark, v, e, maxHops = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> math.round(r.getDouble(2))).toMap
    // vertex 9's ball is {1} (its own id was never seeded) at both hops
    assert(got((9L, 1)) == 1L && got((9L, 2)) == 1L)
    assert(got((1L, 1)) == 1L && got((1L, 2)) == 1L)
    graft.Caches.clear()
  }
}
