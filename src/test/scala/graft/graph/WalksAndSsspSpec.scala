package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WalksAndSsspSpec extends SparkSpec {

  private def md5h(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  /** Reference walker replicating the op's choice rule exactly. */
  private def bruteWalks(edges: Seq[(Long, Long)], starts: Seq[Long], numWalks: Int,
      walkLength: Int, seed: Int): Set[(Long, Int, Long)] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val adj = und.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
      .map { case (v, es) => v -> es.map(_._2).sorted }
    val out = scala.collection.mutable.Set[(Long, Int, Long)]()
    for (s0 <- starts.distinct; w <- 0 until numWalks) {
      val id = s0 * numWalks + w
      var v = s0
      out += ((id, 0, v))
      var t = 0
      var dead = !adj.contains(v)
      while (t < walkLength && !dead) {
        val ns = adj(v)
        v = ns((md5h(s"$seed:$id:$t") % ns.length).toInt)
        t += 1
        out += ((id, t, v))
        dead = !adj.contains(v)
      }
    }
    out.toSet
  }

  private def runWalks(edges: Seq[(Long, Long)], starts: Seq[Long], numWalks: Int = 2,
      walkLength: Int = 4, repartition: Option[Int] = None): Set[(Long, Int, Long)] = {
    import spark.implicits._
    val e0 = edges.toDF("src", "dst")
    val e = repartition.map(e0.repartition(_)).getOrElse(e0)
    GraphQueries.randomWalks(spark, e, starts, numWalks = numWalks,
        walkLength = walkLength, seed = 42, hash = graft.ops.Md5Hash)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
  }

  private val walkGraph = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L), (4L, 5L), (5L, 6L),
    (2L, 1L), (3L, 3L)) // duplicate reversed edge + self-loop must not change choices

  test("randomWalks: replays the reference walker exactly (md5 choice rule)") {
    val got = runWalks(walkGraph, Seq(1L, 4L))
    assert(got == bruteWalks(walkGraph, Seq(1L, 4L), 2, 4, 42))
    // every walk emits the full position count (no dead ends in this graph)
    assert(got.size == 2 * 2 * 5)
  }

  test("randomWalks: partition-invariant; consecutive positions are graph edges") {
    val a = runWalks(walkGraph, Seq(1L, 2L, 5L))
    assert(a == runWalks(walkGraph, Seq(1L, 2L, 5L), repartition = Some(7)))
    val und = walkGraph.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, e.swap)).toSet
    val byWalk = a.groupBy(_._1)
    byWalk.values.foreach { ps =>
      val path = ps.toSeq.sortBy(_._2).map(_._3)
      path.sliding(2).foreach {
        case Seq(u, v) => assert(und.contains((u, v)), s"($u,$v) not an edge")
        case _         =>
      }
    }
  }

  test("randomWalks: isolated start emits only step 0; walk ids injective") {
    val got = runWalks(Seq((1L, 2L)), Seq(1L, 99L), numWalks = 3, walkLength = 5)
    val byWalk = got.groupBy(_._1)
    // 2 starts × 3 walks
    assert(byWalk.size == 6)
    (0 until 3).foreach { w =>
      assert(byWalk(99L * 3 + w) == Set((99L * 3 + w, 0, 99L)))
      assert(byWalk(1L * 3 + w).size == 6)
    }
  }

  /** Reference weighted walker: cumulative-range choice over id-sorted
    * neighbors with parallel edges summed.
    */
  private def bruteWeightedWalks(edges: Seq[(Long, Long, Long)], starts: Seq[Long],
      numWalks: Int, walkLength: Int, seed: Int): Set[(Long, Int, Long)] = {
    val sym = edges.filter(e => e._1 != e._2)
      .flatMap(e => Seq((e._1, e._2, e._3), (e._2, e._1, e._3)))
    val adj = sym.groupBy(e => (e._1, e._2)).map { case (k, es) => k -> es.map(_._3).sum }
      .toSeq.map { case ((s0, d), w) => (s0, d, w) }
      .groupBy(_._1).map { case (v, es) => v -> es.map(e => (e._2, e._3)).sortBy(_._1) }
    val out = scala.collection.mutable.Set[(Long, Int, Long)]()
    for (s0 <- starts.distinct; wk <- 0 until numWalks) {
      val id = s0 * numWalks + wk
      var v = s0
      out += ((id, 0, v))
      var t = 0
      while (t < walkLength && adj.contains(v)) {
        val ns = adj(v)
        val total = ns.map(_._2).sum
        val r = md5h(s"$seed:$id:$t") % total
        var cum = 0L
        var next = ns.head._1
        var found = false
        ns.foreach { case (d, w) =>
          if (!found && r >= cum && r < cum + w) { next = d; found = true }
          cum += w
        }
        v = next
        t += 1
        out += ((id, t, v))
      }
    }
    out.toSet
  }

  test("randomWalks weighted: replays the cumulative-range reference; biases toward heavy edges") {
    import spark.implicits._
    val e = Seq(
      (1L, 2L, 1L), (1L, 3L, 8L), (1L, 2L, 1L), // parallel 1-2 sums to 2
      (2L, 3L, 3L), (3L, 4L, 2L), (4L, 5L, 1L))
    val got = GraphQueries.randomWalks(spark, e.toDF("src", "dst", "weight"),
        Seq(1L, 3L), numWalks = 3, walkLength = 4, seed = 9,
        hash = graft.ops.Md5Hash, weightCol = Some("weight"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == bruteWeightedWalks(e, Seq(1L, 3L), 3, 4, 9))
    assert(got.size == 2 * 3 * 5) // no dead ends
  }

  test("randomWalks weighted: w ≡ 1 on distinct edges equals the unweighted path") {
    import spark.implicits._
    val und = walkGraph.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val weighted = GraphQueries.randomWalks(spark,
        und.map(e => (e._1, e._2, 1L)).toDF("src", "dst", "weight"),
        Seq(1L, 4L), numWalks = 2, walkLength = 4, seed = 42,
        hash = graft.ops.Md5Hash, weightCol = Some("weight"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(weighted == runWalks(walkGraph, Seq(1L, 4L)))
  }

  test("randomWalks weighted: non-positive weights rejected") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      GraphQueries.randomWalks(spark, Seq((1L, 2L, 0L)).toDF("src", "dst", "weight"),
        Seq(1L), weightCol = Some("weight"))
    }
  }

  /** Reference Dijkstra under a cost cap. */
  private def bruteSssp(edges: Seq[(Long, Long, Long)], sources: Seq[Long],
      maxCost: Long): Map[Long, Long] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => ((math.min(e._1, e._2), math.max(e._1, e._2)), e._3))
      .groupBy(_._1).map { case (k, ws) => k -> ws.map(_._2).min }
    val adj = und.toSeq.flatMap { case ((a, b), w) => Seq((a, b, w), (b, a, w)) }
      .groupBy(_._1).map { case (v, es) => v -> es.map(e => (e._2, e._3)) }
    val dist = scala.collection.mutable.Map(sources.distinct.map(_ -> 0L): _*)
    val pq = scala.collection.mutable.PriorityQueue(
      sources.distinct.map(s => (-0L, s)): _*)(Ordering.by(_._1))
    while (pq.nonEmpty) {
      val (negC, v) = pq.dequeue()
      val c = -negC
      if (dist(v) == c) {
        adj.getOrElse(v, Nil).foreach { case (u, w) =>
          val nc = c + w
          if (nc <= maxCost && dist.get(u).forall(_ > nc)) {
            dist(u) = nc
            pq.enqueue((-nc, u))
          }
        }
      }
    }
    dist.toMap
  }

  private def runSssp(edges: Seq[(Long, Long, Long)], sources: Seq[Long],
      maxCost: Long): Map[Long, Long] = {
    import spark.implicits._
    GraphQueries.weightedDistances(spark, edges.toDF("src", "dst", "weight"),
        sources, maxCost = maxCost)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("weightedDistances: hand graph — min-cost paths, parallel edges collapse to min") {
    // 1 -5- 2 -1- 3, plus shortcut 1 -2- 3 and a worse parallel 1 -9- 2
    val e = Seq((1L, 2L, 5L), (1L, 2L, 9L), (2L, 3L, 1L), (1L, 3L, 2L), (3L, 4L, 10L))
    val got = runSssp(e, Seq(1L), maxCost = 20L)
    // 3 via shortcut (2), 2 via 3 (2+1=3 beats direct 5), 4 = 2+10
    assert(got == Map(1L -> 0L, 2L -> 3L, 3L -> 2L, 4L -> 12L))
  }

  test("weightedDistances: cost cap prunes; unit weights reduce to BFS; isolated source is 0") {
    val e = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L), (4L, 5L, 1L))
    val capped = runSssp(e, Seq(1L, 77L), maxCost = 2L)
    assert(capped == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 77L -> 0L))
    import spark.implicits._
    val bfs = GraphQueries.shortestPaths(spark,
        e.map(x => (x._1, x._2)).toDF("src", "dst"), Seq(1L), maxDist = 10)
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(runSssp(e, Seq(1L), maxCost = 100L) == bfs)
  }

  test("weightedDistances: random graph agrees with Dijkstra under the cap") {
    val rnd = new scala.util.Random(7)
    val e = Seq.fill(120)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong,
      (rnd.nextInt(4) + 1).toLong))
    val got = runSssp(e, Seq(0L, 1L), maxCost = 6L)
    assert(got == bruteSssp(e, Seq(0L, 1L), 6L))
    assert(got.nonEmpty)
  }

  test("weightedDistances: negative weights rejected") {
    intercept[IllegalArgumentException] {
      runSssp(Seq((1L, 2L, -1L)), Seq(1L), maxCost = 5L)
    }
  }
}
