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
}
