package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KCoreSpec extends SparkSpec {

  /** Reference peeling: repeatedly drop vertices of degree < k. */
  private def brute(edges: Set[(Long, Long)], k: Int): Map[Long, Int] = {
    var adj = edges.flatMap(e => Seq(e, e.swap)).filter(e => e._1 != e._2)
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
    var changed = true
    while (changed) {
      val drop = adj.collect { case (v, ns) if ns.size < k => v }.toSet
      changed = drop.nonEmpty
      adj = (adj -- drop).map { case (v, ns) => v -> (ns -- drop) }
        .filter(_._2.nonEmpty)
    }
    adj.map { case (v, ns) => v -> ns.size }
  }

  private def run(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    import spark.implicits._
    GraphQueries.kCore(spark, edges.toDF("src", "dst"), k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("kCore peels a pendant chain off a triangle; clique cores survive whole") {
    // triangle 1-2-3 with a tail 3-4-5: 2-core = the triangle only
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    assert(run(edges, 2) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // k=1: every non-isolated vertex
    assert(run(edges, 1).keySet == Set(1L, 2L, 3L, 4L, 5L))
    // k=3: a triangle is only a 2-core — empty
    assert(run(edges, 3).isEmpty)
  }

  test("kCore requires CASCADING removal, not one degree pass") {
    // path 1-2-3-4: every inner vertex has degree 2, but the 2-core is
    // empty — ends peel first, then the middle unravels
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    assert(run(path, 2).isEmpty)
  }

  test("kCore ≡ brute-force peeling on a pseudorandom graph, one-way vs bidirectional input") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val edges = (1 to 300).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)).distinct
    for (k <- Seq(2, 3, 5)) {
      val expect = brute(edges.toSet, k).map { case (v, d) => v -> d.toLong }
      assert(run(edges, k) == expect, s"k=$k")
      // bidirectional + duplicated edge table gives the identical answer
      val bidir = edges ++ edges.map(_.swap) ++ edges.take(50)
      assert(run(bidir, k) == expect, s"k=$k bidir")
    }
  }

  test("nested warm start: deepening k inside a previous core ≡ cold, on a fraction of the graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    // dense kernel (8-clique → guaranteed 4-core) + sparse periphery over
    // 120 vertices (pendants exist → core_2 is a proper subset)
    val clique = (for (a <- 0 until 8; b <- a + 1 until 8) yield (a.toLong, b.toLong)).toSeq
    val edges = (clique ++
      (1 to 150).map(_ => (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))).distinct
    val df = edges.toDF("src", "dst")
    // warm: core_4 computed WITHIN core_2 — sound because core_4 ⊆ core_2
    val core2 = GraphQueries.kCore(spark, df, k = 2)
    val warm = GraphQueries.kCore(spark, df, k = 4, within = Some(core2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cold = run(edges, 4)
    assert(warm == cold, "nested peeling must equal the cold computation")
    assert(cold.nonEmpty, "fixture must have a non-trivial 4-core")
    // the restriction actually shrinks the problem: core_2 is a proper
    // subset of the vertex set on this fixture
    val allVertices = edges.flatMap(e => Seq(e._1, e._2)).distinct.size
    assert(core2.count() < allVertices, "fixture too dense to show the restriction")
    graft.Caches.clear()
  }
}
