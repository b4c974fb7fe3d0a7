package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SccSpec extends SparkSpec {

  private def df(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    edges.toDF("src", "dst")
  }

  private def runDF(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val m = GraphQueries.sccDF(spark, df(edges))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.Caches.clear()
    m
  }

  /** Brute-force SCC by transitive closure over a tiny edge set. */
  private def brute(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    var reach = edges.toSet
    var grew = true
    while (grew) {
      val next = reach ++ (for {
        (a, b) <- reach; (c, d) <- reach if b == c
      } yield (a, d))
      grew = next.size > reach.size
      reach = next
    }
    verts.map { v =>
      val mutual = verts.filter(u =>
        u == v || (reach((v, u)) && reach((u, v))))
      v -> mutual.min
    }.toMap
  }

  test("sccDF: cycles collapse, chains and sources stay singletons, self-loops singleton") {
    // cycle {1,2,3}; cycle {4,5}; chain 3→4 between them; source 7→1;
    // vertex 6 only a self-loop
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),
      (4L, 5L), (5L, 4L),
      (3L, 4L), (7L, 1L), (6L, 6L))
    val got = runDF(edges)
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L,
      6L -> 6L, 7L -> 7L))
  }

  test("sccDF ≡ GraphX StronglyConnectedComponents on random digraphs") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val n = 12 + trial * 4
      val edges = Seq.fill(n * 2)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2).distinct
      val dfScc = runDF(edges)
      val gx = GraphQueries.scc(spark, df(edges), numIter = 40)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      graft.Caches.clear()
      assert(dfScc == gx, s"trial $trial: DF $dfScc vs GraphX $gx (edges $edges)")
      assert(dfScc == brute(edges), s"trial $trial vs brute")
    }
  }

  test("sccDF: a long cycle (deep propagation) closes as one component") {
    val n = 30L
    val edges = (1L until n).map(i => (i, i + 1)) :+ ((n, 1L))
    val got = runDF(edges)
    assert(got.values.toSet == Set(1L) && got.size == n.toInt)
  }
}
