package graft.graph

import graft.SparkSpec

class LabelPropagationSpec extends SparkSpec {

  /** Local replica of the operator's contract: sync rounds, each vertex
    * adopts the most frequent label among neighbors + self, min on ties.
    */
  private def brute(edges: Set[(Long, Long)], numIter: Int): Map[Long, Long] = {
    val adj = edges.flatMap(e => Seq(e, e.swap)).filter(e => e._1 != e._2)
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
    var labels = adj.keys.map(v => v -> v).toMap
    for (_ <- 1 to numIter) {
      labels = adj.map { case (v, ns) =>
        val votes = (ns.toSeq.map(labels) :+ labels(v)).groupBy(identity)
          .toSeq.map { case (l, vs) => (vs.size, l) }
        val best = votes.sortBy { case (c, l) => (-c, l) }.head._2
        v -> best
      }
    }
    labels
  }

  private def run(edges: Seq[(Long, Long)], numIter: Int): Map[Long, Long] = {
    import spark.implicits._
    GraphQueries.labelPropagation(spark, edges.toDF("src", "dst"), numIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("cliques settle on their minimum id in one round; 2-cliques do not oscillate") {
    // two cliques {1,2,3}, {10,11} plus a self-loop (dropped)
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (5L, 5L))
    val got1 = run(e, 1)
    assert(got1 == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    // stable: more rounds change nothing (the 2-clique would swap forever
    // under pure neighbor voting)
    assert(run(e, 4) == got1)
  }

  test("labels flow along a path toward the minimum") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val got = run(path, 8)
    assert(got == brute(path.toSet, 8))
    assert(got.values.toSet == Set(1L))
  }

  test("matches the local replica on a pseudorandom graph; orientation-insensitive") {
    val rnd = new scala.util.Random(7)
    val edges = (1 to 60).map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter(e => e._1 != e._2)
    val expect = brute(edges.toSet, 4)
    assert(run(edges, 4) == expect)
    // flipping every edge must not change anything (undirected reading)
    assert(run(edges.map(_.swap), 4) == expect)
  }

  test("warm start: a grown graph resumes from the settled labeling in 1 round") {
    import spark.implicits._
    // two cliques, settled in one cold round
    val base = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L), (10L, 12L))
    val settled = GraphQueries.labelPropagation(spark, base.toDF("src", "dst"), numIter = 3)
    // grow: vertex 20 attaches to the {10,11,12} clique twice (two votes
    // beat its self-vote in one round); vanished-vertex seed rows and
    // brand-new vertices are both exercised
    val grown = base ++ Seq((20L, 10L), (20L, 11L))
    val warm = GraphQueries.labelPropagation(spark, grown.toDF("src", "dst"),
        numIter = 1, initLabels = Some(settled))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cold = run(grown, 5)
    assert(warm == cold, s"warm(1) must equal cold(5) on the settled-plus-growth fixture")
    assert(warm(20L) == 10L, s"new vertex must adopt its neighborhood's label: $warm")
    // a seed containing a vertex no longer in the graph is simply ignored
    val shrunk = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val warmShrunk = GraphQueries.labelPropagation(spark, shrunk.toDF("src", "dst"),
        numIter = 1, initLabels = Some(settled))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(warmShrunk == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    graft.Caches.clear()
  }
}
