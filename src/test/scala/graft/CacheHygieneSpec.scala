package graft

import org.apache.spark.sql.functions._

import graft.graph.GraphQueries

/** Session cache hygiene: every iterative / GraphX op must leave NOTHING in
  * the block manager once its result is consumed and `Caches.clear()` runs —
  * the long-lived-session (GraftShell) contract. Loop checkpoints
  * (`localCheckpoint` pins its final frame) and GraphX's internally-cached
  * graph RDDs are the two leak classes; both are caught by the
  * `getPersistentRDDs` delta that [[Caches.trackNewRdds]] registers.
  */
class CacheHygieneSpec extends SparkSpec {

  private def edges = {
    import spark.implicits._
    // two triangles bridged by an edge + a pendant — enough structure for
    // every op to iterate at least once
    Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L), (6L, 7L))
      .toDF("src", "dst")
  }
  private def vertices = {
    import spark.implicits._
    (1L to 7L).toDF("id")
  }

  private def assertNoResidue(label: String)(run: => Unit): Unit = {
    Caches.clear() // isolate from whatever earlier suites left behind
    val before = spark.sparkContext.getPersistentRDDs.keySet
    run // must CONSUME its result (checkpointed frames don't recompute)
    Caches.clear()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"$label left ${leaked.size} persisted RDD(s) after Caches.clear(): $leaked")
  }

  test("pageRankDF releases its final checkpoint after clear()") {
    assertNoResidue("pageRankDF") {
      assert(GraphQueries.pageRankDF(spark, vertices, edges, numIter = 6).count() == 7)
    }
  }

  test("componentLabels releases its final checkpoint after clear() (both endgames)") {
    assertNoResidue("componentLabels(localFinish)") {
      assert(GraphQueries.componentLabels(spark, edges).count() == 7)
    }
    assertNoResidue("componentLabels(pure loop)") {
      assert(GraphQueries.componentLabels(spark, edges, localFinishEdges = 0L).count() == 7)
    }
  }

  test("kCore and labelPropagation release their checkpoints after clear()") {
    assertNoResidue("kCore") {
      assert(GraphQueries.kCore(spark, edges, k = 2, maxIter = 20).count() == 6)
    }
    assertNoResidue("labelPropagation") {
      assert(GraphQueries.labelPropagation(spark, edges, numIter = 5).count() == 7)
    }
  }

  test("shortestPaths, landmarkDistances and personalized pageRankDF release checkpoints after clear()") {
    assertNoResidue("shortestPaths") {
      assert(GraphQueries.shortestPaths(spark, edges, Seq(1L)).count() == 7)
    }
    assertNoResidue("landmarkDistances") {
      assert(GraphQueries.landmarkDistances(spark, edges, Seq(1L, 7L)).count() == 14)
    }
    assertNoResidue("pageRankDF(personalized)") {
      assert(GraphQueries.pageRankDF(spark, vertices, edges, numIter = 6,
        personalized = Some(1L)).count() == 7)
    }
    assertNoResidue("relaxDistances") {
      import spark.implicits._
      assert(GraphQueries.relaxDistances(spark, edges,
        Seq((1L, 0)).toDF("id", "dist")).count() == 7)
    }
  }

  test("GraphX ops (pageRank, connectedComponents, triangleCounts) release graph caches") {
    assertNoResidue("pageRank(GraphX)") {
      assert(GraphQueries.pageRank(spark, vertices, edges, numIter = 5).count() == 7)
    }
    assertNoResidue("connectedComponents(GraphX)") {
      assert(GraphQueries.connectedComponents(spark, vertices, edges).count() == 7)
    }
    assertNoResidue("triangleCounts(GraphX)") {
      assert(GraphQueries.triangleCounts(spark, vertices, edges).count() == 7)
    }
    assertNoResidue("triangleCountsDF") {
      assert(GraphQueries.triangleCountsDF(spark, vertices, edges).count() == 7)
    }
  }

  test("results stay usable BEFORE clear(); tracked frames recompute after") {
    Caches.clear()
    val pr = GraphQueries.pageRankDF(spark, vertices, edges, numIter = 4)
    val first = pr.orderBy("id").collect()
    // consuming twice pre-clear is fine (the checkpoint serves both reads)
    assert(pr.orderBy("id").collect().sameElements(first))
    Caches.clear()
    // plan-level tracked frames (triangleCountsDF persists, no checkpoint)
    // recompute from lineage even after clear
    val tc = GraphQueries.triangleCountsDF(spark, vertices, edges)
    val a = tc.orderBy("id").collect()
    Caches.clear()
    assert(tc.orderBy("id").collect().sameElements(a))
  }
}
