package graft.shell

import graft.SparkSpec

/** The shell bootstrap must bind a working session from a config file:
  * run a load, read the stores back, serve schema info, and answer SQL
  * through the registered graft functions.
  */
class GraftShellSpec extends SparkSpec {

  test("bootstrap from config file: run, stores, info, sql") {
    import spark.implicits._
    val work = tempDir("graft-shell")
    Seq(
      ("objA", "C*", 2019, 2, 1),
      ("objB", "C*", 2019, 2, 1)
    ).toDF("objectId", "cdsxmatch", "year", "month", "day")
      .write.partitionBy("year", "month", "day").parquet(s"$work/raw")

    val confPath = s"$work/job.conf"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(confPath),
      s"""reader { basePath = "$work/raw" }
         |idManager { spark { dataPath = "$work/ids", reservedIdSpace = 100 } }
         |edgeStore { basePath = "$work/edges" }
         |edgeLoader {
         |  rulesToApply = ["similarityClassifier"]
         |  rules { similarityClassifier { similarityExp = "cdsxmatch" } }
         |}
         |""".stripMargin)

    val g = GraftShell(spark, confPath)
    val r = g.run("2019-02-01")
    assert(r.vertexCount == 2)
    assert(g.vertices.count() == 2)
    assert(g.edgeLabels == List("similarity"))
    assert(g.edges("similarity").count() == 2) // bidirectional pair
    assert(g.info.contains(""""edgeLabels":["similarity"]"""))
    // registered SQL surface works through the shell
    val c = g.sql("SELECT cosine_similarity(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c").head()
    assert(c.getDouble(0) == 1.0)
    // graph exploration helpers: both same-cdsxmatch vertices form one
    // component; each has degree 1 on the bidirectional edge pair
    assert(g.degrees("similarity").collect().map(_.getLong(1)).toSeq == Seq(1L, 1L))
    val comp = g.components("similarity").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.size == 2 && comp.values.toSet.size == 1, s"got $comp")
    // a 2-vertex graph has no triangles; every vertex still reports 0
    val tri = g.triangles("similarity").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tri.size == 2 && tri.values.forall(_ == 0L), s"got $tri")
    // BFS helper: the other vertex sits 1 hop from the seed
    val ids = comp.keySet.toSeq.sorted
    val dist = g.distances("similarity", Seq(ids.head))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(dist == Map(ids.head -> 0, ids(1) -> 1))
    // proximity helper: a probability over the graph, seed outranks peer
    val nearR = g.near("similarity", ids.head, numIter = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(nearR.values.sum - 1.0) < 1e-9 && nearR(ids.head) > nearR(ids(1)))
    // empty-safe before any load
    val g2 = GraftShell.bind(spark, graft.config.ConfigLoader.load(confPath)
      .copy(idManager = graft.ids.IdManagerConfig(s"$work/none", "vertices")))
    assert(g2.vertices.isEmpty)
  }

  test("long-session guard: run() and release() leave no persisted state behind") {
    import spark.implicits._
    val work = tempDir("graft-shell-hygiene")
    Seq(("objA", "C*", 2019, 2, 1), ("objB", "C*", 2019, 2, 1))
      .toDF("objectId", "cdsxmatch", "year", "month", "day")
      .write.partitionBy("year", "month", "day").parquet(s"$work/raw")
    val confPath = s"$work/job.conf"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(confPath),
      s"""reader { basePath = "$work/raw" }
         |idManager { spark { dataPath = "$work/ids", reservedIdSpace = 100 } }
         |edgeStore { basePath = "$work/edges" }
         |edgeLoader {
         |  rulesToApply = ["similarityClassifier"]
         |  rules { similarityClassifier { similarityExp = "cdsxmatch" } }
         |}
         |""".stripMargin)
    graft.Caches.clear()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val g = GraftShell(spark, confPath)
    // run() clears in its own epilogue — nothing new may survive it
    g.run("2019-02-01")
    val afterRun = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(afterRun.isEmpty, s"run() left persisted RDDs: $afterRun")
    // exploration helpers pin loop checkpoints until release()
    assert(g.components("similarity").count() == 2)
    assert(g.pageRank("similarity", numIter = 4).count() == 2)
    // the decomposition helpers: a single edge is a 2-clique — both
    // vertices core 1, the edge survives only the trivial 2-truss
    assert(g.cores("similarity").collect().map(_.getLong(1)).toSet == Set(1L))
    assert(g.truss("similarity", k = 2).count() == 1)
    assert(g.truss("similarity", k = 3).count() == 0)
    g.release()
    val afterExplore = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(afterExplore.isEmpty, s"release() left persisted RDDs: $afterExplore")
  }
}
