package graft.examples

import org.apache.spark.sql.SparkSession

import graft.io._
import graft.ids._
import graft.rules._
import graft.graph._

/** End-to-end example of the full load-job pipeline on synthetic data:
  * partition-pruned read → derive → dense-id assignment → the three edge
  * rules → edge store roundtrip → delete mode. Runnable smoke/demo:
  * `sbt "runMain graft.examples.E2EDemo"`.
  */
object E2EDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val work = java.nio.file.Files.createTempDirectory("graft-e2e").toString
    val alerts = Seq(
      ("objA", 0.95, 0.95, 2, 0.05f, "C*", "ML", "ML", 2019, 2, 1),
      ("objB", 0.2, 0.2, 0, 0.95f, "Unknown", null, null, 2019, 2, 1),
      ("objA", 0.99, 0.99, 3, 0.04f, "C*", "ML", "ML", 2019, 2, 2),
      ("objC", 0.1, 0.1, 0, 0.96f, "AGN", null, null, 2019, 2, 2)
    ).toDF("objectId", "rfscore", "snn_snia_vs_nonia", "roid", "classtar",
      "cdsxmatch", "mulens_class_1", "mulens_class_2", "year", "month", "day")
    alerts.write.partitionBy("year", "month", "day").parquet(s"$work/raw")

    val reader = new PartitionedReader(spark, ReaderConfig(s"$work/raw",
      newCols = List("rowkey" -> "objectId || '_' || rfscore")))
    val day1 = reader.readAndProcess(PartitionManager.forRange("2019-02-01", 1, padded = false))
    println(s"day1 rows=${day1.count()} cols=${day1.columns.mkString(",")}")

    val idm = new IdManager(spark, IdManagerConfig(s"$work/ids", "vertices", reservedIdSpace = 100))
    val v1 = idm.process(day1)
    println("day1 ids: " + v1.current.select("id", "objectId").collect().mkString(" "))

    val day2 = reader.readAndProcess(PartitionManager.forRange("2019-02-02", 1, padded = false))
    val v2 = idm.process(day2)
    println("day2 ids: " + v2.current.select("id", "objectId").collect().mkString(" "))

    val sim = new SimilarityClassifier(SimilarityConfig("objectId OR rfscore OR classtar OR cdsxmatch OR roid"))
    val simEdges = sim.classify(v2.loaded, v2.current)
    println("similarity edges: " + simEdges.collect().mkString(" "))

    val sv = new SameValueClassifier(SameValueSimilarityConfig(List("cdsxmatch")))
    println("samevalue edges: " + sv.classify(v2.loaded, v2.current).collect().mkString(" "))

    val fixed = List(
      FixedVertex(1L, "similarity", List(FixedVertexProperty("recipe", "string", "microlensing"))),
      FixedVertex(2L, "similarity", List(FixedVertexProperty("recipe", "string", "asteroids"))),
      FixedVertex(3L, "similarity", List(FixedVertexProperty("recipe", "string", "catalog"),
        FixedVertexProperty("equals", "string", "AGN"))))
    val tm = new TwoModeClassifier(TwoModeSimilarityConfig(List("microlensing", "asteroids", "catalog")), fixed)
    println("twomode edges: " + tm.classify(v2.loaded, v2.current).collect().mkString(" "))

    val store = new EdgeStore(spark, s"$work/edges")
    store.write(simEdges, "similarity", bidirectional = true)
    println("stored edges: " + store.read("similarity").collect().mkString(" "))
    println("parallelism(300000)=" + store.getParallelism(300000))

    idm.deletePartitions(Seq((2019, 2, 2)))
    val remaining = idm.readAll(day1.schema)
    println(s"after delete: rows=${remaining.count()} maxId=${idm.fetchId(remaining)}")

    val planStr = sim.classify(v2.loaded, v2.current).queryExecution.executedPlan.toString
    val strategies = Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
      "BroadcastNestedLoopJoin", "CartesianProduct").filter(planStr.contains)
    // hash joins carry the equality disjuncts; BNL remains only for the
    // pure-range ones (score thresholds), on filter-pruned inputs
    println("similarity join strategies: " + strategies.mkString(", "))
    println("E2E-DONE")
    spark.stop()
  }
}
