package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClustersSpec extends SparkSpec {

  test("clusters: components, min-id representative, singleton backfill") {
    import spark.implicits._
    // {1,2,5} via 1-2-5 chain, {7,8}, 9 untouched
    val pairs = Seq((1L, 2L), (2L, 5L), (7L, 8L)).toDF("id_a", "id_b")
    val docs  = Seq(1L, 2L, 5L, 7L, 8L, 9L).toDF("doc_id")
    val out = Dedup.clusters(spark, pairs, Some(docs)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(out == Set(
      (1L, 1L, true), (2L, 1L, false), (5L, 1L, false),
      (7L, 7L, true), (8L, 7L, false), (9L, 9L, true)), s"got $out")
  }

  test("clusters without a universe covers only pair participants") {
    import spark.implicits._
    val pairs = Seq((3L, 4L)).toDF("id_a", "id_b")
    val out = Dedup.clusters(spark, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(out == Set((3L, 3L, true), (4L, 3L, false)), s"got $out")
  }

  test("clustersBy keeps the highest-scoring doc per cluster, ties by smallest id") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (7L, 8L)).toDF("id_a", "id_b")
    val docs = Seq(
      (1L, 10L), (2L, 99L),      // cluster {1,2}: 2 has the higher score
      (7L, 50L), (8L, 50L),      // cluster {7,8}: tied → smaller id 7 wins
      (9L, 1L)                   // singleton keeps itself
    ).toDF("doc_id", "quality")
    val out = Dedup.clustersBy(spark, pairs, docs, score = col("quality"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(out == Set(
      (1L, 1L, false), (2L, 1L, true),
      (7L, 7L, true), (8L, 7L, false),
      (9L, 9L, true)), s"got $out")
  }

  test("clusters runs the DataFrame CC loop — no GraphX stage in its execution") {
    import spark.implicits._
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageSubmitted}
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new SparkListener {
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit = {
        stages.add(s.stageInfo.details)
        s.stageInfo.rddInfos.foreach(r => stages.add(r.name + " " + r.scope.fold("")(_.name)))
      }
    }
    val pairs = Seq((1L, 2L), (2L, 5L), (7L, 8L), (10L, 11L)).toDF("id_a", "id_b")
    val docs  = (1L to 12L).toDF("doc_id")
    spark.sparkContext.addSparkListener(listener)
    try {
      Dedup.clusters(spark, pairs, Some(docs)).collect()
      org.apache.spark.graft.TestSparkInternals.flushListenerBus(spark.sparkContext)
    } finally spark.sparkContext.removeSparkListener(listener)
    val graphx = stages.toArray(Array.empty[String]).filter(_.toLowerCase.contains("graphx"))
    assert(graphx.isEmpty, s"GraphX stages leaked into Dedup.clusters: ${graphx.take(2).mkString(" | ")}")
    assert(!stages.isEmpty, "listener captured no stages — assertion would be vacuous")
  }

  test("incrementalClusters ≡ full recompute across batches, including cluster-merging batches") {
    import spark.implicits._
    // batch 1: {1,2,5} and {7,8}; batch 2 BRIDGES them (5-7), adds {10,11},
    // and extends {1,2,5} with 12; batch 3 adds a doc (0) SMALLER than every
    // historical cluster min (relabels the merged cluster to 0)
    val b1 = Seq((1L, 2L), (2L, 5L), (7L, 8L)).toDF("id_a", "id_b")
    val b2 = Seq((5L, 7L), (10L, 11L), (12L, 2L)).toDF("id_a", "id_b")
    val b3 = Seq((0L, 8L)).toDF("id_a", "id_b")

    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet

    val labels1 = Dedup.clusters(spark, b1)
    val inc2    = Dedup.incrementalClusters(spark, labels1.select("doc_id", "cluster_id"), b2)
    val full2   = Dedup.clusters(spark, b1.union(b2))
    assert(asSet(inc2) == asSet(full2), s"batch-2 merge diverged: ${asSet(inc2)}")

    val inc3  = Dedup.incrementalClusters(spark, inc2.select("doc_id", "cluster_id"), b3)
    val full3 = Dedup.clusters(spark, b1.union(b2).union(b3))
    assert(asSet(inc3) == asSet(full3), s"batch-3 min-relabel diverged: ${asSet(inc3)}")
    // the bridged cluster's min dropped to the new doc 0
    assert(asSet(inc3).contains((8L, 0L, false)) && asSet(inc3).contains((0L, 0L, true)))

    // total verdict over a docs universe matches clusters' universe form
    val docs = (0L to 13L).toDF("doc_id")
    val incU  = Dedup.incrementalClusters(
      spark, inc2.select("doc_id", "cluster_id"), b3, docs = Some(docs))
    val fullU = Dedup.clusters(spark, b1.union(b2).union(b3), Some(docs))
    assert(asSet(incU) == asSet(fullU))
    assert(asSet(incU).contains((13L, 13L, true))) // untouched doc = singleton
  }

  test("applyKeepPolicy over incremental labels ≡ clustersBy over the full pair history") {
    import spark.implicits._
    val b1 = Seq((1L, 2L), (7L, 8L)).toDF("id_a", "id_b")
    val b2 = Seq((2L, 7L)).toDF("id_a", "id_b") // merges {1,2} and {7,8}
    val docs = Seq(
      (1L, 10L), (2L, 99L), (7L, 50L), (8L, 70L), (9L, 1L)
    ).toDF("doc_id", "quality")

    val incLabels = Dedup.incrementalClusters(
      spark, Dedup.clusters(spark, b1).select("doc_id", "cluster_id"), b2)
      .select("doc_id", "cluster_id")
    val viaIncremental = Dedup.applyKeepPolicy(incLabels, docs, score = col("quality"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val viaFull = Dedup.clustersBy(spark, b1.union(b2), docs, score = col("quality"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(viaIncremental == viaFull, s"inc=$viaIncremental full=$viaFull")
    // merged cluster {1,2,7,8}: 2 has the top score; singleton 9 keeps itself
    assert(viaIncremental.contains((2L, 1L, true)) && viaIncremental.contains((9L, 9L, true)))
  }

  test("dropping keep=false rows leaves a corpus with no remaining near-dup pairs") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"),
      (1L, "the quick brown fox jumps over the lazy dog again and AGAIN"),
      (2L, "the quick brown fox jumps over the lazy dog again and again!"),
      (3L, "pack my box with five dozen liquor jugs before the party"),
      (4L, "pack my box with five dozen liquor jugs before the PARTY"),
      (5L, "completely unrelated content that matches nothing else here")
    ).toDF("doc_id", "text")
    val pairs   = Dedup.prefixJaccardPairs(docs, threshold = 0.5)
    val verdict = Dedup.clusters(spark, pairs, Some(docs.select("doc_id")))
    val kept = docs.join(verdict.where(col("keep")).select("doc_id"), Seq("doc_id"))
    // one representative per cluster: re-running dedup on the kept corpus
    // finds nothing
    assert(Dedup.prefixJaccardPairs(kept, threshold = 0.5).count() == 0)
    assert(kept.count() == 3) // {0,1,2} -> 0, {3,4} -> 3, {5} -> 5
  }

  test("goldenRecords: per-cluster mode/max/min elections with deterministic ties") {
    import spark.implicits._
    val labeled = Seq(
      // cluster 1: lang majority en, source tie (s1 vs s2) → greatest s2
      (1L, "en", "s1", 100L, 11L),
      (1L, "en", "s2", 300L, 12L),
      (1L, "de", "s2", 200L, 13L),
      (1L, "de", "s1", 250L, 14L),
      (1L, "en", "s1", 120L, 15L),
      (1L, "fr", "s2", 90L, 16L),
      // cluster 2: singleton
      (2L, "zh", "s9", 42L, 20L)
    ).toDF("cluster_id", "lang", "source", "n_chars", "doc_id")
    val got = Dedup.goldenRecords(labeled, "cluster_id",
        modeCols = Seq("lang", "source"), maxCols = Seq("n_chars"), minCols = Seq("doc_id"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))))
      .toMap
    assert(got(1L) == ((6L, 300L, 11L, "en", "s2")))
    assert(got(2L) == ((1L, 42L, 20L, "zh", "s9")))
  }

  test("lshOperatingCurve: closed form, monotone in j, b=1 and r=1 edges") {
    val got = Dedup.lshOperatingCurve(16, probes = Seq(0.5, 0.9))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)) -> r.getDouble(3))
      .toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // b=1, r=16: p = j^16
    assert(got((1L, 16L, 0.5)) == r6(math.pow(0.5, 16)))
    // b=16, r=1: p = 1 − (1−j)^16
    assert(got((16L, 1L, 0.9)) == r6(1.0 - math.pow(1.0 - 0.9, 16)))
    // the production q18 split (4 bands × 4 rows) at j=0.9
    assert(got((4L, 4L, 0.9)) == r6(1.0 - math.pow(1.0 - math.pow(0.9, 4), 4)))
    // monotone: higher j never lowers p for a fixed split
    assert(got((4L, 4L, 0.9)) >= got((4L, 4L, 0.5)))
  }

  test("golden partials: merge of any batch split ≡ one-shot goldenRecords") {
    import spark.implicits._
    val labeled = (1 to 60).map { i =>
      ((i % 5).toLong, s"l${i % 3}", s"s${i % 4}", (i * 7 % 100).toLong, i.toLong)
    }.toDF("cluster_id", "lang", "source", "n_chars", "doc_id")
    val whole = Dedup.goldenRecords(labeled, "cluster_id",
      modeCols = Seq("lang", "source"), maxCols = Seq("n_chars"), minCols = Seq("doc_id"))
    def part(f: org.apache.spark.sql.DataFrame) =
      Dedup.goldenPartials(f, "cluster_id",
        modeCols = Seq("lang", "source"), maxCols = Seq("n_chars"), minCols = Seq("doc_id"))
    // three uneven batches, one of them empty for a stratum
    val served = Dedup.goldenFromPartials(
      Dedup.goldenMerge(Seq(
        part(labeled.where(col("doc_id") % 3 === 0)),
        part(labeled.where(col("doc_id") % 3 === 1)),
        part(labeled.where(col("doc_id") % 3 === 2))), "cluster_id"),
      "cluster_id")
    assert(served.columns.toSeq == whole.columns.toSeq)
    assert(served.collect().toSet == whole.collect().toSet)
  }
}
