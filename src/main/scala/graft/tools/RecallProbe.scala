package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.SimilaritySearch

/** Diagnostic: IVF recall@10 vs brute force across nprobe settings, for
  * tuning the q27 recall gate. Args: one or more sf dirs (defaults to the
  * local sf0.01/sf0.1 test data). `SPARK_GRAFT_CPUS` varies the session
  * parallelism — since the index build pins its own layout, the printed
  * hits must be identical for every setting (the q27 flake check).
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    for (dir <- dirs) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val brute = SimilaritySearch.bruteForceTopK(emb, graft.SparkEntry.benchQueryVec, k = 10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      for (np <- Seq(1, 2, 3, 4)) {
        val ivf = SimilaritySearch.IvfIndex(k = 8, nprobe = np)
        val (indexed, centroids) = { val (i, c) = ivf.index(emb); (i.cache(), c) }
        val approx = ivf.query(indexed, centroids, graft.SparkEntry.benchQueryVec, topK = 10)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        println(s"PROBE $dir nprobe=$np hits=${(approx & brute).size}/10")
        indexed.unpersist()
      }
    }
    spark.stop()
  }
}
