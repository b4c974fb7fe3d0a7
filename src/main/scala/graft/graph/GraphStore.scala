package graft.graph

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.rules.{EdgeColumns, VertexClassifierRule}

/** Parquet-backed edge store — the engine's system of record for edges,
  * replacing the reference's per-edge JanusGraph/HBase transactional sink
  * (the dominant cost in every published benchmark; BASELINE.md).
  *
  * The reference itself designates the Spark-side intermediate copy as the
  * read path for edge computation ("Option 4", docs/LoadAlgorithm.md:119-158);
  * we promote it to first-class storage.
  *
  * Ref: core/.../processor/EdgeProcessor.scala:84-187.
  */
class EdgeStore(spark: SparkSession, basePath: String) {

  /** Matches the reference's writer-parallelism calculation:
    * `max(count / taskSize + 1, parallelism)`. Ref: EdgeProcessor.scala:141-149
    * (getParallelism, taskSize default 25000).
    */
  def getParallelism(edgeCount: Long, taskSize: Long = 25000, minParallelism: Int = 100): Int =
    math.max((edgeCount / taskSize + 1).toInt, minParallelism)

  /** Writes one rule's edge set, partitioned by edge label.
    *
    * Bidirectionality: the reference writes each edge twice (forward +
    * reverse, EdgeProcessor.scala:108-138) because JanusGraph adjacency is
    * directional; relationally we materialize `union(swap(src, dst))` when
    * `bidirectional = true`, or leave symmetry to query time.
    *
    * Scale notes: edges are hash-distributed on `src` before the write —
    * the same `keyBy(src).partitionBy(HashPartitioner)` layout the reference
    * uses (EdgeProcessor.scala:170-180) — so downstream per-source reads and
    * vertex-id joins are co-located. AQE coalesces small shuffle partitions.
    */
  def write(
      edges: DataFrame,
      label: String,
      bidirectional: Boolean = false,
      mode: SaveMode = SaveMode.Append
  ): Unit = {
    VertexClassifierRule.validate(edges.schema, label)
    val oriented =
      if (bidirectional)
        edges.union(
          edges.select(
            col(EdgeColumns.Dst).as(EdgeColumns.Src),
            col(EdgeColumns.Src).as(EdgeColumns.Dst),
            col(EdgeColumns.PropVal)
          )
        )
      else edges
    oriented
      .repartition(col(EdgeColumns.Src))
      .write
      .mode(mode)
      .parquet(s"$basePath/label=$label")
  }

  def read(label: String): DataFrame = spark.read.parquet(s"$basePath/label=$label")

  /** Bucketed variant: writes the edge set as a bucketed+sorted catalog
    * table on `src`. Joins and aggregations keyed on `src` against this
    * table then plan WITHOUT an Exchange on the edge side — the bucketing
    * metadata replaces the shuffle, which at 100 TB is the difference
    * between re-shuffling the edge corpus per query and reading it in
    * place. (Plain `repartition(src)` layout — [[write]] — loses that
    * information at read time; only catalog bucketing persists it.)
    */
  def writeBucketed(
      edges: DataFrame,
      tableName: String,
      buckets: Int = 0,
      bidirectional: Boolean = false,
      mode: SaveMode = SaveMode.Overwrite
  ): Unit = {
    VertexClassifierRule.validate(edges.schema, tableName)
    val oriented =
      if (bidirectional)
        edges.union(
          edges.select(
            col(EdgeColumns.Dst).as(EdgeColumns.Src),
            col(EdgeColumns.Src).as(EdgeColumns.Dst),
            col(EdgeColumns.PropVal)))
      else edges
    // buckets <= 0: derive the bucket count from the edge count with the
    // reference's writer-parallelism rule (getParallelism) — one count()
    // pass, paid once at layout time so every later src-keyed read gets a
    // properly-sized shuffle-free layout
    val n = if (buckets > 0) buckets else getParallelism(oriented.count())
    oriented.write
      .mode(mode)
      .bucketBy(n, EdgeColumns.Src)
      .sortBy(EdgeColumns.Src)
      .option("path", s"$basePath/table=$tableName")
      .saveAsTable(tableName)
  }

  def readBucketed(tableName: String): DataFrame = spark.table(tableName)

  /** Rewrites one label's accumulated small files into size-targeted files.
    *
    * Maintenance for the append-only store: every incremental run appends
    * at least one file per label, so after thousands of runs the scan cost
    * is dominated by file-open overhead rather than bytes (the classic
    * small-files problem — at 100 TB the difference between reading 10k
    * 128 MB files and 10M 100 KB ones). File count is sized from the
    * label's actual on-disk bytes; the rewrite preserves the src-hash
    * distribution of [[write]] and swaps directories via the crash-safe
    * rename-aside protocol of [[graft.io.AtomicSwap]] (a complete copy of
    * the label's rows exists on disk at every instant; scratch dirs are
    * dot-prefixed and invisible to discovery).
    */
  def compact(
      label: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      hooks: graft.io.AtomicSwap.Hooks = graft.io.AtomicSwap.NoHooks
  ): Unit = {
    val dir = new org.apache.hadoop.fs.Path(s"$basePath/label=$label")
    val fs  = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.io.AtomicSwap.withMaintenanceLock(fs, dir) {
      graft.io.AtomicSwap.heal(fs, dir)
      if (fs.exists(dir)) {
        val bytes  = fs.getContentSummary(dir).getLength
        val nFiles = math.max(1, (bytes / targetFileBytes).toInt)
        val tmp    = graft.io.AtomicSwap.scratch(dir)
        read(label).repartition(nFiles, col(EdgeColumns.Src))
          .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
        graft.io.AtomicSwap.swapIn(fs, dir, hooks)
      }
    }
  }

  /** Deletes every edge touching one of the given vertex ids (delete-mode
    * cleanup, the relational analogue of removing a vertex's incident edges).
    * Implemented as two broadcast-able anti-joins.
    */
  def deleteForVertices(
      label: String,
      vertexIds: DataFrame,
      hooks: graft.io.AtomicSwap.Hooks = graft.io.AtomicSwap.NoHooks
  ): Unit = {
    val dir = new org.apache.hadoop.fs.Path(s"$basePath/label=$label")
    val fs  = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.io.AtomicSwap.withMaintenanceLock(fs, dir) {
      graft.io.AtomicSwap.heal(fs, dir)
      val ids = vertexIds.select(col("id"))
      val remaining = read(label)
        .join(broadcast(ids), col(EdgeColumns.Src) === col("id"), "left_anti")
        .join(broadcast(ids), col(EdgeColumns.Dst) === col("id"), "left_anti")
      remaining.write.mode(SaveMode.Overwrite).parquet(graft.io.AtomicSwap.scratch(dir).toString)
      graft.io.AtomicSwap.swapIn(fs, dir, hooks)
    }
  }
}

/** Parquet-backed fixed-vertex (dimension) store with idempotent upsert —
  * the relational analogue of the reference's skip-if-exists fixed-vertex
  * loader (VertexProcessor.scala:163-201).
  */
class FixedVertexStore(spark: SparkSession, path: String) {

  /** Idempotent load: appends only rows whose id is not already present
    * (anti-join on id — `MERGE`-style upsert without Delta).
    */
  def load(fixedVertices: DataFrame): Unit = {
    val existing =
      try spark.read.parquet(path).select("id")
      catch { case _: org.apache.spark.sql.AnalysisException => null }
    val toWrite =
      if (existing == null) fixedVertices
      else fixedVertices.join(broadcast(existing), Seq("id"), "left_anti")
    toWrite.write.mode(SaveMode.Append).parquet(path)
  }

  def read(): DataFrame = spark.read.parquet(path)
}
