package graft.graph

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.rules.EdgeColumns

/** Query surface over the edge tables — the engine's analogue of the
  * reference's Gremlin-shell exploration (core/.../shell/Main.scala:34-75,
  * docs/TestJanusGraph_20200731.md: `g.V().outE("similarity").count()` etc.).
  *
  * Degree/neighbor/two-hop queries are plain DataFrame aggregations and
  * joins (codegen, shuffle on the grouping key only); connected components
  * delegates to GraphX's Pregel implementation — the idiomatic Spark layer
  * for iterative graph algorithms (a DataFrame-only loop would re-shuffle
  * the full edge set per iteration without GraphX's partition-aware
  * vertex replication).
  */
object GraphQueries {

  /** Out-degree per source vertex. On a bidirectionally-materialized edge
    * table this equals total degree.
    */
  def degrees(edges: DataFrame): DataFrame =
    edges.groupBy(col(EdgeColumns.Src).as("id")).agg(count(lit(1)).as("degree"))

  /** Degree distribution: how many vertices have degree d (the shell's
    * sanity query shape).
    */
  def degreeHistogram(edges: DataFrame): DataFrame =
    degrees(edges).groupBy(col("degree")).agg(count(lit(1)).as("n_vertices"))

  /** Direct neighbors of one vertex. */
  def neighbors(edges: DataFrame, vertexId: Long): DataFrame =
    edges.where(col(EdgeColumns.Src) === vertexId).select(col(EdgeColumns.Dst).as("neighbor"))

  /** Distinct two-hop neighborhood (excluding the start vertex). */
  def twoHop(edges: DataFrame, vertexId: Long): DataFrame = {
    val hop1 = neighbors(edges, vertexId)
    hop1.join(edges, hop1("neighbor") === edges(EdgeColumns.Src))
      .select(col(EdgeColumns.Dst).as("neighbor"))
      .where(col("neighbor") =!= vertexId)
      .union(hop1)
      .distinct()
  }

  /** PageRank over an edge set (GraphX Pregel — iterative vertex programs
    * belong in GraphX, where vertex state is co-partitioned and replicated
    * once instead of a DataFrame loop re-shuffling the edge corpus per
    * iteration). Directed: pass a bidirectional edge set for the undirected
    * reading. Vertices in `vertices` but absent from any edge keep the
    * reset mass `resetProb`. GraphX normalizes the result to sum to the
    * vertex count, so on a graph of k-regular components plus isolated
    * vertices the fixed point is exactly `N / (C + resetProb·I)` per
    * connected vertex and `resetProb · N / (C + resetProb·I)` per isolated
    * one (C connected, I isolated, N = C + I).
    */
  def pageRank(
      spark: SparkSession,
      vertices: DataFrame,
      edges: DataFrame,
      numIter: Int = 20,
      resetProb: Double = 0.15,
      idCol: String = "id"
  ): DataFrame = {
    import spark.implicits._
    val vRdd: RDD[(Long, Unit)] =
      vertices.select(col(idCol).cast("long")).rdd.map(r => (r.getLong(0), ()))
    val eRdd: RDD[Edge[Unit]] = edges
      .select(col(EdgeColumns.Src).cast("long"), col(EdgeColumns.Dst).cast("long"))
      .rdd.map(r => Edge(r.getLong(0), r.getLong(1), ()))
    Graph(vRdd, eRdd).staticPageRank(numIter, resetProb).vertices
      .toDF(idCol, "pagerank")
  }

  /** Per-vertex triangle counts (GraphX TriangleCount — edges are
    * canonicalized and self-loops dropped internally, so either a one-way
    * or bidirectional edge table gives the same undirected answer).
    * Vertices in no triangle report 0. The clustering-coefficient
    * primitive of the shell's exploration surface.
    */
  def triangleCounts(
      spark: SparkSession,
      vertices: DataFrame,
      edges: DataFrame,
      idCol: String = "id"
  ): DataFrame = {
    import spark.implicits._
    val vRdd: RDD[(Long, Unit)] =
      vertices.select(col(idCol).cast("long")).rdd.map(r => (r.getLong(0), ()))
    val eRdd: RDD[Edge[Unit]] = edges
      .select(col(EdgeColumns.Src).cast("long"), col(EdgeColumns.Dst).cast("long"))
      .rdd.map(r => Edge(r.getLong(0), r.getLong(1), ()))
    Graph(vRdd, eRdd)
      .partitionBy(org.apache.spark.graphx.PartitionStrategy.RandomVertexCut)
      .triangleCount().vertices
      .map { case (id, n) => (id, n.toLong) }
      .toDF(idCol, "triangles")
  }

  /** Connected components over an edge set; vertices absent from any edge
    * are singletons (their own component). Returns (id, component) where
    * component = smallest vertex id in the component (GraphX convention).
    */
  def connectedComponents(
      spark: SparkSession,
      vertices: DataFrame,
      edges: DataFrame,
      idCol: String = "id"
  ): DataFrame = {
    import spark.implicits._
    val vRdd: RDD[(Long, Unit)] =
      vertices.select(col(idCol).cast("long")).rdd.map(r => (r.getLong(0), ()))
    val eRdd: RDD[Edge[Unit]] = edges
      .select(col(EdgeColumns.Src).cast("long"), col(EdgeColumns.Dst).cast("long"))
      .rdd.map(r => Edge(r.getLong(0), r.getLong(1), ()))
    val graph = Graph(vRdd, eRdd)
    graph.connectedComponents().vertices
      .toDF(idCol, "component")
  }
}
