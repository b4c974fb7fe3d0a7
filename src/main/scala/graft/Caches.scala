package graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry for operator-internal persisted intermediates.
  *
  * Candidate-generation operators ([[graft.ops.Dedup]]) persist frames that
  * feed both sides of a self-join (Spark does not share common subplans
  * across join branches), but the operators return *lazy* results — they
  * cannot unpersist before the caller materializes. Each invocation creates
  * fresh persisted frames, so repeated calls (bench min-of-N loops, long
  * sessions) would otherwise accumulate storage memory until LRU eviction
  * degrades performance. Harnesses call [[clear]] once per query/run.
  *
  * Deliberate long-lived caches (memoized ANN indexes — build once, query
  * many) are NOT tracked here; they use plain `.cache()`.
  */
object Caches {

  private val handles = java.util.concurrent.ConcurrentHashMap.newKeySet[DataFrame]()

  // RDD-level handles: loop checkpoints (localCheckpoint pins its final
  // frame in the block manager) and GraphX graph caches — neither goes
  // through track(), both are caught by the getPersistentRDDs delta in
  // trackNewRdds.
  private val rddHandles = java.util.concurrent.ConcurrentHashMap.newKeySet[RDD[_]]()

  /** Persists `df` and registers it for a later [[clear]]. */
  def track(df: DataFrame): DataFrame = {
    df.persist()
    handles.add(df)
    df
  }

  /** Runs `body` and registers every RDD that is newly persisted when it
    * returns (the `getPersistentRDDs` delta) for a later [[clear]]. The
    * iterative graph ops wrap their bodies in this: their final
    * `localCheckpoint`/`checkpoint` frame and GraphX's internally-cached
    * graph RDDs otherwise outlive the call un-evictably (intermediate
    * checkpoints are already unpersisted inside the loops and never appear
    * in the delta). Nesting is fine — an RDD registered twice unpersists
    * idempotently.
    */
  def trackNewRdds[T](spark: SparkSession)(body: => T): T = {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    try body
    finally spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!before.contains(id)) { rddHandles.add(rdd); () }
    }
  }

  /** Unpersists every tracked intermediate (non-blocking) and empties the
    * registry. Plan-level intermediates recompute from lineage if their
    * results are re-used afterwards; CHECKPOINT-truncated results (the
    * iterative ops' return frames) cannot — consume results before
    * clearing, which is what every harness epilogue (Verify/Bench/shell)
    * already does.
    */
  def clear(): Unit = {
    handles.forEach(df => { df.unpersist(blocking = false); () })
    handles.clear()
    rddHandles.forEach(rdd => { rdd.unpersist(blocking = false); () })
    rddHandles.clear()
  }
}
