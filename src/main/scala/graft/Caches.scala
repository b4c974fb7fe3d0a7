package graft

import org.apache.spark.sql.DataFrame

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

  /** Persists `df` and registers it for a later [[clear]]. */
  def track(df: DataFrame): DataFrame = {
    df.persist()
    handles.add(df)
    df
  }

  /** Unpersists every tracked intermediate (non-blocking) and empties the
    * registry. Safe to call while results derived from the intermediates
    * are still referenced — they recompute from lineage if re-used.
    */
  def clear(): Unit = {
    handles.forEach(df => { df.unpersist(blocking = false); () })
    handles.clear()
  }
}
