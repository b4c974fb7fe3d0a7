package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of DISTRIBUTIVE grouped aggregates — the
  * materialized-view delta machinery of a warehouse: a grouped report over
  * an append-only 100-TB fact table should cost one pass over the NEW
  * batch plus a merge of |groups|-sized state, never a rescan.
  *
  * State per group: row count, and per value column the exact
  * `decimal(38,12)` sum, non-null count, min and max — every one of them
  * mergeable by re-aggregation (`Σ` by `+`, min by min, max by max), so
  * `merge(partials(b₁), …, partials(bₙ)) ≡ partials(b₁ ∪ … ∪ bₙ)` holds
  * EXACTLY (decimal sums are order-free; spec-pinned). [[serve]] derives
  * the non-mergeable faces (averages) from the exact state at read time —
  * one division per group, the q112 portability rule.
  *
  * Append-only by design: deletions need retraction rows or a rebuild
  * (the [[ChangeCapture]] path); min/max cannot be decremented.
  * Same family as [[Validate.mergeCounters]] / the corpus-stats partials —
  * this is the general grouped-report instance.
  */
object MaterializedAgg {

  private val StateCols = Seq("n")
  private def stateColsFor(valueCols: Seq[String], distinctCols: Seq[String]): Seq[String] =
    StateCols ++ valueCols.flatMap(c => Seq(s"sum_$c", s"cnt_$c", s"min_$c", s"max_$c")) ++
      distinctCols.map(c => s"hll_$c")

  /** One batch's (or the initial) state contribution: one row per group.
    * `distinctCols` adds a mergeable DataSketches HLL sketch per column —
    * distinct counts are NOT distributive, so the state carries the
    * sketch itself (`hll_sketch_agg` binary) and [[merge]] unions it;
    * the estimate is deterministic for a given input set, so
    * merge-≡-whole holds bit-exactly (spec-pinned).
    */
  def partials(df: DataFrame, groupCols: Seq[String], valueCols: Seq[String],
      distinctCols: Seq[String] = Nil): DataFrame = {
    require(groupCols.nonEmpty, "partials needs at least one group column")
    require(valueCols.nonEmpty, "partials needs at least one value column")
    val aggs = (count(lit(1)).as("n") +: valueCols.flatMap { c =>
      Seq(
        sum(col(c).cast("decimal(38,12)")).as(s"sum_$c"),
        count(col(c)).as(s"cnt_$c"),
        min(col(c)).as(s"min_$c"),
        max(col(c)).as(s"max_$c"))
    }) ++ distinctCols.map(c => hll_sketch_agg(col(c)).as(s"hll_$c"))
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merges any number of state frames (prior state is just another
    * partial). Group columns are recovered from the frame schema — every
    * column that is not part of the aggregate state.
    */
  def merge(parts: Seq[DataFrame]): DataFrame = {
    require(parts.nonEmpty, "merge needs at least one state frame")
    val cols = parts.head.columns.toSeq
    parts.tail.foreach(p => require(p.columns.toSeq == cols,
      "state frames must share one schema"))
    val valueCols = cols.collect { case c if c.startsWith("sum_") => c.stripPrefix("sum_") }
    val distinctCols = cols.collect { case c if c.startsWith("hll_") => c.stripPrefix("hll_") }
    val groupCols = cols.filterNot(stateColsFor(valueCols, distinctCols).contains)
    val aggs = (sum(col("n")).as("n") +: valueCols.flatMap { c =>
      Seq(
        sum(col(s"sum_$c")).as(s"sum_$c"),
        sum(col(s"cnt_$c")).as(s"cnt_$c"),
        min(col(s"min_$c")).as(s"min_$c"),
        max(col(s"max_$c")).as(s"max_$c"))
    }) ++ distinctCols.map(c => hll_union_agg(col(s"hll_$c")).as(s"hll_$c"))
    parts.reduce(_ unionByName _)
      .groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** The report face: per group `n`, and per value column
    * `(sum_<c> as double, avg_<c>, min_<c>, max_<c>)` — sums and averages
    * rounded to `scale`, the average ONE division off the exact decimal
    * sum. NULL average where the column had no non-null rows.
    */
  def serve(state: DataFrame, scale: Int = 6): DataFrame = {
    val cols = state.columns.toSeq
    val valueCols = cols.collect { case c if c.startsWith("sum_") => c.stripPrefix("sum_") }
    val distinctCols = cols.collect { case c if c.startsWith("hll_") => c.stripPrefix("hll_") }
    val groupCols = cols.filterNot(stateColsFor(valueCols, distinctCols).contains)
    state.select(
      groupCols.map(col) ++ Seq(col("n")) ++ valueCols.flatMap { c =>
        Seq(
          round(col(s"sum_$c").cast("double"), scale).as(s"sum_$c"),
          when(col(s"cnt_$c") > 0,
            round(col(s"sum_$c").cast("double") / col(s"cnt_$c"), scale)).as(s"avg_$c"),
          col(s"min_$c"), col(s"max_$c"))
      } ++ distinctCols.map(c =>
        hll_sketch_estimate(col(s"hll_$c")).as(s"approx_distinct_$c")): _*)
  }
}
