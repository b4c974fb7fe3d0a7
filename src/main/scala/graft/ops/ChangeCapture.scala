package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture primitives: apply an ordered change batch (insert /
  * update / delete rows) onto a keyed snapshot — the MERGE-INTO face of a
  * lakehouse table — and derive the change batch between two snapshots
  * (the inverse). Together they close the loop the reference's load job
  * only walks one way (append edges / delete a day's partition,
  * `grafink`'s delete mode, reference `GraftJob` path): a keyed table can
  * be maintained incrementally from upstream diffs instead of rewritten.
  *
  * Scale shape: `applyChanges` is one window shuffle over the CHANGE
  * batch (small by construction — it is the delta) plus one anti-join of
  * the snapshot against the changed-key frame, which Spark broadcasts
  * whenever the delta is broadcast-sized; the snapshot itself shuffles at
  * most once. Nothing is ever collected.
  */
object ChangeCapture {

  /** Applies `changes` onto `snapshot`, latest-per-key wins. `changes`
    * carries the snapshot's columns plus `opCol` (`"I"` / `"U"` / `"D"`)
    * and `seqCol`, a per-key monotone sequence; `(keyCols, seqCol)` must
    * be unique (the usual CDC-stream contract — a log position). The
    * result is the snapshot with each changed key replaced by its
    * highest-`seq` change row (dropped entirely when that row is a
    * delete); `I` vs `U` is not distinguished on apply — both upsert,
    * so replayed logs and out-of-sync snapshots converge.
    */
  def applyChanges(
      snapshot: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      opCol: String = "op",
      seqCol: String = "seq"): DataFrame = {
    require(keyCols.nonEmpty, "applyChanges needs at least one key column")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(seqCol).desc)
    val latest = changes
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_rn")
    val changedKeys = latest.select(keyCols.map(col): _*)
    val kept = snapshot.join(changedKeys, keyCols, "left_anti")
    val upserts = latest.where(col(opCol) =!= "D").drop(opCol, seqCol)
    kept.unionByName(upserts)
  }

  /** Derives the change batch turning `oldSnap` into `newSnap`: one row
    * per differing key with `op` = `"I"` (key only in new), `"D"` (key
    * only in old; non-key columns are the OLD values, the tombstone
    * payload), or `"U"` (key in both with any non-key column differing,
    * null-safely compared). Unchanged keys produce no row — the output IS
    * the delta, so `applyChanges(oldSnap, changeLog(oldSnap, newSnap))`
    * reproduces `newSnap` exactly (spec-pinned roundtrip).
    *
    * One full-outer equi-join on the key — both sides shuffle once on the
    * same key, and the `U`-detection comparison is a null-safe column
    * conjunction evaluated inside the join's projection, no second pass.
    */
  def changeLog(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      keyCols: Seq[String],
      opCol: String = "op"): DataFrame = {
    require(keyCols.nonEmpty, "changeLog needs at least one key column")
    val valueCols = oldSnap.columns.filterNot(keyCols.contains).toSeq
    require(newSnap.columns.sorted.sameElements(oldSnap.columns.sorted),
      "changeLog snapshots must share one schema")
    val o = oldSnap.select(oldSnap.columns.map(c => col(c).as(s"_o_$c")).toIndexedSeq: _*)
    val n = newSnap.select(newSnap.columns.map(c => col(c).as(s"_n_$c")).toIndexedSeq: _*)
    val joinCond = keyCols.map(k => col(s"_o_$k") <=> col(s"_n_$k")).reduce(_ && _)
    val inOld = col(s"_o_${keyCols.head}").isNotNull
    val inNew = col(s"_n_${keyCols.head}").isNotNull
    val changed =
      if (valueCols.isEmpty) lit(false)
      else valueCols.map(c => !(col(s"_o_$c") <=> col(s"_n_$c"))).reduce(_ || _)
    val op = when(!inOld, "I").when(!inNew, "D").when(changed, "U")
    o.join(n, joinCond, "full_outer")
      .withColumn(opCol, op)
      .where(col(opCol).isNotNull)
      .select(
        oldSnap.columns.toIndexedSeq.map { c =>
          when(col(opCol) === "D", col(s"_o_$c")).otherwise(col(s"_n_$c")).as(c)
        } :+ col(opCol): _*)
  }

  /** Incremental JOIN-view maintenance (insert-only deltas): the new rows
    * a materialized join view `V = A ⋈ B` gains when batches ΔA and ΔB
    * land is exactly
    * `ΔV = ΔA ⋈ B₀  ∪  A₀ ⋈ ΔB  ∪  ΔA ⋈ ΔB`
    * — the classic delta-rule decomposition, disjoint by construction
    * (each term is keyed by which SIDE of the pair is new), so
    * `V₁ = V₀ ∪ ΔV` with plain appends and no dedup pass. This is the
    * join analogue of [[MaterializedAgg]]'s mergeable aggregate states:
    * maintaining a 100-TB join view costs |Δ|-sized joins per batch,
    * never a re-join of the bases.
    *
    * Scale shape: the two base-side joins shuffle ONLY their delta side
    * when the base is bucketed/pre-partitioned on the key (broadcast the
    * delta when it is dim-sized); ΔA ⋈ ΔB is delta × delta. Updates and
    * deletes ride [[changeLog]]/[[applyChanges]] upstream — this rule is
    * the append fast path (the common log-structured corpus case).
    */
  def deltaJoin(
      aOld: DataFrame,
      aDelta: DataFrame,
      bOld: DataFrame,
      bDelta: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "deltaJoin needs at least one key column")
    aDelta.join(bOld, keyCols)
      .unionByName(aOld.join(bDelta, keyCols))
      .unionByName(aDelta.join(bDelta, keyCols))
  }
}
