package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A hash join shuffles both sides on the join key, so one hot key lands on
  * one reducer and the stage runs at the speed of that task. AQE's skew-join
  * splitting (`spark.sql.adaptive.skewJoin.enabled`) repairs this at runtime
  * for plain sort-merge joins, but cannot when the skewed Exchange is reused
  * by another operator in the same stage, when the join is already the build
  * side of something else, or when the imbalance is inside a single
  * map-output block. Salting fixes it in the plan: the fact side's key is
  * extended with a deterministic salt in [0, salts), the dimension side is
  * replicated once per salt value, and the join runs on (key, salt) — the
  * hot key now spreads over `salts` reducers.
  *
  * Scale contract (100 TB): the big/skewed side is mapped 1:1 (no blowup —
  * the salt is computed, not exploded); only `right` is replicated ×salts,
  * so pass the SMALL side as `right`. The salt is a hash of the left row's
  * `saltSource` column (default: the key itself is wrong — it's constant per
  * key! — so callers pass a high-cardinality column, e.g. the fact table's
  * primary key), making the result partitioning-invariant and replayable.
  *
  * Semantics: identical to `left.join(right, keys, joinType)` for `inner`
  * and `left`/`left_outer` (each left row carries exactly one salt, so
  * unmatched left rows surface exactly once). Right-outer/full are not
  * offered: the replicated right side would need a post-dedup that costs
  * more than the skew.
  *
  * Reference scope: the reference's engine has no skew story — its
  * published similarity runs are single-reducer-bound for exactly this
  * reason (docs/Benchmarks.md:82-135, hours on 100 cores). This operator is
  * part of the beyond-parity scale surface.
  */
object SkewJoin {

  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      saltSource: Column,
      salts: Int = 16,
      joinType: String = "inner"
  ): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    require(
      Set("inner", "left", "left_outer", "leftouter").contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left joins, got $joinType")
    val saltCol = "__graft_salt"
    val l = left.withColumn(saltCol, pmod(xxhash64(saltSource), lit(salts)).cast("int"))
    // replicate the small side once per salt value (explode of a literal
    // array — ×salts rows, zero shuffle)
    val r = right.withColumn(saltCol, explode(lit((0 until salts).toArray)))
    l.join(r, keys :+ saltCol, joinType).drop(saltCol)
  }

  /** Skew diagnosis + salting plan — the measurement [[saltedJoin]]'s
    * `salts` parameter should come from, instead of a guess: per join
    * key, its row count, its share of the table, and
    * `salt_factor = ⌈n / targetPerTask⌉` — the number of reducers that
    * key needs (factor 1 ⇔ no salting needed; the max factor over the
    * hot keys is the `salts` to pass). `minRows` prunes the long tail so
    * the plan stays a small driver-consumable table.
    *
    * One partial-aggregated shuffle on the key + a one-row total attach;
    * exact integer ceil-division — the advisor costs one scan at any
    * fact-table size.
    */
  def saltPlan(
      df: DataFrame,
      keys: Seq[String],
      targetPerTask: Long,
      minRows: Long = 1L,
      scale: Int = 6
  ): DataFrame = {
    require(keys.nonEmpty, "saltPlan needs at least one key column")
    require(targetPerTask >= 1, s"targetPerTask must be >= 1, got $targetPerTask")
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("_t"))
    counts.crossJoin(broadcast(tot))
      .where(col("n") >= minRows)
      .select(keys.map(col) ++ Seq(
        col("n"),
        round(col("n").cast("double") / col("_t"), scale).as("share"),
        expr(s"(n + ${targetPerTask - 1}) div $targetPerTask").as("salt_factor")): _*)
  }
}
