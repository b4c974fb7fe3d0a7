package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — the admission gate a pipeline runs
  * before a batch is allowed into the corpus (the Deequ-shaped check suite:
  * completeness, uniqueness, bounds, set membership, format). The point of
  * the design is COST SHAPE, not the checks themselves: every non-distinct
  * constraint compiles into conditional counters of ONE aggregate pass over
  * the table (a single partial-aggregated scan — adding a check adds a
  * counter, never a scan), and the per-check result rows are unpacked from
  * that one-row aggregate with an explode, not per-check jobs. [[Unique]]
  * checks need distinct counts and therefore ride the same aggregate via
  * Spark's Expand (still one scan of the table, one shuffle stage) — the
  * report documents that a suite of k uniqueness checks multiplies the
  * shuffled rows k+1×, so keep those to genuine key columns.
  *
  * The counters are plain sums, so they MERGE: [[counters]] emits a
  * one-row counter frame per batch, [[mergeCounters]] adds any number of
  * them, and [[reportFromCounters]] renders the same report the one-shot
  * path produces — the incremental-quality-dashboard shape (per-batch
  * counter rows persisted at ingest; the 100-TB corpus report reads
  * |batches| rows, never the corpus). Only [[Unique]] resists merging
  * (distinct counts don't add) and is rejected by [[counters]] — use an
  * HLL sketch column for mergeable distinctness estimates.
  *
  * Metrics are exact-integer ratios (`passing / n`) evaluated as ONE double
  * division, so an external engine reproduces every metric bit-for-bit
  * (the q101/q106 exactness discipline); `pass` compares the UNROUNDED
  * ratio against the threshold. An empty table yields NULL fractions —
  * every fraction check is then `pass = false` (fail-closed via a null
  * coalesce), while [[RowCountBetween]] still evaluates exactly.
  */
object Validate {

  /** One declarative constraint. `name` keys the report row. */
  sealed trait Check {
    def name: String

    /** Human-readable target column ("" for table-level checks). */
    def column: String

    /** The pass threshold recorded in the report. */
    def threshold: Double
  }

  /** Fraction of rows with `column` non-null must be >= `minFraction`. */
  final case class NotNull(column: String, minFraction: Double = 1.0) extends Check {
    val name = s"not_null($column)"
    val threshold: Double = minFraction
  }

  /** Fraction of NON-NULL rows with `lo <= column <= hi` must be
    * >= `minFraction` (nulls don't count against a range check — pair with
    * [[NotNull]] to forbid them).
    */
  final case class InRange(column: String, lo: Double, hi: Double, minFraction: Double = 1.0)
      extends Check {
    val name = s"in_range($column,$lo,$hi)"
    val threshold: Double = minFraction
  }

  /** Fraction of non-null rows whose `column` is one of `values` must be
    * >= `minFraction`.
    */
  final case class InSet(column: String, values: Seq[String], minFraction: Double = 1.0)
      extends Check {
    val name = s"in_set($column)"
    val threshold: Double = minFraction
  }

  /** Fraction of non-null rows whose `column` rlike-matches `pattern`
    * (shared Java/RE2 regex subset — the q68 portability rule) must be
    * >= `minFraction`.
    */
  final case class MatchesRegex(column: String, pattern: String, minFraction: Double = 1.0)
      extends Check {
    val name = s"matches($column)"
    val threshold: Double = minFraction
  }

  /** `column` must be unique across the table: metric is
    * `count(distinct column) / count(column)` (nulls excluded from both),
    * pass iff the ratio is exactly 1. NOT mergeable across batches — see
    * [[counters]].
    */
  final case class Unique(column: String) extends Check {
    val name = s"unique($column)"
    val threshold: Double = 1.0
  }

  /** Table row count must lie in `[lo, hi]`. Metric is the count itself. */
  final case class RowCountBetween(lo: Long, hi: Long) extends Check {
    val name = s"row_count($lo,$hi)"
    val column = ""
    val threshold: Double = lo.toDouble
  }

  /** Compiled suite: named counter aggregates (insertion-ordered, shared
    * across checks) + per-check (metric, pass) expressions over them.
    */
  private final case class Compiled(
      aggs: Seq[(String, Column)],
      rows: Seq[(Check, Column, Column)])

  private def compile(checks: Seq[Check]): Compiled = {
    require(checks.nonEmpty, "checks must be non-empty")
    require(checks.map(_.name).distinct.size == checks.size,
      "duplicate check names — each check must be unique per suite")

    val aggs = scala.collection.mutable.LinkedHashMap[String, Column]()
    aggs("__n") = count(lit(1))
    def counter(rawKey: String, c: Column): String = {
      // dots/dashes in a counter name would read as struct access downstream
      val key = rawKey.replaceAll("[^A-Za-z0-9_]", "_")
      if (!aggs.contains(key)) aggs(key) = c
      key
    }

    // null-on-zero division: an empty table must yield NULL metrics (and
    // fail-closed passes), not an ANSI DIVIDE_BY_ZERO
    def frac(num: Column, den: Column): Column =
      num.cast("double") / when(den =!= 0, den.cast("double"))

    val rows: Seq[(Check, Column, Column)] = checks.map {
      case ck @ NotNull(c, f) =>
        val k = counter(s"__nn_$c", count(col(c)))
        (ck: Check, frac(col(k), col("__n")),
          coalesce(frac(col(k), col("__n")) >= lit(f), lit(false)))
      case ck @ InRange(c, lo, hi, f) =>
        val k = counter(s"__rg_${c}_${lo}_$hi",
          count(when(col(c) >= lo && col(c) <= hi, 1)))
        val nn = counter(s"__nn_$c", count(col(c)))
        (ck, frac(col(k), col(nn)),
          coalesce(frac(col(k), col(nn)) >= lit(f), lit(false)))
      case ck @ InSet(c, vs, f) =>
        val k = counter(s"__st_$c", count(when(col(c).isInCollection(vs), 1)))
        val nn = counter(s"__nn_$c", count(col(c)))
        (ck, frac(col(k), col(nn)),
          coalesce(frac(col(k), col(nn)) >= lit(f), lit(false)))
      case ck @ MatchesRegex(c, pat, f) =>
        val k = counter(s"__re_$c", count(when(col(c).rlike(pat), 1)))
        val nn = counter(s"__nn_$c", count(col(c)))
        (ck, frac(col(k), col(nn)),
          coalesce(frac(col(k), col(nn)) >= lit(f), lit(false)))
      case ck @ Unique(c) =>
        val k = counter(s"__dc_$c", countDistinct(col(c)))
        val nn = counter(s"__nn_$c", count(col(c)))
        (ck, frac(col(k), col(nn)),
          coalesce(col(k) === col(nn), lit(true)))
      case ck @ RowCountBetween(lo, hi) =>
        (ck, col("__n").cast("double"),
          col("__n") >= lo && col("__n") <= hi)
    }
    Compiled(aggs.toSeq, rows)
  }

  private def unpack(one: DataFrame, compiled: Compiled, scale: Int): DataFrame = {
    val structs = compiled.rows.map { case (ck, metric, pass) =>
      struct(
        lit(ck.name).as("check"),
        lit(ck.column).as("column"),
        round(metric, scale).as("metric"),
        lit(ck.threshold).as("threshold"),
        pass.as("pass"))
    }
    one.select(explode(array(structs: _*)).as("r")).select(col("r.*"))
  }

  /** Runs `checks` over `df` in one aggregate pass. Returns one row per
    * check: `(check, column, metric, threshold, pass)` with `metric`
    * rounded to `scale` for display and `pass` decided on the unrounded
    * value. Row order is the input check order (an explicit `check_idx`
    * consumers can sort on is NOT emitted — the check name is the key).
    */
  def report(df: DataFrame, checks: Seq[Check], scale: Int = 6): DataFrame = {
    val compiled = compile(checks)
    val aggCols = compiled.aggs.map { case (k, c) => c.as(k) }
    unpack(df.agg(aggCols.head, aggCols.tail: _*), compiled, scale)
  }

  /** The suite's one-row counter frame for ONE batch — every counter is a
    * plain conditional count, so frames from different batches ADD
    * ([[mergeCounters]]). [[Unique]] checks are rejected here: a distinct
    * count is not a sum, and silently treating it as one would report
    * per-batch uniqueness as global uniqueness.
    */
  def counters(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(!checks.exists(_.isInstanceOf[Unique]),
      "Unique checks are not mergeable across batches — validate them on the " +
        "full table (report) or track distinctness with an HLL sketch instead")
    val compiled = compile(checks)
    val aggCols = compiled.aggs.map { case (k, c) => c.as(k) }
    df.agg(aggCols.head, aggCols.tail: _*)
  }

  /** Element-wise sum of per-batch [[counters]] frames (same suite). */
  def mergeCounters(parts: Seq[DataFrame]): DataFrame = {
    require(parts.nonEmpty, "parts must be non-empty")
    val all = parts.reduce(_ union _)
    val sums = all.columns.map(c => sum(col(c)).as(c))
    all.agg(sums.head, sums.tail: _*)
  }

  /** Renders the [[report]] from a (possibly merged) counter frame — by
    * construction `reportFromCounters(mergeCounters(batches), checks)` ==
    * `report(wholeTable, checks)` for any batch split (spec-pinned).
    */
  def reportFromCounters(countersDf: DataFrame, checks: Seq[Check], scale: Int = 6): DataFrame =
    unpack(countersDf, compile(checks), scale)

  /** True iff every check in a [[report]] frame passed — the scalar gate a
    * job wires before committing a batch (one driver boolean off a
    * |checks|-row frame, not a data-sized collect).
    */
  def allPass(reportDf: DataFrame): Boolean =
    reportDf.agg(min(col("pass"))).head.getBoolean(0)

  /** Schema contract check: diff a frame's actual schema against the
    * expected `(column → Spark SQL type name)` map. Returns one row per
    * column in either side — `(column, status, expected_type, actual_type)`
    * with status `ok` / `type_mismatch` / `missing` (expected, absent) /
    * `extra` (present, unexpected) — the ingest-gate complement of the
    * row-level [[report]]: a upstream producer silently widening a column
    * or dropping one fails HERE, before any data-level check runs.
    * Driver-side metadata only; no job is launched.
    */
  def expectSchema(df: DataFrame, expected: Map[String, String]): DataFrame = {
    val actual = df.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    val rows = (expected.keySet ++ actual.keySet).toSeq.sorted.map { c =>
      (expected.get(c), actual.get(c)) match {
        case (Some(e), Some(a)) if e == a => (c, "ok", e, a)
        case (Some(e), Some(a))           => (c, "type_mismatch", e, a)
        case (Some(e), None)              => (c, "missing", e, null)
        case (None, Some(a))              => (c, "extra", null, a)
        case _                            => throw new IllegalStateException("unreachable")
      }
    }
    import df.sparkSession.implicits._
    rows.toDF("column", "status", "expected_type", "actual_type")
  }

  /** Referential-integrity audit for one foreign key: how many child rows
    * reference a parent key that does not exist? Returns one row —
    * `(relation, n_child, n_null_fk, n_orphans)` — where `n_orphans` counts
    * non-null child keys absent from the parent (SQL `IS NOT NULL AND NOT
    * IN`), and null FKs are reported separately rather than conflated (a
    * null FK is "unknown parent", not "missing parent").
    *
    * One pass: the parent collapses to its distinct key set (partial-agg
    * shuffle on the key), the child left-joins it with a hit marker, and a
    * single aggregate counts the three buckets. At scale the join is a plain
    * hash/sort-merge equi-join on the key — broadcastable when the parent
    * dimension is small — and the output is one row, so audits over many FKs
    * union cheaply. Rows per relation, never per violation: pair with an
    * anti-join sample when the offending keys themselves are wanted.
    */
  def fkOrphans(child: DataFrame, fk: Column, parent: DataFrame, pk: Column,
      relation: String): DataFrame = {
    val keys = parent.select(pk.as("_fk")).where(col("_fk").isNotNull)
      .distinct().withColumn("_hit", lit(1))
    child.select(fk.as("_fk"))
      .join(keys, Seq("_fk"), "left")
      .agg(
        count(lit(1)).as("n_child"),
        sum(when(col("_fk").isNull, 1L).otherwise(0L)).as("n_null_fk"),
        sum(when(col("_fk").isNotNull && col("_hit").isNull, 1L).otherwise(0L))
          .as("n_orphans"))
      .select(lit(relation).as("relation"), col("n_child"), col("n_null_fk"),
        col("n_orphans"))
  }
}
