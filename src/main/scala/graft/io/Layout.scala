package graft.io

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DateType, TimestampType}

/** Multi-dimensional data layout for scan pruning (Z-order clustering).
  *
  * A 100-TB table is read through its file/partition min-max statistics:
  * a predicate on a column prunes a file only if that file's value range
  * for the column is narrow. Sorting by one column makes ITS ranges
  * narrow and every other column's ranges full-width. Interleaving the
  * bits of several columns into one Morton (Z-order) key and
  * range-partitioning + sorting by it bounds EVERY participating column's
  * per-file range — multiplying the prunable fraction for predicates on
  * any of them. This is the layout step of lakehouse `OPTIMIZE ZORDER BY`,
  * expressed as plain Spark: a codegen key expression, one
  * `repartitionByRange` (sampled range boundaries — no global sort), and a
  * partition-local sort.
  *
  * The reference engine has no layout optimizer — its scan-side pruning is
  * date-partition-only (`core/.../services/IDManagerSparkService.scala`);
  * this module is part of the beyond-parity scale surface.
  */
object Layout {

  /** Numeric view of a clustered column: dates → epoch days, timestamps →
    * epoch seconds (a direct date/timestamp→double cast yields null).
    */
  private def asDouble(c: String, dt: DataType): Column = dt match {
    case DateType      => unix_date(col(c)).cast("double")
    case TimestampType => unix_micros(col(c)).cast("double")
    case _             => col(c).cast("double")
  }

  /** Morton key: each column is normalized to `bits` bits against its
    * [min, max] (from `stats`), then bit b of column i lands at position
    * `b * ncols + i` of the key. `bits * ncols` must fit a signed long.
    * NULL column values sort as the column's `lo` (bit pattern 0) — a NULL
    * anywhere would otherwise null the whole key, collapsing every
    * null-bearing row into ONE range partition whose min-max spans are
    * full-width on every clustered column (no pruning at all for them);
    * pinning NULLs at the low edge keeps them clustered with the column's
    * smallest values and leaves the other columns' spans tight.
    */
  private def mortonKey(df: DataFrame, cols: Seq[String], stats: Map[String, (Double, Double)], bits: Int): Column = {
    val n        = cols.length
    val scaleMax = (1L << bits) - 1
    cols.zipWithIndex
      .map { case (c, i) =>
        val (lo, hi) = stats(c)
        val range    = if (hi > lo) hi - lo else 1.0
        val v        = coalesce(asDouble(c, df.schema(c).dataType), lit(lo))
        val scaled = least(
          greatest(
            (((v - lit(lo)) / lit(range)) * lit(scaleMax.toDouble)).cast("long"),
            lit(0L)),
          lit(scaleMax))
        (0 until bits)
          .map(b => shiftleft(shiftright(scaled, b).bitwiseAND(lit(1L)), b * n + i))
          .reduce(_ bitwiseOR _)
      }
      .reduce(_ bitwiseOR _)
  }

  /** Rewrite `df` into a Z-order-clustered layout over `cols` (numeric or
    * date/timestamp-castable columns): `numPartitions` output partitions,
    * each covering a compact hyper-rectangle of the key space, rows sorted
    * by the Morton key within each. Write the result with any sink — the
    * per-file min-max footers then prune on every clustered column.
    *
    * Cost shape: one scalar min/max aggregate over the clustered columns
    * (layout-time only, map-side combined), then exactly one shuffle
    * (range exchange on the key) and a spillable partition-local sort —
    * no global sort, no driver materialization.
    */
  def zorderBy(df: DataFrame, cols: Seq[String], numPartitions: Int, bits: Int = 12): DataFrame = {
    require(cols.nonEmpty, "zorderBy needs at least one column")
    require(numPartitions > 0, s"numPartitions must be positive, got $numPartitions")
    require(cols.length * bits <= 62, s"${cols.length} cols × $bits bits overflows the long key")
    val aggs = cols.flatMap { c =>
      val v = asDouble(c, df.schema(c).dataType)
      Seq(min(v).as(s"lo_$c"), max(v).as(s"hi_$c"))
    }
    val row: Row = df.agg(aggs.head, aggs.tail: _*).head()
    val stats = cols.zipWithIndex.map { case (c, i) =>
      val lo = if (row.isNullAt(2 * i)) 0.0 else row.getDouble(2 * i)
      val hi = if (row.isNullAt(2 * i + 1)) 0.0 else row.getDouble(2 * i + 1)
      c -> ((lo, hi))
    }.toMap
    val key = "_graft_zkey"
    df.withColumn(key, mortonKey(df, cols, stats, bits))
      .repartitionByRange(numPartitions, col(key))
      .sortWithinPartitions(key)
      .drop(key)
  }

  /** Z-order-cluster `df` and write it to `path` with output files sized
    * toward `targetFileMB` (the small-files/giant-files maintenance knob
    * of `OPTIMIZE`): partition count = ceil(estimated bytes / target),
    * estimated from the optimized plan's statistics (for a Parquet scan,
    * the actual file bytes; for derived frames, Catalyst's upper
    * estimate). One file per output partition. Returns the partition
    * count chosen.
    *
    * Crash-safe like the store maintenance paths: the clustered copy is
    * written to an [[AtomicSwap]] scratch dir and renamed in — readers
    * never observe a partially written layout, a crash mid-write leaves
    * the previous contents intact (healed on the next call), and
    * concurrent rewrites of one path fail fast on the maintenance lock.
    */
  def writeClustered(df: DataFrame, path: String, cols: Seq[String],
      targetFileMB: Int = 128, bits: Int = 12, bloomCols: Seq[String] = Nil): Int = {
    require(targetFileMB > 0, s"targetFileMB must be positive, got $targetFileMB")
    val bytes  = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val target = BigInt(targetFileMB) * (1 << 20)
    val n      = ((bytes + target - 1) / target).max(1).min(1 << 20).toInt
    val dir    = new org.apache.hadoop.fs.Path(path)
    val fs     = dir.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    AtomicSwap.withMaintenanceLock(fs, dir) {
      AtomicSwap.heal(fs, dir)
      // parquet bloom filters on point-lookup columns: min/max stats prune
      // RANGE predicates (what the Z-order clustering serves); a bloom
      // filter additionally prunes row groups for `id = x` probes on
      // high-cardinality columns where every file's [min, max] straddles
      // the value — the 100-TB "find this one document" path
      val writer = bloomCols.foldLeft(zorderBy(df, cols, n, bits).write.mode("overwrite")) {
        (w, c) => w.option(s"parquet.bloom.filter.enabled#$c", "true")
      }
      writer.parquet(AtomicSwap.scratch(dir).toString)
      AtomicSwap.swapIn(fs, dir)
    }
    n
  }

  /** Per-partition [min, max] spans of `cols` — the statistics a reader's
    * pruning sees. Diagnostic for layout quality (spec + tuning surface).
    */
  def partitionSpans(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      val v = asDouble(c, df.schema(c).dataType)
      Seq(min(v).as(s"lo_$c"), max(v).as(s"hi_$c"))
    }
    df.withColumn("_pid", spark_partition_id())
      .groupBy("_pid")
      .agg(aggs.head, aggs.tail: _*)
  }
}
