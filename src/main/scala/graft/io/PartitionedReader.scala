package graft.io

import java.time.LocalDate
import java.time.format.DateTimeFormatter

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Raised when no partition of the requested date range exists.
  * Ref: common/.../models/GrafinkException.scala (NoDataException).
  */
final case class NoDataException(msg: String) extends Exception(msg)

/** Input format of the alert dataset. Ref: common/.../models/Format.scala:19-26.
  * Orc and Text go beyond the reference's three (both are Spark built-ins and
  * ride the same partition-pruned scan path — Text yields a single `value`
  * column, the raw-corpus ingestion face).
  */
sealed trait DataFormat { def name: String }
object DataFormat {
  case object Parquet extends DataFormat { val name = "parquet" }
  case object Csv     extends DataFormat { val name = "csv" }
  case object Json    extends DataFormat { val name = "json" }
  case object Orc     extends DataFormat { val name = "orc" }
  case object Text    extends DataFormat { val name = "text" }
}

/** Generates `year=YYYY/month=MM/day=DD` partition paths for a date range.
  *
  * Ref: core/.../common/PartitionManager.scala:43-90,143-162. `padded=true`
  * reproduces `PaddedPartitionManager` (zero-padded month/day, used by the
  * load job); `padded=false` the plain `PartitionManagerImpl` (delete job).
  */
case class PartitionManager(startDate: LocalDate, duration: Int, padded: Boolean = true) {

  def dates: Seq[LocalDate] = (0 until duration).map(startDate.plusDays(_))

  def relativePaths: Seq[String] =
    dates.map { d =>
      if (padded) f"year=${d.getYear}/month=${d.getMonthValue}%02d/day=${d.getDayOfMonth}%02d"
      else s"year=${d.getYear}/month=${d.getMonthValue}/day=${d.getDayOfMonth}"
    }

  /** Paths that actually exist under basePath — the reference's FS-existence
    * pre-filter, which (unlike a partition-pruning predicate over a plain
    * `load(basePath)`) tolerates missing day directories without listing the
    * full table. Ref: Reader.scala:56-70, PartitionManager.scala:72-90.
    *
    * Each date is probed in the configured padding first, then the other
    * layout: source fixtures use zero-padded dirs (`month=02`) while Spark's
    * own `partitionBy` writes unpadded (`month=2`) — the reference handles
    * this with two separate PartitionManager impls chosen per job
    * (Job.scala:76 vs :123); probing both makes either layout readable.
    */
  def existingPaths(spark: SparkSession, basePath: String): Seq[String] = {
    val base = new Path(basePath)
    val fs   = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val alt  = copy(padded = !padded).relativePaths
    relativePaths.zip(alt).flatMap { case (pref, fallback) =>
      Seq(pref, fallback).distinct
        .map(r => s"$basePath/$r")
        .find(p => fs.exists(new Path(p)))
    }
  }

  /** Equivalent partition-pruning predicate, for reading through the catalog
    * path instead of explicit dirs (Catalyst prunes to the same file set).
    */
  def partitionPredicate: org.apache.spark.sql.Column =
    dates
      .map(d =>
        col("year") === d.getYear && col("month") === d.getMonthValue && col("day") === d.getDayOfMonth
      )
      .reduce(_ || _)
}

object PartitionManager {
  private val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd")
  def forRange(startDate: String, duration: Int, padded: Boolean = true): PartitionManager =
    PartitionManager(LocalDate.parse(startDate, fmt), duration, padded)
}

/** Configuration of the reader pipeline: which columns to keep, how to
  * rename (flattening nested structs), and SQL-expression derived columns.
  * Ref: common/.../models/Config.scala:26-30 (ReaderConfig), README.md:33-57.
  */
case class ReaderConfig(
    basePath: String,
    format: DataFormat = DataFormat.Parquet,
    keepCols: List[String] = Nil,
    keepColsRenamed: List[(String, String)] = Nil,
    newCols: List[(String, String)] = Nil,
    options: Map[String, String] = Map.empty // format options (csv header, json mode, ...)
)

/** Partition-pruned scan + projection/rename/derive pipeline (S1 + S2).
  *
  * Ref: core/.../services/reader/Reader.scala:52-103.
  *
  * Spark-first notes: derived columns use `expr(sql)` directly instead of the
  * reference's temp-view + full `SELECT` detour — same SQL expression power,
  * no session-global view state. Keeping the explicit `select` immediately
  * after the scan guarantees column pruning reaches the Parquet footer
  * (ReadSchema) even when later stages are opaque (e.g. typed flatMaps).
  */
class PartitionedReader(spark: SparkSession, config: ReaderConfig) {

  /** Reads only the existing partition dirs of the range; throws
    * [[NoDataException]] if none exist. Ref: Reader.scala:52-73.
    */
  def read(pm: PartitionManager): DataFrame = {
    val paths = pm.existingPaths(spark, config.basePath)
    if (paths.isEmpty)
      throw NoDataException(s"No data at ${config.basePath} for ${pm.relativePaths.mkString(",")}")
    spark.read
      .option("basePath", config.basePath)
      .options(config.options)
      .format(config.format.name)
      .load(paths: _*)
  }

  /** read + keep/rename/derive; partition columns are always appended.
    * Ref: Reader.scala:75-103.
    */
  def readAndProcess(pm: PartitionManager): DataFrame = {
    val df = read(pm)
    val partitionCols = List("year", "month", "day")
    val kept =
      config.keepCols.map(c => col(c)) ++
        config.keepColsRenamed.map { case (from, to) => col(from).as(to) } ++
        partitionCols.map(col)
    val selected = if (config.keepCols.isEmpty && config.keepColsRenamed.isEmpty) df else df.select(kept: _*)
    config.newCols.foldLeft(selected) { case (acc, (name, sqlExpr)) =>
      acc.withColumn(name, expr(sqlExpr))
    }
  }
}
