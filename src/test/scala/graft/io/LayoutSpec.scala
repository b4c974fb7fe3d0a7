package graft.io

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Layout.zorderBy: content preservation, and the actual pruning property —
  * per-partition min-max spans stay narrow on EVERY clustered column, where
  * a single-column sort leaves the other column's spans full-width.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  // 32×32 grid — every (x, y) cell once, in a scrambled input order
  private def grid = spark.range(1024)
    .select(
      (col("id") * 37 % 1024).as("rid"),
      (col("id") % 32).as("x"),
      (col("id") / 32).as("y"))

  private def meanSpans(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
    val spans = Layout.partitionSpans(df, Seq("x", "y"))
      .select(
        (col("hi_x") - col("lo_x")).as("sx"),
        (col("hi_y") - col("lo_y")).as("sy"))
      .agg(avg("sx"), avg("sy"))
      .head()
    (spans.getDouble(0), spans.getDouble(1))
  }

  test("zorderBy preserves the exact multiset of rows") {
    val in  = grid
    val out = Layout.zorderBy(in, Seq("x", "y"), numPartitions = 16)
    assert(out.count() === 1024L)
    val inSorted  = in.collect().map(_.mkString("|")).sorted.toSeq
    val outSorted = out.collect().map(_.mkString("|")).sorted.toSeq
    assert(inSorted === outSorted)
  }

  test("zorder layout bounds per-partition spans on both columns") {
    val z = Layout.zorderBy(grid, Seq("x", "y"), numPartitions = 16)
    val (zx, zy) = meanSpans(z)
    // 16 partitions over a 32×32 grid → ~8×8 Z-blocks; both dims must be
    // far below the 31-wide full range
    assert(zx < 16.0, s"x span under z-order should be < half range, got $zx")
    assert(zy < 16.0, s"y span under z-order should be < half range, got $zy")
    // the single-column layout a naive sort produces: x narrow, y full
    val xSorted = grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
    val (_, sy) = meanSpans(xSorted)
    assert(sy > 25.0, s"x-only sort leaves y spans full-width, got $sy")
    assert(zy < sy / 2, "z-order must at least halve the unclustered dim's span")
  }

  test("zorderBy validates arguments") {
    intercept[IllegalArgumentException](Layout.zorderBy(grid, Seq.empty, 4))
    intercept[IllegalArgumentException](Layout.zorderBy(grid, Seq("x"), 0))
    intercept[IllegalArgumentException](Layout.zorderBy(grid, Seq("x", "y"), 4, bits = 32))
  }

  test("constant and null-stat columns degrade safely") {
    val df  = grid.withColumn("c", lit(7))
    val out = Layout.zorderBy(df, Seq("x", "c"), numPartitions = 4)
    assert(out.count() === 1024L)
  }

  test("writeClustered sizes files toward the target and preserves content") {
    val dir = tempDir("layout") + "/clustered"
    val n = Layout.writeClustered(grid, dir, Seq("x", "y"), targetFileMB = 1)
    assert(n >= 1, "partition count derives from plan-stats bytes / target")
    val back = spark.read.parquet(dir)
    assert(back.count() === 1024L)
    val files = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files === n, s"one file per chosen partition: files=$files n=$n")
    intercept[IllegalArgumentException](
      Layout.writeClustered(grid, dir, Seq("x"), targetFileMB = 0))
  }

  test("writeClustered bloomCols: footer carries a bloom filter for the requested column only") {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val dir = tempDir("layout-bloom") + "/clustered"
    Layout.writeClustered(grid, dir, Seq("x", "y"), targetFileMB = 1, bloomCols = Seq("rid"))
    val conf = spark.sparkContext.hadoopConfiguration
    val file = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet")).head
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(file.getAbsolutePath), conf))
    try {
      val rg = reader.getRowGroups.get(0)
      def bloomOf(name: String) = {
        val cc = rg.getColumns.asScala.find(_.getPath.toDotString == name).get
        reader.readBloomFilter(cc)
      }
      assert(bloomOf("rid") != null, "requested column must carry a bloom filter")
      assert(bloomOf("x") == null, "unrequested columns must not pay bloom bytes")
    } finally reader.close()
  }

  test("null values sort at the column's low edge, not into one null-key partition") {
    // y is NULL on every 4th row; a NULL z-key would dump all of them into
    // one range partition with full-width x spans — instead they must key
    // as y=lo and leave x clustering intact
    val df = grid.withColumn("y", when(col("rid") % 4 === 0, lit(null)).otherwise(col("y")))
    val out = Layout.zorderBy(df, Seq("x", "y"), numPartitions = 16)
    assert(out.count() === 1024L)
    val nullSpread = out.withColumn("_pid", spark_partition_id())
      .where(col("y").isNull).select("_pid").distinct().count()
    assert(nullSpread > 4, s"null-y rows must spread across partitions by x, got $nullSpread")
    // x pruning must survive for the null-bearing rows
    val xSpan = Layout.partitionSpans(out.where(col("y").isNull), Seq("x"))
      .agg(avg(col("hi_x") - col("lo_x"))).head().getDouble(0)
    assert(xSpan < 24.0, s"x spans for null-y rows should stay clustered, got $xSpan")
  }

  test("date columns cluster via their epoch-day view") {
    val df = grid.withColumn("d", date_add(lit(java.sql.Date.valueOf("2020-01-01")), col("x").cast("int")))
    val out = Layout.zorderBy(df, Seq("d", "y"), numPartitions = 8)
    assert(out.count() === 1024L)
    // the date dim must actually discriminate: per-partition day spans are
    // narrower than the 31-day full range
    val span = Layout.partitionSpans(out, Seq("d"))
      .agg(avg(col("hi_d") - col("lo_d"))).head().getDouble(0)
    assert(span < 24.0, s"date spans should be clustered, got $span")
  }
}
