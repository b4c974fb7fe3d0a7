package graft.ids

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.DenseId

import graft.SparkSpec

class DenseIdSpec extends SparkSpec {

  test("custom-operator ids are dense, contiguous, offset-continued") {
    import spark.implicits._
    val df  = (1 to 97).map(i => (s"v$i", i)).toDF("name", "n")
    val out = DenseId.assign(df.repartition(7), offset = 200)
    val ids = out.select("id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (201L to 297L))
    assert(out.columns.head == "id")
  }

  test("matches the public-API ZipWithIndex on a deterministically sorted input") {
    import spark.implicits._
    val df = (1 to 50).map(i => (i.toLong, s"row$i")).toDF("k", "v").orderBy("k")
    val a = DenseId.assign(df, offset = 10).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = ZipWithIndex.zipWithIndex(df, offset = 10).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("replaces an existing id column and plans the custom exec node") {
    import spark.implicits._
    val df  = Seq((99L, "a"), (98L, "b")).toDF("id", "v")
    val out = DenseId.assign(df, offset = 0)
    assert(out.columns.toSeq == Seq("id", "v"))
    assert(out.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    assert(out.queryExecution.executedPlan.toString.contains("DenseId"))
  }

  test("column pruning flows through the operator to the scan") {
    import spark.implicits._
    val dir = tempDir("denseid") + "/t"
    (1 to 10).map(i => (i, s"a$i", s"b$i", s"c$i")).toDF("n", "a", "b", "c")
      .write.parquet(dir)
    val out = DenseId.assign(spark.read.parquet(dir), offset = 0).select("id", "n")
    val scan = out.queryExecution.executedPlan.toString
    // only `n` should be read from parquet, not a/b/c
    assert(scan.contains("ReadSchema: struct<n:int>"), scan.linesIterator.filter(_.contains("ReadSchema")).mkString)
  }
}
