package graft.ids

import org.apache.spark.sql.functions._

import graft.{Alert, SparkSpec}

/** Mirrors the reference's IDManagerSparkServiceSpec: reservedIdSpace
  * fallback; contiguous ids continuing from the previous max.
  */
class IdManagerSpec extends SparkSpec {

  private def alerts(n: Int, startId: Long = 0): Seq[Alert] =
    (1 to n).map(i => Alert.gen(startId + i, s"obj$i", 0.1, 0.1, 0, 0.5f, "Unknown", None, None))

  test("zipWithIndex assigns dense contiguous ids from offset+1") {
    import spark.implicits._
    val df = alerts(5).toDF().repartition(3)
    val withIds = ZipWithIndex.zipWithIndex(df, offset = 7)
    val ids = withIds.select("id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(8L, 9L, 10L, 11L, 12L))
    assert(withIds.columns.head == "id")
    assert(withIds.count() == 5)
  }

  test("zipWithIndex replaces an existing id column") {
    import spark.implicits._
    val df = alerts(3).toDF()
    val withIds = ZipWithIndex.zipWithIndex(df, offset = 100)
    assert(withIds.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(101L, 102L, 103L))
    assert(withIds.columns.count(_ == "id") == 1)
  }

  test("fetchId returns reservedIdSpace for an empty table") {
    import spark.implicits._
    val mgr = new IdManager(spark, IdManagerConfig(tempDir("idm"), "t", reservedIdSpace = 200))
    val loaded = mgr.readAll(alerts(1).toDF().drop("id").schema)
    assert(loaded.isEmpty)
    assert(loaded.columns.head == "id")
    assert(mgr.fetchId(loaded) == 200L)
  }

  test("process stamps ids, appends partitioned, and continues across runs") {
    import spark.implicits._
    val mgr = new IdManager(spark, IdManagerConfig(tempDir("idm2"), "t", reservedIdSpace = 7))

    val day1 = alerts(5).toDF().drop("id")
    val r1   = mgr.process(day1)
    val ids1 = r1.current.select("id").collect().map(_.getLong(0)).sorted
    assert(ids1.toSeq == (8L to 12L))
    assert(r1.loaded.isEmpty)

    val day2 = alerts(3).toDF().drop("id").withColumn("day", lit(2))
    val r2   = mgr.process(day2)
    val ids2 = r2.current.select("id").collect().map(_.getLong(0)).sorted
    assert(ids2.toSeq == (13L to 15L))
    assert(r2.loaded.count() == 5)

    // table now holds both days, partition-pruned reads work
    val all = mgr.readAll(day1.schema)
    assert(all.count() == 8)
    assert(all.where(col("day") === 2).count() == 3)
  }

  test("deletePartitions drops matching partition dirs") {
    import spark.implicits._
    val dir = tempDir("idm3")
    val mgr = new IdManager(spark, IdManagerConfig(dir, "t"))
    mgr.process(alerts(4).toDF().drop("id"))
    assert(mgr.readAll(alerts(1).toDF().drop("id").schema).count() == 4)
    mgr.deletePartitions(Seq((2019, 2, 1)))
    assert(mgr.readAll(alerts(1).toDF().drop("id").schema).isEmpty)
  }
}
