package graft.io

import graft.SparkSpec
import graft.graph.EdgeStore
import graft.rules.EdgeColumns
import org.apache.spark.sql.functions._

/** Crash-safety of the maintenance swaps: inject a crash at every step
  * boundary of [[AtomicSwap.swapIn]] and assert a complete copy of the
  * store's rows survives, invisible scratch dirs stay invisible, and the
  * next maintenance call heals whatever dangled.
  */
class AtomicSwapSpec extends SparkSpec {

  private case class Boom(step: String) extends RuntimeException(step)

  private def crashAt(step: String): AtomicSwap.Hooks = new AtomicSwap.Hooks {
    override def beforeAside(): Unit   = if (step == "aside") throw Boom(step)
    override def beforeSwapIn(): Unit  = if (step == "swapIn") throw Boom(step)
    override def beforeCleanup(): Unit = if (step == "cleanup") throw Boom(step)
  }

  private def edges(n: Int) = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, (i + 100).toLong, 1)).toDF(EdgeColumns.all: _*)
  }

  private def rows(store: EdgeStore): Set[Long] =
    store.read("sim").select(EdgeColumns.Src).collect().map(_.getLong(0)).toSet

  test("crash before rename-aside leaves the live store untouched") {
    val base  = tempDir("swap-a")
    val store = new EdgeStore(spark, s"$base/edges")
    store.write(edges(10), "sim")
    val before = rows(store)
    intercept[Boom] { store.compact("sim", hooks = crashAt("aside")) }
    assert(rows(store) == before)
    // the scratch orphan is dot-prefixed: a fresh read never lists it
    store.compact("sim") // next maintenance completes and cleans up
    assert(rows(store) == before)
  }

  test("crash between renames: live name dangles but the aside copy is complete; next call heals") {
    val base  = tempDir("swap-b")
    val store = new EdgeStore(spark, s"$base/edges")
    store.write(edges(10), "sim")
    val before = rows(store)
    intercept[Boom] { store.compact("sim", hooks = crashAt("swapIn")) }
    // the pre-swap copy survives in full in the aside dir
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val aside = new org.apache.hadoop.fs.Path(s"$base/edges/.label=sim.old")
    assert(fs.exists(aside), "aside dir must hold the complete pre-swap copy")
    assert(spark.read.parquet(aside.toString).count() == 10)
    // the next maintenance call heals first, then completes normally
    store.compact("sim")
    assert(rows(store) == before)
  }

  test("crash after rename-in: the NEW store is live; the orphan is invisible and cleaned later") {
    val base  = tempDir("swap-c")
    val store = new EdgeStore(spark, s"$base/edges")
    store.write(edges(10), "sim")
    val before = rows(store)
    intercept[Boom] { store.compact("sim", hooks = crashAt("cleanup")) }
    assert(rows(store) == before, "new store must already be live")
    store.compact("sim") // cleans the leftover aside dir
    assert(rows(store) == before)
  }

  test("deleteForVertices swaps crash-safely too") {
    import spark.implicits._
    val base  = tempDir("swap-d")
    val store = new EdgeStore(spark, s"$base/edges")
    store.write(edges(10), "sim")
    intercept[Boom] {
      store.deleteForVertices("sim", Seq(1L, 2L).toDF("id"), hooks = crashAt("swapIn"))
    }
    // heal + redo: rows 1,2 gone, the rest intact
    store.deleteForVertices("sim", Seq(1L, 2L).toDF("id"))
    assert(rows(store) == (3L to 10L).toSet)
  }

  private def partFiles(base: String): Set[String] = {
    val fs  = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(s"$base/edges/label=sim")
    fs.listStatus(dir).map(_.getPath.getName).filter(_.startsWith("part-")).toSet
  }

  test("restricted delete rewrites only the files holding incident edges") {
    import spark.implicits._
    val base  = tempDir("rdel-a")
    val store = new EdgeStore(spark, s"$base/edges")
    // three append batches → three disjoint file groups
    store.write((1 to 10).map(i => (i.toLong, (i + 100).toLong, 1)).toDF(EdgeColumns.all: _*), "sim")
    val filesA = partFiles(base)
    store.write((21 to 30).map(i => (i.toLong, (i + 100).toLong, 1)).toDF(EdgeColumns.all: _*), "sim")
    val filesB = partFiles(base) -- filesA
    store.write((41 to 50).map(i => (i.toLong, (i + 100).toLong, 1)).toDF(EdgeColumns.all: _*), "sim")
    val filesC = partFiles(base) -- filesA -- filesB
    assert(filesA.nonEmpty && filesB.nonEmpty && filesC.nonEmpty)

    // doom vertices living only in batch A (src 1,2 and dst 105)
    store.deleteForVerticesRestricted("sim", Seq(1L, 2L, 105L).toDF("id"))
    val after = partFiles(base)
    assert((filesB ++ filesC).subsetOf(after),
      s"untouched batches' files must survive byte-identical: missing ${(filesB ++ filesC) -- after}")
    assert((filesA intersect after).isEmpty,
      s"batch A's originals must be replaced: ${filesA intersect after}")
    assert(rows(store) == ((3L to 10L).toSet - 5L) ++ (21L to 30L) ++ (41L to 50L),
      s"got ${rows(store)}")

    // no incident edges anywhere → nothing is rewritten at all
    val stable = partFiles(base)
    store.deleteForVerticesRestricted("sim", Seq(9999L).toDF("id"))
    assert(partFiles(base) == stable, "a no-op delete must not touch any file")
  }

  test("restricted delete ≡ full-rewrite delete on the same store") {
    import spark.implicits._
    def freshStore(tag: String): EdgeStore = {
      val store = new EdgeStore(spark, s"${tempDir(s"rdel-eq-$tag")}/edges")
      store.write(edges(30), "sim")
      store.write((31 to 60).map(i => (i.toLong, (i % 7).toLong, 1)).toDF(EdgeColumns.all: _*), "sim")
      store
    }
    val doomed = Seq(3L, 4L, 40L, 133L).toDF("id")
    val a = freshStore("r"); a.deleteForVerticesRestricted("sim", doomed)
    val b = freshStore("f"); b.deleteForVertices("sim", doomed)
    def all(s: EdgeStore) = s.read("sim").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(all(a) == all(b), s"restricted=${all(a).size} full=${all(b).size}")
  }

  test("restricted delete: crash before the commit marker rolls back completely") {
    import spark.implicits._
    val base  = tempDir("rdel-b")
    val store = new EdgeStore(spark, s"$base/edges")
    store.write(edges(10), "sim")
    val before      = rows(store)
    val filesBefore = partFiles(base)
    for (step <- Seq("aside", "swapIn")) {
      intercept[Boom] {
        store.deleteForVerticesRestricted("sim", Seq(1L, 2L).toDF("id"), hooks = crashAt(step))
      }
      assert(rows(store) == before, s"crash at $step must leave the live rows untouched")
      assert(partFiles(base) == filesBefore, s"crash at $step must leave the live files untouched")
    }
    // the next call heals (rollback) then completes
    store.deleteForVerticesRestricted("sim", Seq(1L, 2L).toDF("id"))
    assert(rows(store) == (3L to 10L).toSet)
  }

  test("restricted delete: crash after the commit marker rolls forward on the next maintenance call") {
    import spark.implicits._
    val base  = tempDir("rdel-c")
    val store = new EdgeStore(spark, s"$base/edges")
    store.write(edges(10), "sim")
    intercept[Boom] {
      store.deleteForVerticesRestricted("sim", Seq(1L, 2L).toDF("id"), hooks = crashAt("cleanup"))
    }
    // committed but uncleaned: survivors are in, originals linger — the
    // next maintenance call must finish the delete, not resurrect rows
    store.deleteForVerticesRestricted("sim", Seq(1L, 2L).toDF("id"))
    assert(rows(store) == (3L to 10L).toSet, s"got ${rows(store)}")
    // and compaction also heals restricted-delete debris before rewriting
    intercept[Boom] {
      store.deleteForVerticesRestricted("sim", Seq(3L).toDF("id"), hooks = crashAt("cleanup"))
    }
    store.compact("sim")
    assert(rows(store) == (4L to 10L).toSet, s"got ${rows(store)}")
  }

  test("concurrent maintenance on one dir fails fast instead of interleaving") {
    val base  = tempDir("swap-lock")
    val store = new EdgeStore(spark, s"$base/edges")
    store.write(edges(10), "sim")
    val before = rows(store)
    val fs  = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(s"$base/edges/label=sim")

    // writer A holds the lock; writer B's compact must refuse up front —
    // before touching scratch or aside dirs
    AtomicSwap.withMaintenanceLock(fs, dir) {
      val ex = intercept[AtomicSwap.ConcurrentMaintenanceException] { store.compact("sim") }
      assert(ex.getMessage.contains("lock"), ex.getMessage)
      assert(rows(store) == before, "refused maintenance must not have touched the store")
    }
    // lock released on A's exit: maintenance proceeds again
    store.compact("sim")
    assert(rows(store) == before)
  }

  test("the maintenance lock is released when the body fails (crashed-swap heal still works)") {
    val base  = tempDir("swap-lock-rel")
    val store = new EdgeStore(spark, s"$base/edges")
    store.write(edges(10), "sim")
    val before = rows(store)
    intercept[Boom] { store.compact("sim", hooks = crashAt("swapIn")) }
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(AtomicSwap.lockPath(new org.apache.hadoop.fs.Path(s"$base/edges/label=sim"))),
      "lock must not outlive the failed call")
    store.compact("sim") // heals and completes — not blocked by a stale lock
    assert(rows(store) == before)
  }

  test("IdManager.compactPartitions heals a partition that crashed mid-swap") {
    import spark.implicits._
    val dir = tempDir("swap-e")
    val mgr = new graft.ids.IdManager(spark, graft.ids.IdManagerConfig(dir, "t", reservedIdSpace = 0))
    val alerts = (1 to 6).map(i =>
      graft.Alert.gen(i.toLong, s"obj$i", 0.1, 0.1, 0, 0.5f, "Unknown", None, None))
    mgr.process(alerts.toDF().drop("id"))
    val pm = graft.io.PartitionManager.forRange("2019-02-01", 1)
    intercept[Boom] { mgr.compactPartitions(pm, hooks = crashAt("swapIn")) }
    // the partition dangles under its live name — the next maintenance run
    // heals it before probing, so it is not skipped forever
    mgr.compactPartitions(pm)
    val schema = alerts.toDF().drop("id").schema
    assert(mgr.readAll(schema).count() == 6)
  }
  // --- LshIndex.append marker protocol (the store now feeds two
  // oracle-gated consumers — q378 labels, q382 decontamination — so a
  // torn append must be invisible, not just documented) ---

  private def lshDocs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def lshFixture(tag: String): (graft.ops.Dedup.LshIndex, String) = {
    val idx = graft.ops.Dedup.LshIndex(numHashes = 16, shingleWidth = 3)
    val path = tempDir(s"lsh-crash-$tag") + "/index"
    idx.save(lshDocs(
      1L -> "the quick brown fox jumps over the lazy dog tonight",
      2L -> "completely unrelated text about spark physical planning"), path)
    (idx, path)
  }

  private val lshBatch = () => lshDocs(
    10L -> "the quick brown fox jumps over the lazy dog tonight",
    11L -> "a fresh paragraph on columnar shuffle layouts and codecs")
  private val lshLate = () => lshDocs(
    20L -> "a fresh paragraph on columnar shuffle layouts and codecs")

  private def lshHits(idx: graft.ops.Dedup.LshIndex, path: String,
      df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    idx.probe(spark, path, df, bands = 4, verifyThreshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("LshIndex.append crash BEFORE the commit marker: store untouched, batch invisible, re-append heals") {
    val (idx, path) = lshFixture("pre")
    intercept[Boom] { idx.append(spark, path, lshBatch(), hooks = crashAt("aside")) }
    // the torn batch is invisible: 20 only matches 11, which never committed
    assert(lshHits(idx, path, lshLate()).isEmpty, "uncommitted batch must not serve")
    // the pre-append corpus still serves exactly
    assert(lshHits(idx, path, lshBatch()) == Set((10L, 1L)))
    // the next append heals (rolls the scratch back) and lands the batch
    idx.append(spark, path, lshBatch())
    assert(lshHits(idx, path, lshLate()) == Set((20L, 11L)))
    graft.Caches.clear()
  }

  test("LshIndex.append crash AFTER the marker: batch already probe-visible; compact rolls forward") {
    val (idx, path) = lshFixture("post")
    intercept[Boom] { idx.append(spark, path, lshBatch(), hooks = crashAt("swapIn")) }
    // committed: every part-file still sits in scratch, yet the probe
    // unions it in — the whole batch serves, nothing is torn
    assert(lshHits(idx, path, lshLate()) == Set((20L, 11L)),
      "a committed batch must serve even before any rename")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$path/.sigs.appendcommit")))
    // roll forward via the next maintenance op; results identical, protocol files gone
    idx.compact(spark, path)
    assert(lshHits(idx, path, lshLate()) == Set((20L, 11L)))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/.sigs.appendcommit")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/.sigs.appendrows")))
    graft.Caches.clear()
  }

  test("LshIndex.append crash mid-cleanup: serves correctly; the next append is unscathed") {
    val (idx, path) = lshFixture("mid")
    intercept[Boom] { idx.append(spark, path, lshBatch(), hooks = crashAt("cleanup")) }
    assert(lshHits(idx, path, lshLate()) == Set((20L, 11L)))
    // heal is idempotent: the next append clears the leftover marker and
    // the already-renamed files are not double-counted
    idx.append(spark, path, lshLate())
    val sigs = spark.read.parquet(s"$path/sigs")
    assert(sigs.count() == 5L, "2 corpus + 2 batch + 1 late, each exactly once")
    assert(sigs.select("id").distinct().count() == 5L)
    graft.Caches.clear()
  }

}
