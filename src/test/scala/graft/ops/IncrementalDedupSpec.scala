package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BloomFilterOps

class IncrementalDedupSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    val base = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"),
      (1L, "pack my box with five dozen liquor jugs before the party"),
      (2L, "sphinx of black quartz judge my vow said the librarian"),
      (3L, "how vexingly quick daft zebras jump over the old fence"),
      // 10: near-dup of 0, 11: near-dup of 2, 12: unrelated
      (10L, "the quick brown fox jumps over the lazy dog again and AGAIN"),
      (11L, "sphinx of black quartz judge my vow said the librarian twice"),
      (12L, "completely novel content that matches nothing in the history")
    )
    base.toDF("doc_id", "text")
  }

  test("bloom filter: no false negatives over inserted keys") {
    import spark.implicits._
    val keys = (0L until 5000L).toDF("k")
    val bloom = BloomFilterOps.build(keys, Seq(col("k"))).get
    val misses = keys.where(!BloomFilterOps.mightContain(bloom, Seq(col("k")))).count()
    assert(misses == 0, "a bloom filter must never report an inserted key absent")
    // disjoint keys mostly rejected (fp rate far below 50%)
    val other = (100000L until 105000L).toDF("k")
    val fp = other.where(BloomFilterOps.mightContain(bloom, Seq(col("k")))).count()
    assert(fp < 500, s"false-positive rate implausibly high: $fp/5000")
  }

  test("bloom build on an empty frame returns None") {
    import spark.implicits._
    assert(BloomFilterOps.build(Seq.empty[Long].toDF("k"), Seq(col("k"))).isEmpty)
  }

  test("incremental minhash finds the new docs near-dupping history, exactly") {
    val newBatch = docs.where(col("doc_id") >= 10)
    val history  = docs.where(col("doc_id") < 10)
    val out = Dedup.incrementalMinhash(newBatch, history, verifyThreshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((10L, 0L), (11L, 2L)), s"got $out")
  }

  test("bloom prune does not change the result vs the unfiltered band join") {
    val newBatch = docs.where(col("doc_id") >= 10)
    val history  = docs.where(col("doc_id") < 10)
    val withBloom = Dedup.incrementalMinhash(newBatch, history, verifyThreshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // unfiltered reference: full-corpus LSH pairs restricted to the split
    val full = Dedup.minhashLsh(docs, numHashes = 16, bands = 4, verifyThreshold = 0.5)
      .where(col("id_a") < 10 && col("id_b") >= 10)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getDouble(2))).toSet
    assert(withBloom == full)
  }

  test("prebuilt history bands give the same result as in-query banding") {
    val newBatch = docs.where(col("doc_id") >= 10)
    val history  = docs.where(col("doc_id") < 10)
    val prebuilt = Dedup.bandedMinhash(history, numHashes = 16, bands = 4)
    val viaPrebuilt = Dedup.incrementalMinhash(newBatch, history, verifyThreshold = 0.5,
        historyBanded = Some(prebuilt))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val inline = Dedup.incrementalMinhash(newBatch, history, verifyThreshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaPrebuilt == inline)
  }

  test("prebuilt history sketch tables (bands + shingle sets) give the same result") {
    val newBatch = docs.where(col("doc_id") >= 10)
    val history  = docs.where(col("doc_id") < 10)
    // the deployment shape: both sketch tables maintained on disk, the
    // history documents themselves never touched
    val sigs = Dedup.minhashSignatures(history, "text", "doc_id", 16, 3, XxHash)
    val viaTables = Dedup.incrementalMinhash(
        newBatch, history.limit(0), verifyThreshold = 0.5,
        historyBanded = Some(Dedup.bandBuckets(sigs, 16, 4, XxHash)),
        historySh = Some(sigs.select(col("id"), col("sh"))))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val inline = Dedup.incrementalMinhash(newBatch, history, verifyThreshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaTables == inline)
  }

  test("band frames are slim: (id, band, bucket) only, no shingle payload") {
    val banded = Dedup.bandedMinhash(docs, numHashes = 16, bands = 4)
    assert(banded.columns.toSeq == Seq("id", "band", "bucket"),
      s"band rows must not duplicate per-document payloads: ${banded.columns.toSeq}")
    assert(banded.count() == docs.count() * 4)
  }

  test("empty new batch yields an empty result, not a full-history scan crash") {
    val out = Dedup.incrementalMinhash(docs.where(col("doc_id") < 0), docs)
    assert(out.count() == 0)
  }

  test("plan shape: history bands bloom-filtered below the band join; sh re-attach semi-pruned") {
    val newBatch = docs.where(col("doc_id") >= 10)
    val history  = docs.where(col("doc_id") < 10)
    val plan = Dedup.incrementalMinhash(newBatch, history, verifyThreshold = 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"expected the bloom predicate in the history band-scan path:\n$plan")
    assert(plan.contains("LeftSemi"),
      s"expected the candidate-id semi-join prune on the history shingle sets:\n$plan")
  }
}
