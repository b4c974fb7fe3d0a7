package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.TextAnalysis

/** One (bucket, fingerprint, doc) row entering the stateful dedup. */
case class FpRow(bucket: Int, fp: String, doc_id: Long)

/** Per-bucket dedup state: the fingerprints this bucket has ever seen.
  * A case class (not a bare Set) so the state rides the product encoder.
  */
case class FpBucketState(fps: Seq[String])

/** Per-bucket state for the retention-windowed variant: fingerprint →
  * latest event time it was seen at (epoch ms).
  */
case class FpTimedBucketState(fps: Seq[String], times: Seq[Long])

/** The operator's verdict for one document. */
case class FpVerdict(doc_id: Long, fp: String, novel: Boolean)

/** Exact streaming dedup as a genuine stateful streaming OPERATOR —
  * `flatMapGroupsWithState` over fingerprint buckets — rather than
  * [[StreamingDedupIngest]]'s foreachBatch-against-state-tables loop.
  * Use this one when dedup is a stage INSIDE a streaming pipeline (the
  * verdict stream feeds further streaming transforms); use the ingest
  * when dedup IS the pipeline and the corpus tables are the product.
  *
  * Semantics: a document is `novel` iff its content fingerprint
  * ([[TextAnalysis.fingerprint]] — md5 of normalized text, engine-portable)
  * has never been seen in any earlier micro-batch, AND it is the minimum
  * `doc_id` holding that fingerprint within its own batch (deterministic
  * intra-batch winner — iterator order never decides). Exactly-once state
  * updates come from the engine's state store + checkpoint.
  *
  * 100-TB shape: state is partitioned by `bucket = hash(fp) mod numBuckets`
  * — each task holds only its buckets' fingerprint sets, and `numBuckets`
  * spreads the corpus across the cluster (size it ≥ shuffle parallelism).
  * Per-doc state is one 32-char fingerprint (~40 B); a 100-billion-doc
  * corpus is ~4 TB of state — RocksDB state store territory
  * (`spark.sql.streaming.stateStore.providerClass`), not heap. For
  * bounded-memory at any corpus size, swap the exact set for a Bloom
  * filter per bucket (same operator shape, documented false-positive rate
  * drops true novels); the exact set is the default because dedup
  * false-positives silently shrink the corpus. The per-call group buffer
  * is one BATCH's rows for one bucket (micro-batch-bounded), not the
  * corpus.
  *
  * Batch face: `flatMapGroupsWithState` also runs on a batch Dataset
  * (state starts empty, each group processed once), where the verdict
  * reduces to `doc_id = min(doc_id) over fingerprint` — the SQL-checkable
  * contract the driver oracle verifies (q90); the cross-batch state path
  * is spec-asserted with MemoryStream.
  */
object StreamingFpDedup {

  /** Bounded-memory per-bucket state for [[StreamingFpDedup.verdictsBloom]]:
    * a serialized `org.apache.spark.util.sketch.BloomFilter` over the
    * fingerprints the bucket has seen.
    */
  case class BloomBucketState(bytes: Array[Byte])

  /** The verdict stream/frame for `docs` (streaming or batch). */
  def verdicts(
      spark: SparkSession,
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      numBuckets: Int = 64
  ): Dataset[FpVerdict] = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    import spark.implicits._
    val fp = TextAnalysis.fingerprint(col(textCol))
    val rows = docs.select(
      pmod(xxhash64(fp), lit(numBuckets)).cast("int").as("bucket"),
      fp.as("fp"),
      col(idCol).cast("long").as("doc_id")).as[FpRow]
    rows
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[FpBucketState, FpVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Int, it: Iterator[FpRow], state: GroupState[FpBucketState]) =>
          val seen  = state.getOption.map(_.fps.toSet).getOrElse(Set.empty[String])
          val batch = it.toVector // one micro-batch × one bucket — bounded
          val winners = batch.groupBy(_.fp).map { case (f, rs) => f -> rs.map(_.doc_id).min }
          val out = batch.sortBy(r => (r.doc_id, r.fp)).map { r =>
            FpVerdict(r.doc_id, r.fp, novel = !seen.contains(r.fp) && winners(r.fp) == r.doc_id)
          }
          state.update(FpBucketState((seen ++ batch.map(_.fp)).toSeq))
          out.iterator
      }
  }

  /** Retention-windowed variant of [[verdicts]] — "novel unless seen
    * within the last `retentionMs` of EVENT time" (rolling-window dedup:
    * news/alert feeds where a re-published document after the window
    * legitimately counts as new content, and where unbounded state would
    * otherwise grow forever). State per bucket is fingerprint → latest
    * event time; entries older than `retentionMs` behind the bucket's max
    * observed event time are PRUNED on every invocation, so state is
    * bounded by the window's content — the hand-rolled analogue of
    * watermark state expiry, driven by event time so replays are
    * deterministic (processing-time expiry would not be).
    *
    * Verdict: novel ⇔ no sighting of the fingerprint within `retentionMs`
    * BEFORE this row — across batches via state, within the batch by
    * event-time order (ties by doc_id, so equal-time duplicates resolve
    * to the min doc_id exactly like [[verdicts]]; a batch spanning more
    * than one window resolves left to right, so a gap wider than the
    * window inside one batch re-admits the fingerprint). A dup sighting
    * RE-STAMPS the fingerprint (sliding, not tumbling, window).
    */
  def verdictsWithin(
      spark: SparkSession,
      docs: DataFrame,
      timeCol: String,
      retentionMs: Long,
      textCol: String = "text",
      idCol: String = "doc_id",
      numBuckets: Int = 64
  ): Dataset[FpVerdict] = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    require(retentionMs > 0, s"retentionMs must be positive, got $retentionMs")
    import spark.implicits._
    val fp = TextAnalysis.fingerprint(col(textCol))
    val rows = docs.select(
      pmod(xxhash64(fp), lit(numBuckets)).cast("int").as("bucket"),
      fp.as("fp"),
      col(idCol).cast("long").as("doc_id"),
      col(timeCol).cast("long").as("t"))
      .map(r => (r.getInt(0), FpRow(r.getInt(0), r.getString(1), r.getLong(2)), r.getLong(3)))
    rows
      .groupByKey(_._1)
      .flatMapGroupsWithState[FpTimedBucketState, FpVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Int, it: Iterator[(Int, FpRow, Long)], state: GroupState[FpTimedBucketState]) =>
          val last = scala.collection.mutable.Map.empty[String, Long]
          state.getOption.foreach(s => s.fps.zip(s.times).foreach { case (f, t) => last(f) = t })
          // resolve the batch in (event time, doc_id) order so an
          // over-window-long batch behaves exactly like smaller batches
          val batch = it.map { case (_, r, t) => (r, t) }.toVector
            .sortBy { case (r, t) => (t, r.doc_id, r.fp) }
          val out = batch.map { case (r, t) =>
            val seenRecently = last.get(r.fp).exists(prev => t - prev <= retentionMs)
            last(r.fp) = math.max(t, last.getOrElse(r.fp, Long.MinValue))
            FpVerdict(r.doc_id, r.fp, novel = !seenRecently)
          }
          val horizon = if (last.isEmpty) Long.MinValue
            else last.values.max - retentionMs
          val kept = last.toSeq.filter(_._2 >= horizon)
          state.update(FpTimedBucketState(kept.map(_._1), kept.map(_._2)))
          out.iterator
      }
  }

  /** Bounded-memory variant of [[verdicts]]: per-bucket state is a Bloom
    * filter (`expectedItemsPerBucket`, `fpp`) instead of the exact
    * fingerprint set, so state size is FIXED at
    * `numBuckets × bloomBytes(expectedItemsPerBucket, fpp)` regardless of
    * corpus size. The trade is one-sided and must be chosen deliberately:
    * a Bloom false positive marks a genuinely novel document as a dup and
    * silently drops it from the corpus (expected loss ≈ fpp of novel
    * docs), while dup→novel errors cannot happen — the same asymmetry as
    * the bloom prune in `Dedup.incrementalFromSketches`, but there the
    * filter only PRE-prunes ahead of an exact verify, so it costs nothing;
    * here it IS the verdict. Use [[verdicts]] (exact, RocksDB-backed)
    * unless state size is the binding constraint. Past
    * `expectedItemsPerBucket` insertions the realized fp rate degrades
    * above `fpp` — size it to the corpus ceiling.
    *
    * Intra-batch semantics match [[verdicts]] exactly (min-doc_id winner
    * per fingerprint, deterministic); only the cross-batch membership test
    * is approximate.
    */
  def verdictsBloom(
      spark: SparkSession,
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      numBuckets: Int = 64,
      expectedItemsPerBucket: Long = 1000000L,
      fpp: Double = 1e-6
  ): Dataset[FpVerdict] = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    import spark.implicits._
    import org.apache.spark.util.sketch.BloomFilter
    val fp = TextAnalysis.fingerprint(col(textCol))
    val rows = docs.select(
      pmod(xxhash64(fp), lit(numBuckets)).cast("int").as("bucket"),
      fp.as("fp"),
      col(idCol).cast("long").as("doc_id")).as[FpRow]
    rows
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[BloomBucketState, FpVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Int, it: Iterator[FpRow], state: GroupState[BloomBucketState]) =>
          val bloom = state.getOption match {
            case Some(s) => BloomFilter.readFrom(new java.io.ByteArrayInputStream(s.bytes))
            case None    => BloomFilter.create(expectedItemsPerBucket, fpp)
          }
          val batch = it.toVector
          val winners = batch.groupBy(_.fp).map { case (f, rs) => f -> rs.map(_.doc_id).min }
          val out = batch.sortBy(r => (r.doc_id, r.fp)).map { r =>
            FpVerdict(r.doc_id, r.fp,
              novel = !bloom.mightContainString(r.fp) && winners(r.fp) == r.doc_id)
          }
          batch.foreach(r => bloom.putString(r.fp))
          val bos = new java.io.ByteArrayOutputStream()
          bloom.writeTo(bos)
          state.update(BloomBucketState(bos.toByteArray))
          out.iterator
      }
  }
}
