package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.TextAnalysis

/** One (fingerprint, doc) row entering the stateful dedup. */
case class FpRow(fp: String, doc_id: Long)

/** One (fingerprint, doc, event time) row for the retention-windowed variant.
  * `event_ts` carries `t + 1` as a TimestampType column: the watermark that
  * drives EventTimeTimeout is a tag on that column, so it must flow into
  * the stateful operator's input — projecting it away would strip it. The
  * +1 ms shift keeps a legitimate first event at t=0 strictly above the
  * engine's initial watermark of 0 (rows at or below the watermark are
  * dropped before the operator sees them).
  */
case class FpTimedRow(fp: String, doc_id: Long, t: Long, event_ts: java.sql.Timestamp)

/** Row shape for [[StreamingFpDedup.verdictsBloom]] — bucket-keyed by
  * design (the Bloom filter is inherently one blob per bucket).
  */
case class FpBucketRow(bucket: Int, fp: String, doc_id: Long)

/** Per-fingerprint dedup state: the fingerprint has been seen. A one-field
  * case class (not Unit) so the state rides the product encoder.
  */
case class FpSeenState(seen: Boolean)

/** Per-fingerprint state for the retention-windowed variant: the latest
  * event time this fingerprint was seen at (epoch ms).
  */
case class FpLastSeenState(last: Long)

/** The operator's verdict for one document. */
case class FpVerdict(doc_id: Long, fp: String, novel: Boolean)

/** Exact streaming dedup as a genuine stateful streaming OPERATOR —
  * `flatMapGroupsWithState` keyed by content fingerprint — rather than
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
  * 100-TB shape: state is keyed per FINGERPRINT — the same state layout as
  * Spark's own streaming `dropDuplicates` — so each state-store entry is
  * one 32-char key plus a one-byte value (~40 B), and a micro-batch only
  * touches the entries of fingerprints it actually contains. The earlier
  * design (state = one Seq blob per hash bucket) deserialized and rewrote
  * `corpus/numBuckets` bytes of state for EVERY bucket hit in EVERY batch
  * — O(corpus) state churn per batch at scale; per-fingerprint keying
  * makes state churn O(batch). A 100-billion-doc corpus is ~4 TB of state
  * spread across the shuffle partitions — RocksDB state store territory
  * (`spark.sql.streaming.stateStore.providerClass`), not heap. For
  * bounded-memory at any corpus size, [[verdictsBloom]] swaps the exact
  * per-fingerprint entries for a fixed-size Bloom filter per bucket
  * (documented false-positive trade); the exact operator is the default
  * because dedup false-positives silently shrink the corpus. The per-call
  * group buffer is one BATCH's rows for one fingerprint (micro-batch-
  * bounded), not the corpus.
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
      idCol: String = "doc_id"
  ): Dataset[FpVerdict] = {
    import spark.implicits._
    val fp = TextAnalysis.fingerprint(col(textCol))
    val rows = docs.select(
      fp.as("fp"),
      col(idCol).cast("long").as("doc_id")).as[FpRow]
    rows
      .groupByKey(_.fp)
      .flatMapGroupsWithState[FpSeenState, FpVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[FpRow], state: GroupState[FpSeenState]) =>
          val seen = state.exists
          val ids  = it.map(_.doc_id).toVector.sorted
          if (!seen) state.update(FpSeenState(seen = true))
          ids.iterator.map(id => FpVerdict(id, key, novel = !seen && id == ids.head))
      }
  }

  /** Retention-windowed variant of [[verdicts]] — "novel unless seen
    * within the last `retentionMs` of EVENT time" (rolling-window dedup:
    * news/alert feeds where a re-published document after the window
    * legitimately counts as new content, and where unbounded state would
    * otherwise grow forever). State per fingerprint is its latest event
    * time; in streaming mode the operator sets an event-time TIMEOUT of
    * `last + retentionMs` on each entry and installs the matching
    * watermark internally, so the ENGINE expires idle fingerprints — a
    * fingerprint that stops arriving costs nothing after its window
    * passes, instead of living in a bucket blob until the bucket happens
    * to be rewritten. Event-time expiry keeps replays deterministic
    * (processing-time expiry would not be). On the batch face state dies
    * with the query, so no timeout is registered.
    *
    * Verdict: novel ⇔ no sighting of the fingerprint within `retentionMs`
    * BEFORE this row — across batches via state, within the batch by
    * event-time order (ties by doc_id, so equal-time duplicates resolve
    * to the min doc_id exactly like [[verdicts]]; a batch spanning more
    * than one window resolves left to right, so a gap wider than the
    * window inside one batch re-admits the fingerprint). A dup sighting
    * RE-STAMPS the fingerprint (sliding, not tumbling, window).
    *
    * Late data: rows more than `retentionMs` behind the stream's max
    * event time may meet already-expired state and be re-admitted as
    * novel — the standard watermark contract; size `retentionMs` (or
    * pre-sort the source) accordingly.
    */
  def verdictsWithin(
      spark: SparkSession,
      docs: DataFrame,
      timeCol: String,
      retentionMs: Long,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): Dataset[FpVerdict] = {
    require(retentionMs > 0, s"retentionMs must be positive, got $retentionMs")
    import spark.implicits._
    val streaming = docs.isStreaming
    val fp = TextAnalysis.fingerprint(col(textCol))
    val selected = docs.select(
      fp.as("fp"),
      col(idCol).cast("long").as("doc_id"),
      col(timeCol).cast("long").as("t"),
      timestamp_millis(col(timeCol).cast("long") + lit(1L)).as("event_ts"))
    val marked =
      if (streaming) selected.withWatermark("event_ts", s"${2 * retentionMs} milliseconds")
      else selected
    val rows = marked.as[FpTimedRow]
    val timeout =
      if (streaming) GroupStateTimeout.EventTimeTimeout else GroupStateTimeout.NoTimeout
    rows
      .groupByKey(_.fp)
      .flatMapGroupsWithState[FpLastSeenState, FpVerdict](OutputMode.Append, timeout) {
        (key: String, it: Iterator[FpTimedRow], state: GroupState[FpLastSeenState]) =>
          if (state.hasTimedOut) {
            // engine-driven expiry: the fingerprint's window has passed
            state.remove()
            Iterator.empty
          } else {
            var last = state.getOption.map(_.last).getOrElse(Long.MinValue)
            // resolve the batch in (event time, doc_id) order so an
            // over-window-long batch behaves exactly like smaller batches
            val batch = it.toVector.sortBy(r => (r.t, r.doc_id))
            val out = batch.map { r =>
              val seenRecently = last != Long.MinValue && r.t - last <= retentionMs
              last = math.max(last, r.t)
              FpVerdict(r.doc_id, key, novel = !seenRecently)
            }
            state.update(FpLastSeenState(last))
            if (streaming) {
              // expire once the watermark passes the window's edge (in the
              // shifted event_ts domain, hence the +1); clamp above the
              // current watermark (a timeout in the past is rejected by
              // the engine — possible for late rows)
              val wm = state.getCurrentWatermarkMs()
              state.setTimeoutTimestamp(math.max(last + 1 + retentionMs, wm + 1))
            }
            out.iterator
          }
      }
  }

  /** Bounded-memory variant of [[verdicts]]: per-BUCKET state is a Bloom
    * filter (`expectedItemsPerBucket`, `fpp`) instead of per-fingerprint
    * entries, so state size is FIXED at
    * `numBuckets × bloomBytes(expectedItemsPerBucket, fpp)` regardless of
    * corpus size — the bucket blob is the point here (a Bloom filter IS
    * one blob; there is no per-key increment to exploit). The trade is
    * one-sided and must be chosen deliberately: a Bloom false positive
    * marks a genuinely novel document as a dup and silently drops it from
    * the corpus (expected loss ≈ fpp of novel docs), while dup→novel
    * errors cannot happen — the same asymmetry as the bloom prune in
    * `Dedup.incrementalFromSketches`, but there the filter only PRE-prunes
    * ahead of an exact verify, so it costs nothing; here it IS the
    * verdict. Use [[verdicts]] (exact, RocksDB-backed) unless state size
    * is the binding constraint. Past `expectedItemsPerBucket` insertions
    * the realized fp rate degrades above `fpp` — size it to the corpus
    * ceiling.
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
      col(idCol).cast("long").as("doc_id")).as[FpBucketRow]
    rows
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[BloomBucketState, FpVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Int, it: Iterator[FpBucketRow], state: GroupState[BloomBucketState]) =>
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
