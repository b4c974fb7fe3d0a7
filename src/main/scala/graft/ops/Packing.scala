package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training-data prep: lay documents end-to-end
  * and chunk the concatenation into fixed token-budget bins — the standard
  * "concat-and-chunk" batching shape. Each document is assigned the bin
  * where it STARTS plus its offset inside that bin; a document crossing a
  * boundary spans into the following bin(s), where the trainer's chunker
  * splits it. (This is the padding-free packing used for pretraining
  * corpora, not first-fit bin packing — no capacity is wasted and the
  * assignment is a pure prefix sum, not a sequential search.)
  *
  * Scale shape: packing is a per-stream recurrence, so the corpus is split
  * into `streams` independent streams by a deterministic function of the
  * id; each stream packs under ONE window (a linear scan after one hash
  * shuffle on the stream id). At 100 TB: set streams ≈ cluster
  * parallelism; no global sort, no driver state, and bin identity is the
  * (stream, bin) pair — globally unique without cross-stream coordination.
  *
  * Determinism: stream assignment and intra-stream order derive from the
  * id column only, so the packing is identical across runs, cluster sizes,
  * and input partitionings (the same property as [[Sampling]]).
  */
object Packing {

  /** @param tokens  token-count expression (e.g.
    *                [[TextAnalysis.tokenCount]] or [[TextAnalysis.bpeishTokenCount]])
    * @param budget  tokens per bin (the training context length)
    * @param streams number of independent packing streams
    * @return (idCol, n_tokens, stream, bin, bin_offset)
    */
  def packSequences(
      df: DataFrame,
      tokens: Column,
      budget: Long,
      streams: Int = 32,
      idCol: String = "doc_id"
  ): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(streams > 0, s"streams must be positive, got $streams")
    val w = Window.partitionBy(col("stream")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(
        col(idCol),
        tokens.cast("long").as("n_tokens"),
        pmod(col(idCol), lit(streams.toLong)).as("stream"))
      .withColumn("offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(
        col(idCol),
        col("n_tokens"),
        col("stream"),
        floor(col("offset") / budget).cast("long").as("bin"),
        (col("offset") % budget).as("bin_offset"))
  }

  /** Bin-level summary of a [[packSequences]] result: how many documents
    * start in each bin and the packed token mass — the sanity view a
    * pipeline monitors (all interior bins carry ≥ budget tokens through
    * them by construction; only each stream's LAST bin can run short).
    */
  def binStats(packed: DataFrame, idCol: String = "doc_id"): DataFrame =
    packed.groupBy(col("stream"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens_started"))

  /** Materialize the packed SHARDS: join a [[packSequences]] result back to
    * the document texts and concatenate each (stream, bin)'s documents in
    * packing order — the final write step that turns the assignment into
    * actual training sequences. A document contributes its full text to
    * the bin it STARTS in (the concat-and-chunk contract: the trainer's
    * chunker splits boundary-spanning text), so a bin's text carries about
    * `budget` tokens plus at most one spanning document's tail.
    *
    * One equi-join on the doc id plus one shuffle on (stream, bin); the
    * per-bin state is bounded by the token budget (+ one document), never
    * a whole stream. Order inside a bin is (bin_offset, doc id) — total
    * and deterministic even for zero-token documents sharing an offset.
    */
  def assembleBins(
      packed: DataFrame,
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      sep: String = " "
  ): DataFrame =
    packed.join(docs.select(col(idCol), col(textCol).as("_t")), Seq(idCol))
      .groupBy(col("stream"), col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        concat_ws(
          sep,
          transform(
            array_sort(collect_list(struct(col("bin_offset"), col(idCol), col("_t")))),
            s => s.getField("_t"))).as("text"))
}
