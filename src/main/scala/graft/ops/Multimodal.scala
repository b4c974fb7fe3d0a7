package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, processed per-partition in bounded batches.
  *
  * The reference carries exactly this shape — `cutoutScience:
  * struct<fileName: string, stampData: binary>` (docs/Schema-Model.md,
  * FIXTURES.md §1) — and never decodes it in Spark; we make the decode stage
  * a first-class, pluggable per-partition operator.
  *
  * The actual codec is STUBBED (no image/audio libs in this container):
  * [[fakeDecode]] derives deterministic metadata from the bytes. The
  * Spark-side plumbing — schema contract, mapPartitions batching,
  * partition-count control — is real and tested; swapping in a real codec
  * touches only the `decode` function.
  *
  * Scale notes: decode is embarrassingly parallel but memory-heavy, so
  * batches are bounded (`batchSize`) and the operator repartitions to
  * `parallelism` when the upstream partitioning is too coarse (a 100 TB
  * binary table read with default maxPartitionBytes yields partitions sized
  * for scan, not for decode).
  */
object Multimodal {

  /** Metadata produced by the (stub) decoder. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("byte_len", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)
  ))

  /** STUB decode: deterministic fake metadata from the payload bytes.
    * Replace with a real codec (javax.imageio / ffmpeg bindings) in a
    * container that ships one — the signature is the contract.
    */
  def fakeDecode(bytes: Array[Byte]): Row = {
    if (bytes == null) Row(0, "empty", 0, 0)
    else {
      val len = bytes.length
      // pretend the first byte encodes the container format
      val fmt = if (len == 0) "empty" else (bytes(0) & 0x03) match {
        case 0 => "png"
        case 1 => "jpeg"
        case 2 => "webp"
        case _ => "raw"
      }
      Row(len, fmt, 64 + (len % 640), 64 + (len % 480))
    }
  }

  /** Decodes a binary column into typed metadata via bounded per-partition
    * batches. Output schema = input schema (minus the binary payload unless
    * `keepPayload`) + [[mediaMetaSchema]] fields.
    */
  def decodeMeta(
      df: DataFrame,
      binCol: String,
      keepPayload: Boolean = false,
      parallelism: Int = 0,
      batchSize: Int = 256,
      decode: Array[Byte] => Row = fakeDecode
  ): DataFrame = {
    val repartitioned = if (parallelism > 0) df.repartition(parallelism) else df
    val inSchema  = repartitioned.schema
    val binIdx    = inSchema.fieldIndex(binCol)
    val keptIdx   = inSchema.indices.filter(i => keepPayload || i != binIdx)
    val outSchema = StructType(keptIdx.map(inSchema.fields) ++ mediaMetaSchema.fields)

    val encoder = RowEncoder.encoderFor(outSchema)
    repartitioned.mapPartitions { rows =>
      // bounded batches: a real decoder allocates per-image buffers; grouping
      // bounds peak memory without materializing the whole partition
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val meta = decode(r.getAs[Array[Byte]](binIdx))
          Row.fromSeq(keptIdx.map(r.get) ++ meta.toSeq)
        }
      }
    }(encoder)
  }

  /** Feature-extraction plumbing: binary payload → fixed-width double
    * vector, per-partition batched like [[decodeMeta]]. The STUB derives a
    * deterministic 16-bin byte-value histogram (normalized) — the shape and
    * schema of a real embedding/feature extractor; swapping in a real model
    * touches only `features`.
    */
  def extractFeatures(
      df: DataFrame,
      binCol: String,
      idCol: String = "doc_id",
      bins: Int = 16,
      parallelism: Int = 0
  ): DataFrame = {
    val repartitioned = if (parallelism > 0) df.repartition(parallelism) else df
    val inSchema = repartitioned.schema
    val binIdx   = inSchema.fieldIndex(binCol)
    val idIdx    = inSchema.fieldIndex(idCol)
    val outSchema = StructType(Seq(
      inSchema.fields(idIdx),
      StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))
    val encoder = RowEncoder.encoderFor(outSchema)
    repartitioned.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val hist  = new Array[Double](bins)
        if (bytes != null && bytes.nonEmpty) {
          bytes.foreach(b => hist((b & 0xff) * bins / 256) += 1.0)
          var i = 0
          while (i < bins) { hist(i) /= bytes.length; i += 1 }
        }
        Row(r.get(idIdx), hist.toSeq)
      }
    }(encoder)
  }

  /** Resize plumbing: recomputes target dimensions preserving aspect ratio
    * (pure metadata arithmetic — the real pixel work lives in the stubbed
    * codec). Input must carry `width`/`height` (e.g. from [[decodeMeta]]).
    */
  def resizeMeta(df: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(
      lit(maxSide).cast("double") / col("width"),
      lit(maxSide).cast("double") / col("height"),
      lit(1.0))
    df.withColumn("out_width", floor(col("width") * scale).cast("int"))
      .withColumn("out_height", floor(col("height") * scale).cast("int"))
  }

  /** Frame-sampling plumbing for (fake) video payloads: emits one row per
    * sampled frame index — the explode-shaped half of a real frame extractor.
    */
  def sampleFrames(
      df: DataFrame,
      binCol: String,
      everyNth: Int = 10,
      idCol: String = "doc_id"
  ): DataFrame = {
    // frame count stub: payload length / 1024 "frames"
    df.select(
        col(idCol),
        length(col(binCol)).as("byte_len"),
        (length(col(binCol)) / lit(1024)).cast("int").as("frame_count")
      )
      .withColumn(
        "frame_idx",
        explode(sequence(lit(0), greatest(col("frame_count") - 1, lit(0)), lit(everyNth)))
      )
      .drop("frame_count")
  }
}
