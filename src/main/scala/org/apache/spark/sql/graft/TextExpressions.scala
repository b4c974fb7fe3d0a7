package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static bodies for the text expressions — called from both the
  * interpreted `nullSafeEval` and the generated code (the
  * [[JaroWinklerAlgo]] pattern: one static call per row keeps the
  * expression inside the WholeStageCodegen span).
  */
object TextAlgo {

  /** Unicode NFC normalization (canonical composition). Combining
    * sequences compose to their precomposed forms, so visually identical
    * strings get one byte representation — REQUIRED before any
    * fingerprint/hash dedup over multi-source text: "é" typed as
    * `e + U+0301` and as `U+00E9` must collide, and a crawl mixes both.
    */
  def nfc(s: UTF8String): UTF8String =
    UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC))

  /** Deflate-compressed size over raw UTF-8 size (level 6, raw deflate —
    * no zlib wrapper). Repetitive/templated text compresses far below
    * natural prose; near-1 ratios flag high-entropy noise (base64 blobs,
    * minified code). Empty input returns the deflate terminator overhead
    * over a 1-byte floor — deterministic, callers threshold well away
    * from it.
    */
  def deflateRatio(s: UTF8String): Double = {
    val raw = s.getBytes
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](8192)
      var compressed = 0L
      while (!d.finished()) compressed += d.deflate(buf)
      compressed.toDouble / math.max(1, raw.length)
    } finally d.end()
  }
}

/** NFC-normalize a string column (codegen; null-safe). Spark has no
  * built-in Unicode normalizer — the usual fallback is a Scala UDF, which
  * breaks codegen and serializes per row; this stays native.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(s: Any): Any =
    TextAlgo.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"org.apache.spark.sql.graft.TextAlgo.nfc($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Deflate compression ratio of a string column in (0, ~1.1] (codegen;
  * null-safe) — the classic redundancy quality signal: boilerplate and
  * templated spam sit far below prose, random blobs at ~1. Not
  * SQL-portable (the ratio depends on the deflate implementation), so its
  * correctness contract is the spec suite, not a DuckDB oracle; rank
  * thresholds on it rather than comparing absolute values across
  * platforms.
  */
case class DeflateRatio(child: Expression)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "deflate_ratio"

  override def nullSafeEval(s: Any): Any =
    TextAlgo.deflateRatio(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"org.apache.spark.sql.graft.TextAlgo.deflateRatio($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressionFunctions {
  def nfcNormalize(c: Column): Column =
    NativeColumn.toColumn(NfcNormalize(NativeColumn.toExpr(c)))
  def deflateRatio(c: Column): Column =
    NativeColumn.toColumn(DeflateRatio(NativeColumn.toExpr(c)))
}
