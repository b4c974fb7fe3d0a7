package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pluggable 64-bit hash family for the sketch operators (MinHash, SimHash,
  * LSH hyperplanes).
  *
  * Two implementations:
  *  - [[XxHash]] (default): Spark's native codegen'd xxhash64 — the fast
  *    path for production pipelines.
  *  - [[Md5Hash]]: a 60-bit hash derived from the md5 hex prefix. ~Uniform,
  *    deterministic, and — the point — expressible in any engine with an
  *    `md5()` function, e.g. DuckDB:
  *    `CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)`.
  *    This makes the sketch operators' results verifiable row-for-row by an
  *    external SQL oracle. 15 hex chars = 60 bits keeps the value positive
  *    in a signed 64-bit integer in both engines.
  */
sealed trait HashFamily {

  /** Unseeded 64-bit (or 60-bit) hash of a column. */
  def plain(c: Column): Column

  /** Seeded variant — distinct hash per `seed` for MinHash signatures. */
  def seeded(seed: Int, c: Column): Column

  /** Hash mapped to a double in [-1, 1) — hyperplane components. */
  def unit(c: Column): Column

  /** Number of usable (uniformly distributed) low bits in [[plain]]. */
  def bits: Int
}

/** Spark-native xxhash64: full 64 bits, whole-stage codegen. */
case object XxHash extends HashFamily {
  def plain(c: Column): Column = xxhash64(c)
  def seeded(seed: Int, c: Column): Column = xxhash64(c, lit(seed))
  def unit(c: Column): Column = plain(c).cast("double") / lit(Long.MaxValue.toDouble)
  def bits: Int = 64
}

/** md5-hex-prefix hash: 60 uniform bits, reproducible in external engines.
  *
  * `seeded` prefixes the input with `"<seed>:"` — the md5 avalanche makes
  * the seeded family pairwise-independent enough for MinHash.
  * `unit` maps [0, 2^60) to [-1, 1) by dividing by 2^59 and shifting —
  * division by a power of two is exact in IEEE 754, so engines agree
  * bit-for-bit on the component values.
  */
case object Md5Hash extends HashFamily {
  def plain(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")
  def seeded(seed: Int, c: Column): Column =
    plain(concat(lit(s"$seed:"), c.cast("string")))
  def unit(c: Column): Column =
    plain(c).cast("double") / lit(math.pow(2, 59)) - lit(1.0)
  def bits: Int = 60

  /** The DuckDB rendering of [[plain]] — kept next to the Spark definition
    * so the two cannot drift apart silently (spec-checked).
    */
  def duckdbPlain(sqlExpr: String): String =
    s"CAST(('0x' || substr(md5($sqlExpr), 1, 15)) AS BIGINT)"
}
