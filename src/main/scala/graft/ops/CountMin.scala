package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch over a key column — the heavy-hitter / frequency-
  * estimation member of the sketch family (HLL distinct, sketch
  * percentiles, Bloom membership, MinHash/SimHash similarity are the
  * others). Build once over the corpus, then estimate any key's frequency
  * from the 8 KB sketch without rescanning — the streaming-friendly
  * "what are the hot tokens/domains/users" primitive.
  *
  * The sketch aggregate ([[org.apache.spark.sql.graft.CountMinAgg]]) takes
  * PRE-HASHED bucket indexes built here from the pluggable [[HashFamily]],
  * so estimates under [[Md5Hash]] are exactly reproducible by an external
  * engine: CMS is a linear sketch, so each counter is a plain group-by sum
  * and the estimate is `min` over `depth` counters — no tolerance gate
  * needed (the driver oracle replicates the counters in SQL).
  *
  * Estimates never undercount; they overcount by collision mass (≤ εN
  * with ε ≈ e/width, probability 1−δ at depth = ln(1/δ)).
  */
object CountMin {

  /** The row's bucket index per sketch row r: `hash_{seed+r}(key) mod width`. */
  def bucketIndexes(key: Column, depth: Int, width: Int, seed: Int = 100,
      hash: HashFamily = XxHash): Column =
    array((0 until depth).map(r => pmod(hash.seeded(seed + r, key), lit(width.toLong))): _*)

  /** One-row frame holding the flattened depth×width sketch of `key`'s
    * occurrence counts as column `cms`.
    */
  def sketch(df: DataFrame, key: Column, depth: Int = 4, width: Int = 256,
      seed: Int = 100, hash: HashFamily = XxHash): DataFrame =
    df.agg(org.apache.spark.sql.graft.CountMinAgg.countMinAgg(
      bucketIndexes(key, depth, width, seed, hash), depth, width).as("cms"))

  /** Point estimate of `key`'s count from a sketch column (same depth /
    * width / seed / hash as the build): `min_r sketch[r·width + bucket_r]`.
    * A `least` over `depth` `element_at` terms — plain codegen, usable
    * after a broadcast of the one-row sketch frame.
    */
  def estimate(sketchCol: Column, key: Column, depth: Int = 4, width: Int = 256,
      seed: Int = 100, hash: HashFamily = XxHash): Column =
    least((0 until depth).map { r =>
      element_at(
        sketchCol,
        (pmod(hash.seeded(seed + r, key), lit(width.toLong)) + lit(r.toLong * width) + 1)
          .cast("int"))
    }: _*)
}
