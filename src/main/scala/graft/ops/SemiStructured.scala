package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Semi-structured (JSON) column handling — schema-on-read promotion of a
  * string payload column into typed columns, the standard first step over
  * event `props` / crawl metadata / API payloads before relational
  * operators apply.
  *
  * Scale shape: `from_json` is a pure map-side projection (one parse per
  * row, whole-stage codegen around it), so promotion adds ZERO shuffle and
  * composes with scan pruning — only the payload column and the fields the
  * query touches survive the projection. Malformed payloads yield NULL
  * fields (Spark's PERMISSIVE mode), never a failed job: at 100 TB there
  * WILL be broken rows, and a parse exception that kills the stage is the
  * wrong failure mode; [[withParseStatus]] makes the quarantine explicit
  * instead.
  */
object SemiStructured {

  /** Promotes JSON string column `jsonCol` to typed top-level columns per
    * `schemaDDL` (e.g. `"k INT, tag STRING"`), appended to the frame;
    * unparseable rows get NULLs.
    */
  def extractJson(df: DataFrame, jsonCol: String, schemaDDL: String): DataFrame = {
    val schema = StructType.fromDDL(schemaDDL)
    val parsed = df.withColumn("_j", from_json(col(jsonCol), schema))
    schema.fieldNames.foldLeft(parsed)((d, f) => d.withColumn(f, col("_j")(f)))
      .drop("_j")
  }

  /** [[extractJson]] plus an explicit `parse_ok` flag: false where the
    * payload is non-NULL but not valid JSON (the quarantine predicate for
    * a bad-rows side channel — filter, don't throw). NULL payloads count
    * as ok: absent metadata is normal, broken metadata is not.
    */
  def withParseStatus(df: DataFrame, jsonCol: String, schemaDDL: String): DataFrame =
    extractJson(df, jsonCol, schemaDDL)
      .withColumn("parse_ok",
        // malformed payloads parse to a NULL variant instead of throwing
        col(jsonCol).isNull || try_parse_json(col(jsonCol)).isNotNull)
}
