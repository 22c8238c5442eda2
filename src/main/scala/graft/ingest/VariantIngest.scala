package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Parse-at-ingest for semi-structured columns: JSON text is parsed ONCE
  * into Spark 4's binary-encoded VARIANT type and stored that way, so the
  * 100 TB read path runs typed `variant_get` extractions only — no
  * per-query (let alone per-access) string parsing, and the binary form is
  * columnar-friendly and, with variant shredding in the writer,
  * stats-prunable.
  *
  * The e14 query (`queries/Extended5.scala`) demonstrates the read-side
  * pattern; this is the write-side half: call [[parseAtIngest]] before the
  * parquet write and drop the raw string column once downstream consumers
  * have migrated.
  */
object VariantIngest {

  /** Add `variantCol` = `parse_json(jsonCol)`. Keep the raw column during
    * migration; pass `dropRaw = true` once nothing reads it (the VARIANT
    * binary round-trips losslessly, so the raw text is redundant).
    */
  def parseAtIngest(df: DataFrame, jsonCol: String, variantCol: String,
      dropRaw: Boolean = false): DataFrame = {
    val withV = df.withColumn(variantCol, parse_json(col(jsonCol)))
    if (dropRaw) withV.drop(jsonCol) else withV
  }
}
