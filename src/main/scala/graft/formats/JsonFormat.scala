package graft.formats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSON payload decode/encode, mirroring the reference's decoder
  * (/root/reference/crates/core/src/formats/decoders/json.rs:25-49)
  * and row encoder (utils/row_encoder.rs:30-44) on Spark's codegen'd
  * from_json/to_json.
  */
object JsonFormat {

  /** Decode a string/binary JSON column against a fixed schema.
    * mode="FAILFAST" reproduces the reference's error-on-invalid
    * behavior; "PERMISSIVE" (nulls for bad rows) is the 100TB default
    * — a corrupt shard shouldn't kill a week-long job.
    */
  def decode(payload: Column, schema: StructType,
             mode: String = "PERMISSIVE"): Column =
    from_json(payload.cast("string"), schema, Map("mode" -> mode))

  /** Decode and flatten: df + JSON column → columns of `schema`. */
  def decodeInto(df: DataFrame, payloadCol: String, schema: StructType,
                 mode: String = "PERMISSIVE"): DataFrame =
    df.withColumn("__decoded", decode(col(payloadCol), schema, mode))
      .select(col("__decoded.*"))

  /** One JSON object per row (no delimiter), field order = column
    * order — the reference's sink row encoding.
    */
  def encodeRows(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col): _*)).as("value"))
}
