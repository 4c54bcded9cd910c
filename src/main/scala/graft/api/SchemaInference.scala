package graft.api

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Column

/** Schema inference from a single sample JSON event, mirroring the
  * reference's `infer_arrow_schema_from_json_value`
  * (/root/reference/crates/core/src/utils/arrow_helpers.rs:283-296):
  * bool→Boolean, integral→Long, other numbers→Double, string→String,
  * array→ArrayType(from first element), object→Struct (recursive);
  * everything nullable. Implemented on Spark's own JSON inference,
  * which applies the same rules.
  */
object SchemaInference {

  def fromSampleJson(spark: SparkSession, sampleJson: String): StructType = {
    import spark.implicits._
    spark.read.json(Seq(sampleJson).toDS).schema
  }

  /** Event-time representations supported by the reference
    * (/root/reference/crates/core/src/physical_plan/utils/time.rs:14-19).
    */
  sealed trait TimestampUnit
  case object Int64Millis extends TimestampUnit
  case object Int64Seconds extends TimestampUnit
  final case class StringIso8601(format: String = "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
    extends TimestampUnit

  /** Projection converting a raw event-time column to TimestampType —
    * the Spark-native replacement for the reference's hidden
    * `_streaming_internal_metadata.canonical_timestamp` column (Spark
    * tracks event time natively via withWatermark).
    */
  def canonicalTimestamp(raw: Column, unit: TimestampUnit): Column = unit match {
    case Int64Millis      => timestamp_millis(raw.cast(LongType))
    case Int64Seconds     => timestamp_seconds(raw.cast(LongType))
    case StringIso8601(f) => to_timestamp(raw, f)
  }
}
