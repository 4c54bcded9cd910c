package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.api.SchemaInference

class SchemaInferenceSpec extends AnyFunSuite with SparkSpec {

  test("measurement sample infers Long/String/Double (FIXTURES §1)") {
    val s = SchemaInference.fromSampleJson(spark,
      """{"occurred_at_ms": 100, "sensor_name": "foo", "reading": 0.0}""")
    assert(s("occurred_at_ms").dataType == LongType)
    assert(s("sensor_name").dataType == StringType)
    assert(s("reading").dataType == DoubleType)
  }

  test("rideshare sample infers nested structs; leaf access works") {
    val json =
      """{"driver_id":"abc","occurred_at_ms":1,
        |"imu_measurement":{"timestamp":"2024-01-01T00:00:00.000Z",
        |  "accelerometer":{"x":1.0,"y":2.0,"z":3.0},
        |  "gps":{"latitude":1.0,"longitude":2.0,"altitude":3.0,"speed":45.5}},
        |"meta":{"nonsense":"blah"}}""".stripMargin.replaceAll("\n", "")
    val s = SchemaInference.fromSampleJson(spark, json)
    val imu = s("imu_measurement").dataType.asInstanceOf[StructType]
    val gps = imu("gps").dataType.asInstanceOf[StructType]
    assert(gps("speed").dataType == DoubleType)
    // col("imu_measurement").field("gps").field("speed") equivalent:
    import spark.implicits._
    val df = spark.read.schema(s).json(Seq(json).toDS)
    val speed = df.select($"imu_measurement.gps.speed").head.getDouble(0)
    assert(speed == 45.5)
  }

  test("canonical timestamp units (reference time.rs:14-19)") {
    import spark.implicits._
    val df = Seq((1704067200000L, 1704067200L, "2024-01-01T00:00:00.000Z"))
      .toDF("ms", "s", "iso")
    val r = df.select(
      SchemaInference.canonicalTimestamp($"ms", SchemaInference.Int64Millis)
        .cast("long").as("a"),
      SchemaInference.canonicalTimestamp($"s", SchemaInference.Int64Seconds)
        .cast("long").as("b"),
      SchemaInference.canonicalTimestamp($"iso",
        SchemaInference.StringIso8601()).cast("long").as("c")).head
    assert(r.getLong(0) == 1704067200L)
    assert(r.getLong(1) == 1704067200L)
    assert(r.getLong(2) == 1704067200L)
  }
}
