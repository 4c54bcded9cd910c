package graft

import java.io.ByteArrayOutputStream

import org.apache.avro.{Schema => AvroSchema}
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.EncoderFactory
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.api.{Context, DataStream, SchemaInference}

/** The Kafka ingest path WITHOUT a broker: Context.decodeKafkaJson/
  * decodeKafkaAvro operate on any Kafka-SHAPED frame (`value` +
  * `timestamp` — exactly what format("kafka") emits), so the full
  * payload→schema→event-time→window contract
  * (/root/reference/crates/core/src/datasource/kafka/
  * kafka_stream_read.rs:226-238) is proven end-to-end from a
  * MemoryStream; `fromTopic` is a thin connector binding over the
  * same functions.
  */
class KafkaPathSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val sampleJson =
    """{"sensor_name":"s1","reading":1.5,"occurred_at_ms":1000}"""

  /** Kafka-shaped streaming frame from (payloadBytes, brokerTsMs). */
  private def kafkaShaped(input: MemoryStream[(Array[Byte], Long)]) =
    input.toDF.select(col("_1").as("value"),
      timestamp_millis(col("_2")).as("timestamp"))

  test("JSON payload → schema → event-time → window, end-to-end") {
    val schema = SchemaInference.fromSampleJson(spark, sampleJson)
    val input = MemoryStream[(Array[Byte], Long)](spark)
    val decoded = Context.decodeKafkaJson(kafkaShaped(input), schema,
      timestampColumn = Some("occurred_at_ms"))
    val q = DataStream(decoded, "__event_time")
      .window(Seq(col("sensor_name")),
        Seq(count(lit(1)).as("n"), round(sum(col("reading")), 4).as("tot")),
        "10 seconds")
      .sinkMemory("kafka_json_out")
    def msg(name: String, reading: Double, atMs: Long) =
      (s"""{"sensor_name":"$name","reading":$reading,"occurred_at_ms":$atMs}"""
        .getBytes("UTF-8"), 999999999L) // broker ts far off: payload wins
    try {
      input.addData(msg("a", 1.0, 1000), msg("a", 2.5, 9000),
        msg("b", 10.0, 3000))
      q.processAllAvailable()
      input.addData(msg("a", 0.0, 25000)) // watermark past window end
      q.processAllAvailable()
      val rows = spark.table("kafka_json_out")
        .select($"sensor_name", $"n", $"tot",
          $"window_start_time".cast("long"))
        .as[(String, Long, Double, Long)].collect().toSet
      assert(rows == Set(("a", 2L, 3.5, 0L), ("b", 1L, 10.0, 0L)),
        s"decoded windowed aggregate mismatch: $rows")
    } finally q.stop()
  }

  test("timestampColumn=None falls back to the Kafka message timestamp") {
    val schema = SchemaInference.fromSampleJson(spark, sampleJson)
    val raw = Seq((sampleJson.getBytes("UTF-8"), 777000L))
      .toDF("_1", "_2").select(col("_1").as("value"),
        timestamp_millis(col("_2")).as("timestamp"))
    val out = Context.decodeKafkaJson(raw, schema).head
    assert(out.getAs[java.sql.Timestamp]("__event_time").getTime == 777000L)
    assert(out.getAs[String]("sensor_name") == "s1")
  }

  test("malformed JSON decodes to null payload fields, no crash") {
    val schema = SchemaInference.fromSampleJson(spark, sampleJson)
    val raw = Seq(("not json at all".getBytes("UTF-8"), 1000L))
      .toDF("_1", "_2").select(col("_1").as("value"),
        timestamp_millis(col("_2")).as("timestamp"))
    val out = Context.decodeKafkaJson(raw, schema,
      timestampColumn = Some("occurred_at_ms")).head
    assert(out.isNullAt(out.fieldIndex("sensor_name")))
    assert(out.isNullAt(out.fieldIndex("__event_time")))
  }

  private val avroSchemaJson =
    """{"type":"record","name":"M","fields":[
      |{"name":"sensor_name","type":"string"},
      |{"name":"reading","type":"double"},
      |{"name":"occurred_at_ms","type":"long"}]}""".stripMargin

  private def avroMsg(name: String, reading: Double, atMs: Long)
      : Array[Byte] = {
    val schema = new AvroSchema.Parser().parse(avroSchemaJson)
    val rec: GenericRecord = new GenericData.Record(schema)
    rec.put("sensor_name", name); rec.put("reading", reading)
    rec.put("occurred_at_ms", atMs)
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush(); out.toByteArray
  }

  test("Avro payload → schema → event-time → window, end-to-end") {
    val input = MemoryStream[(Array[Byte], Long)](spark)
    val decoded = Context.decodeKafkaAvro(kafkaShaped(input),
      avroSchemaJson, timestampColumn = Some("occurred_at_ms"))
    val q = DataStream(decoded, "__event_time")
      .window(Seq(col("sensor_name")),
        Seq(count(lit(1)).as("n"), round(max(col("reading")), 4).as("mx")),
        "10 seconds")
      .sinkMemory("kafka_avro_out")
    try {
      input.addData((avroMsg("a", 1.25, 2000), 1L),
        (avroMsg("a", 4.75, 8000), 1L))
      q.processAllAvailable()
      input.addData((avroMsg("z", 0.0, 30000), 1L))
      q.processAllAvailable()
      val rows = spark.table("kafka_avro_out")
        .select($"sensor_name", $"n", $"mx").as[(String, Long, Double)]
        .collect().toSet
      assert(rows == Set(("a", 2L, 4.75)),
        s"avro windowed aggregate mismatch: $rows")
    } finally q.stop()
  }

  test("fromTopic binding reaches the connector lookup (env-bound canary)") {
    // The literal format("kafka") binding is permanently untestable in
    // this environment: /opt/spark/jars ships no spark-sql-kafka jar,
    // no broker exists, and a round-3 resolution attempt of
    // org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2 against the
    // offline coursier cache failed with "Not found" (README
    // "Environment limits"). This canary pins the exact failure mode:
    // fromTopic must wire all the way through to Spark's DataSource
    // lookup for "kafka" and fail THERE — not earlier in graft code.
    // If the connector ever appears on the classpath, this test fails
    // and should be replaced by a real embedded-broker spec.
    val thrown = intercept[Exception] {
      graft.api.Context(spark).fromTopic("t", "localhost:19092",
        SchemaInference.fromSampleJson(spark, sampleJson))
    }
    val msg = thrown.getMessage
    assert(msg != null && msg.toLowerCase.contains("kafka"),
      s"failure must come from the kafka DataSource lookup: $msg")
    assert(msg.contains("Failed to find") ||
      msg.contains("DATA_SOURCE_NOT_FOUND") ||
      msg.toLowerCase.contains("provider"),
      s"expected the data-source-not-found error, got: $msg")
  }

  test("sink encode → source decode round-trips rows") {
    val schema = SchemaInference.fromSampleJson(spark, sampleJson)
    val rows = Seq(("s9", 3.25, 123456L))
      .toDF("sensor_name", "reading", "occurred_at_ms")
    val encoded = Context.encodeKafkaJson(rows)
      .withColumn("timestamp", timestamp_millis(lit(1L)))
    val back = Context.decodeKafkaJson(encoded, schema,
      timestampColumn = Some("occurred_at_ms"))
    val r = back.head
    assert(r.getAs[String]("sensor_name") == "s9")
    assert(r.getAs[Double]("reading") == 3.25)
    assert(r.getAs[java.sql.Timestamp]("__event_time").getTime == 123456L)
  }
}
