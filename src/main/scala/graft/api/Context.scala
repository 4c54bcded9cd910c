package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import SchemaInference.TimestampUnit

/** Session wrapper mirroring the reference's `Context`
  * (/root/reference/crates/core/src/context.rs:19-83): owns the
  * SparkSession and constructs `DataStream`s from sources.
  */
final class Context(val spark: SparkSession) {

  /** Kafka topic source (reference `from_topic`, context.rs:65-72 +
    * KafkaTopicBuilder, kafka_config.rs:216-268). The payload is
    * JSON-decoded against `schema` (explicit, or inferred from one
    * sample event via [[SchemaInference.fromSampleJson]]); event time
    * comes from `timestampColumn` in `timestampUnit`, falling back to
    * the Kafka message timestamp — exactly the reference's canonical-
    * timestamp rules (kafka_stream_read.rs:226-238), minus the hidden
    * metadata column (Spark tracks event time natively).
    *
    * Requires the spark-sql-kafka connector on the classpath at run
    * time; plan construction itself is connector-agnostic.
    */
  def fromTopic(topic: String, bootstrapServers: String,
                schema: StructType,
                timestampColumn: Option[String] = None,
                timestampUnit: TimestampUnit = SchemaInference.Int64Millis,
                startingOffsets: String = "earliest",
                kafkaOptions: Map[String, String] = Map.empty): DataStream = {
    val raw = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .options(kafkaOptions)
      .load()
    DataStream(Context.decodeKafkaJson(raw, schema, timestampColumn,
      timestampUnit), eventTimeCol = "__event_time")
  }

  /** Avro-encoded Kafka topic (reference kafka_config.rs:162-169):
    * payload decoded by graft's native AvroDecode expression against
    * the writer schema string.
    */
  def fromTopicAvro(topic: String, bootstrapServers: String,
                    avroSchemaJson: String,
                    timestampColumn: Option[String] = None,
                    timestampUnit: TimestampUnit = SchemaInference.Int64Millis,
                    startingOffsets: String = "earliest"): DataStream = {
    val raw = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
    DataStream(Context.decodeKafkaAvro(raw, avroSchemaJson,
      timestampColumn, timestampUnit), eventTimeCol = "__event_time")
  }

  /** Same, inferring the schema from one sample JSON event
    * (reference kafka_config.rs:148-160).
    */
  def fromTopicSample(topic: String, bootstrapServers: String,
                      sampleJson: String,
                      timestampColumn: Option[String] = None,
                      timestampUnit: TimestampUnit = SchemaInference.Int64Millis)
      : DataStream =
    fromTopic(topic, bootstrapServers,
      SchemaInference.fromSampleJson(spark, sampleJson),
      timestampColumn, timestampUnit)

  /** File-based streaming source (parquet dir) — the deterministic
    * stand-in for Kafka in tests (TESTDATA events table).
    */
  def fromParquetStream(path: String, schema: StructType,
                        eventTimeCol: String = "ts"): DataStream =
    DataStream(spark.readStream.schema(schema).parquet(path), eventTimeCol)

  /** Wrap an existing (batch or streaming) DataFrame. */
  def fromDF(df: DataFrame, eventTimeCol: String = "ts"): DataStream =
    DataStream(df, eventTimeCol)

  /** Batch parquet read (reference registers batch CSV/parquet tables
    * alongside streams, csv_streaming.rs:12-63).
    */
  def fromParquet(path: String, eventTimeCol: String = "ts"): DataStream =
    DataStream(spark.read.parquet(path), eventTimeCol)

  /** Batch CSV read with header+schema inference (reference
    * register_csv, csv_streaming.rs:18-24).
    */
  def fromCsv(path: String, eventTimeCol: String = "ts"): DataStream =
    DataStream(spark.read.option("header", "true")
      .option("inferSchema", "true").csv(path), eventTimeCol)

  /** Batch JSON-lines read — the standard web-corpus interchange
    * format (one JSON object per line; .jsonl / .ndjson, optionally
    * compressed — Spark's text-based source handles .gz/.zst
    * transparently by extension). Schema inferred from the data by
    * default (one extra pass); pass `schema` on production runs so a
    * 100 TB read is single-pass with column pruning pushed to the
    * line parser.
    */
  def fromJsonl(path: String, schema: StructType = null,
                eventTimeCol: String = "ts"): DataStream = {
    val r = spark.read
    DataStream((if (schema == null) r else r.schema(schema)).json(path),
      eventTimeCol)
  }

  /** Streaming JSON-lines source (directory watch) — the file-based
    * ingest path for corpora landing as .jsonl drops; schema is
    * mandatory (streams cannot infer).
    */
  def fromJsonlStream(path: String, schema: StructType,
                      eventTimeCol: String = "ts"): DataStream =
    DataStream(spark.readStream.schema(schema).json(path), eventTimeCol)

  def registerTable(name: String, ds: DataStream): Unit =
    ds.df.createOrReplaceTempView(name)

  def sql(query: String): DataStream = DataStream(spark.sql(query))
}

object Context {
  def apply(spark: SparkSession): Context = new Context(spark)

  /** Decode a Kafka-SHAPED raw frame — any (batch or streaming)
    * DataFrame with `value` (binary or string) and `timestamp`
    * (TimestampType) columns, which is exactly what `format("kafka")`
    * produces — into the payload schema with a canonical
    * `__event_time` column. This is the reference's per-message decode
    * + canonical-timestamp contract
    * (/root/reference/crates/core/src/datasource/kafka/
    * kafka_stream_read.rs:226-238) factored away from the connector,
    * so the full payload→schema→event-time→window path is provable
    * from a MemoryStream with no broker (KafkaPathSpec), and
    * `fromTopic` is a thin binding over it.
    */
  def decodeKafkaJson(raw: DataFrame, schema: StructType,
                      timestampColumn: Option[String] = None,
                      timestampUnit: TimestampUnit =
                        SchemaInference.Int64Millis): DataFrame =
    project(raw.select(
      from_json(col("value").cast("string"), schema).as("__payload"),
      col("timestamp").as("__kafka_ts")), timestampColumn, timestampUnit)

  /** Avro twin of [[decodeKafkaJson]] (native AvroDecode expression
    * against the writer schema).
    */
  def decodeKafkaAvro(raw: DataFrame, avroSchemaJson: String,
                      timestampColumn: Option[String] = None,
                      timestampUnit: TimestampUnit =
                        SchemaInference.Int64Millis): DataFrame =
    project(raw.select(
      graft.formats.AvroFormat.decode(col("value"), avroSchemaJson)
        .as("__payload"),
      col("timestamp").as("__kafka_ts")), timestampColumn, timestampUnit)

  /** Kafka-sink row encoding — every row as one JSON `value`
    * (reference topic_writer.rs:102-127); the broker-facing half of
    * `sinkKafka`, exposed so the encode contract is testable.
    */
  def encodeKafkaJson(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col): _*)).as("value"))

  private def project(decoded: DataFrame, timestampColumn: Option[String],
                      timestampUnit: TimestampUnit): DataFrame = {
    val ts = timestampColumn match {
      case Some(c) =>
        SchemaInference.canonicalTimestamp(col(s"__payload.$c"),
          timestampUnit)
      case None => col("__kafka_ts")
    }
    decoded.select(col("__payload.*"), ts.as("__event_time"))
      .drop("__kafka_ts")
  }
}
