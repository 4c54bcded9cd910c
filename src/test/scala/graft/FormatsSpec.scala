package graft

import java.io.ByteArrayOutputStream

import org.apache.avro.{Schema => AvroSchema}
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.EncoderFactory
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.formats.{AvroFormat, JsonFormat}

class FormatsSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  // ---- JSON (FIXTURES §3: reference json.rs / row_encoder.rs tests) ----

  private val idNameSchema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  test("json decode: roundtrip rows against fixed schema") {
    val df = Seq("""{"id":1,"name":"Alice"}""", """{"id":2,"name":"Bob"}""",
      """{"id":3,"name":"Charlie"}""").toDF("payload")
    val got = JsonFormat.decodeInto(df, "payload", idNameSchema)
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "Alice"), (2L, "Bob"), (3L, "Charlie")))
  }

  test("json decode: invalid json -> null row (PERMISSIVE default)") {
    val df = Seq("""not json at all""").toDF("payload")
    val got = JsonFormat.decodeInto(df, "payload", idNameSchema).head
    assert(got.isNullAt(0) && got.isNullAt(1))
  }

  test("json row encoder: exact output strings (row_encoder.rs:56-86)") {
    val df = Seq(("a", 1), ("b", 2)).toDF("col1", "col2")
    val got = JsonFormat.encodeRows(df).as[String].collect().toSeq
    assert(got == Seq("""{"col1":"a","col2":1}""", """{"col1":"b","col2":2}"""))
  }

  // ---- Avro (FIXTURES §3: reference avro.rs tests) ----

  private val avroIdName =
    """{"type":"record","name":"r","fields":[
      |{"name":"id","type":"int"},{"name":"name","type":"string"}]}"""
      .stripMargin.replaceAll("\n", "")

  private def avroBytes(schemaJson: String)(fill: GenericRecord => Unit)
      : Array[Byte] = {
    val schema = new AvroSchema.Parser().parse(schemaJson)
    val rec = new GenericData.Record(schema)
    fill(rec)
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  test("avro schema conversion: {id:int, name:string} -> Spark struct") {
    val s = AvroFormat.sparkSchema(avroIdName)
    assert(s == StructType(Seq(StructField("id", IntegerType),
      StructField("name", StringType))))
  }

  test("avro decode: writer->decoder roundtrip (avro.rs:63-95)") {
    val bytes = avroBytes(avroIdName) { r =>
      r.put("id", 7); r.put("name", "Dana")
    }
    val got = Seq(bytes).toDF("payload")
      .select(AvroFormat.decode($"payload", avroIdName).as("r"))
      .select($"r.id", $"r.name").as[(Int, String)].head()
    assert(got == ((7, "Dana")))
  }

  test("avro decode: nested record, array, nullable union, map") {
    val nested =
      """{"type":"record","name":"outer","fields":[
        |{"name":"meta","type":{"type":"record","name":"m","fields":[
        |  {"name":"tag","type":["null","string"],"default":null}]}},
        |{"name":"xs","type":{"type":"array","items":"double"}},
        |{"name":"kv","type":{"type":"map","values":"long"}}]}"""
        .stripMargin.replaceAll("\n", "")
    val schema = new AvroSchema.Parser().parse(nested)
    val bytes = avroBytes(nested) { r =>
      val m = new GenericData.Record(schema.getField("meta").schema())
      m.put("tag", "hello")
      r.put("meta", m)
      r.put("xs", java.util.List.of(1.5, 2.5))
      r.put("kv", java.util.Map.of("k", 9L))
    }
    val row = Seq(bytes).toDF("payload")
      .select(AvroFormat.decode($"payload", nested).as("r"))
      .select($"r.meta.tag", $"r.xs", $"r.kv.k").head()
    assert(row.getString(0) == "hello")
    assert(row.getSeq[Double](1) == Seq(1.5, 2.5))
    assert(row.getLong(2) == 9L)
  }

  test("avro decode of a null-union field yields null") {
    val nullable =
      """{"type":"record","name":"n","fields":[
        |{"name":"v","type":["null","int"],"default":null}]}"""
        .stripMargin.replaceAll("\n", "")
    val bytes = avroBytes(nullable) { r => r.put("v", null) }
    val row = Seq(bytes).toDF("payload")
      .select(AvroFormat.decode($"payload", nullable).as("r"))
      .select($"r.v").head()
    assert(row.isNullAt(0))
  }
}
