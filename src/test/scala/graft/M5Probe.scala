package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** Throwaway timing probe for the m5 audio-row drift — not part of
  * the suite (delete after use).
  */
class M5Probe extends AnyFunSuite with SparkSpec {

  private def fixture(d: String) = {
    val s = spark
    val container = element_at(
      array(lit("wave"), lit("aiff"), lit("au")),
      (pmod(col("doc_id"), lit(3)) + 1).cast("int"))
    val rate = element_at(
      array(lit(8000), lit(16000), lit(22050), lit(44100)),
      (pmod(col("doc_id"), lit(4)) + 1).cast("int"))
    Graft.table(s, d, "documents").repartition(32)
      .select(col("doc_id"),
        Multimodal.encodeTestAudio(container, rate,
          (pmod(col("doc_id"), lit(2)) + 1).cast("int"),
          (pmod(col("doc_id"), lit(100)) + 50).cast("int"),
          (pmod(col("doc_id"), lit(1000)) - 500).cast("int")).as("blob"))
  }

  private def time(tag: String)(f: => Unit): Unit = {
    System.gc(); Thread.sleep(200)
    val t0 = System.nanoTime()
    f
    println(f"M5PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
  }

  test("decompose m5") {
    val d = "/root/testdata/sf0.1"
    // warmup
    fixture(d).write.mode("overwrite").format("noop").save()
    time("encode_only")(
      fixture(d).write.mode("overwrite").format("noop").save())
    time("encode_decode_32p")(
      Multimodal.decodeAudioPartitions(fixture(d), "blob", "doc_id")
        .write.mode("overwrite").format("noop").save())
    time("encode_decode_1p")(
      Multimodal.decodeAudioPartitions(
          fixture(d).coalesce(1), "blob", "doc_id")
        .write.mode("overwrite").format("noop").save())
    time("encode_decode_4p")(
      Multimodal.decodeAudioPartitions(
          fixture(d).coalesce(4), "blob", "doc_id")
        .write.mode("overwrite").format("noop").save())
  }
}
