package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.api.DataStream
import graft.operators.Udafs

class UdafSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("CountByValue aggregates map state in batch groupBy") {
    val df = Seq(("s1", "hot"), ("s1", "hot"), ("s1", "cold"), ("s2", "hot"))
      .toDF("sensor", "level")
    val got = df.groupBy($"sensor")
      .agg(Udafs.countByValue($"level").as("counts"))
      .orderBy($"sensor")
      .as[(String, Map[String, Long])].collect().toSeq
    assert(got == Seq(
      ("s1", Map("hot" -> 2L, "cold" -> 1L)), ("s2", Map("hot" -> 1L))))
  }

  test("CountByValue works inside a streaming window (udaf_example.py)") {
    val input = MemoryStream[Measurement](spark)
    val ds = DataStream(
      input.toDF
        .withColumn("ts", timestamp_millis($"occurred_at_ms"))
        .withColumn("level",
          when($"reading" > 50, "high").otherwise("low")), "ts")
      .window(Seq($"sensor_name"),
        Seq(Udafs.countByValue($"level").as("level_counts")), "10 seconds")
    val q = ds.sinkMemory("udaf_out")
    try {
      input.addData(Measurement(1000, "a", 80.0), Measurement(2000, "a", 90.0),
        Measurement(3000, "a", 10.0))
      q.processAllAvailable()
      input.addData(Measurement(20000, "a", 0.0))
      q.processAllAvailable()
      val rows = spark.table("udaf_out")
        .filter($"window_start_time".cast("long") === 0).collect()
      assert(rows.length == 1)
      val counts = rows(0).getMap[String, Long](
        rows(0).fieldIndex("level_counts"))
      assert(counts == Map("high" -> 2L, "low" -> 1L))
    } finally q.stop()
  }

  test("SQL surface: graft functions callable from spark.sql") {
    graft.functions.GraftFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)) c,
        |  rolling_hash('abc') h,
        |  simhash64(array('a','b')) s,
        |  size(minhash_signature(array('x','y'), 8)) k,
        |  hyperplane_lsh_bucket(array(1.0D, 2.0D), 4, 2) b""".stripMargin)
      .head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getLong(1) == ((97L * 1000003L) + 98L) * 1000003L + 99L)
    assert(r.getInt(3) == 8)
    // UDAF via SQL
    Seq("x", "x", "y").toDF("v").createOrReplaceTempView("vals")
    val m = spark.sql("SELECT count_by_value(v) m FROM vals")
      .head().getMap[String, Long](0)
    assert(m == Map("x" -> 2L, "y" -> 1L))
  }
}
