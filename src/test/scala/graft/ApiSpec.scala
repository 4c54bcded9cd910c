package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.api.{Context, DataStream}

class ApiSpec extends AnyFunSuite with SparkSpec {

  private lazy val ctx = Context(spark)
  private lazy val events = Graft.table(spark, sf, "events")

  test("select/filter/withColumn/dropColumns compose like DataFrame ops") {
    val ds = ctx.fromDF(events)
      .filter(col("event_type") === "purchase")
      .withColumn("v2", col("value") * 2)
      .select(col("event_id"), col("user_id"), col("v2"))
      .dropColumns("user_id")
    assert(ds.schema.fieldNames.toSeq == Seq("event_id", "v2"))
    val expected = events.filter(col("event_type") === "purchase").count()
    assert(ds.toDF.count() == expected)
  }

  test("window() tumbling on batch matches direct groupBy(window)") {
    val ds = ctx.fromDF(events, "ts")
      .window(Seq(col("event_type")),
        Seq(count(lit(1)).as("n"), max(col("value")).as("mx")), "1 hour")
    val direct = events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), max(col("value")).as("mx"))
    assert(ds.toDF.count() == direct.count())
    assert(ds.schema.fieldNames.contains("window_start_time"))
    assert(ds.schema.fieldNames.contains("window_end_time"))
    // flattened window bounds differ by exactly the window length
    val bad = ds.toDF.filter(
      col("window_end_time").cast("long") -
        col("window_start_time").cast("long") =!= 3600).count()
    assert(bad == 0)
  }

  test("sessionWindow() on batch merges gap<30min runs") {
    val ds = ctx.fromDF(events, "ts")
      .sessionWindow(Seq(col("user_id")), Seq(count(lit(1)).as("n")),
        "30 minutes")
    assert(ds.toDF.agg(sum("n")).head.getLong(0) == events.count())
  }

  test("join on named columns + residual filter") {
    val orders = ctx.fromDF(Graft.table(spark, sf, "orders"))
    val cust = ctx.fromDF(Graft.table(spark, sf, "customer"))
    val j = orders.join(cust, "inner", Seq("o_custkey"), Seq("c_custkey"),
      filter = Some(col("o_totalprice") > 100000))
    val expected = Graft.table(spark, sf, "orders")
      .filter(col("o_totalprice") > 100000).count()
    assert(j.toDF.count() == expected)
  }

  test("joinOn theta join") {
    val n1 = ctx.fromDF(Graft.table(spark, sf, "nation"))
    val n2 = DataStream(Graft.table(spark, sf, "nation")
      .select(col("n_nationkey").as("k2"), col("n_regionkey").as("r2")))
    val j = n1.joinOn(n2, "inner",
      col("n_regionkey") === col("r2") && col("n_nationkey") < col("k2"))
    assert(j.toDF.count() == 50)
  }

  test("semi/anti join types pass through") {
    val cust = ctx.fromDF(Graft.table(spark, sf, "customer"))
    val orders = ctx.fromDF(Graft.table(spark, sf, "orders"))
    val semi = cust.join(orders, "left_semi", Seq("c_custkey"), Seq("o_custkey"))
    val anti = cust.join(orders, "left_anti", Seq("c_custkey"), Seq("o_custkey"))
    assert(semi.toDF.count() + anti.toDF.count() ==
      Graft.table(spark, sf, "customer").count())
  }

  test("asOfJoin bridge dispatches all three directions") {
    import spark.implicits._
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val l = Seq((1L, "A", ts(10000))).toDF("id", "k", "lts")
    val r = Seq(("A", ts(9000), "back"), ("A", ts(10500), "fwd"))
      .toDF("rk", "rts", "v")
    def run(dir: String) = DataStream(l)
      .asOfJoin(DataStream(r), Seq("k"), Seq("rk"), "lts", "rts", dir)
      .toDF.select($"v").head.getString(0)
    assert(run("backward") == "back")
    assert(run("forward") == "fwd")
    assert(run("nearest") == "fwd", "10.5s is closer to 10s than 9s")
    intercept[IllegalArgumentException](run("sideways"))
  }

  test("curation bridges mirror the operator library; packChunks " +
      "dispatches to the streaming packer on streaming frames") {
    import spark.implicits._
    val docs = Graft.table(spark, sf, "documents")
    val viaBridge = DataStream(docs)
      .hashSample("doc_id", 0.4)
      .weightedSample("doc_id", $"n_chars" / lit(300.0))
      .splitByHash("doc_id", Seq("train" -> 0.9, "val" -> 0.1))
      .redactPii("text")
      .packChunks("doc_id", "n_chars", capacity = 2048L)
      .toDF.select($"doc_id", $"split", $"text", $"shard", $"start")
    val viaOps = graft.operators.Packing.packChunks(
      graft.operators.Sampling.splitByHash(
        graft.operators.Sampling.weightedHashSample(
          graft.operators.Sampling.hashSample(docs, "doc_id", 0.4),
          "doc_id", $"n_chars" / lit(300.0)),
        "doc_id", Seq("train" -> 0.9, "val" -> 0.1))
        .withColumn("text",
          graft.operators.TextAnalysis.redactPii($"text")),
      "doc_id", "n_chars", capacity = 2048L)
      .select($"doc_id", $"split", $"text", $"shard", $"start")
    assert(viaBridge.exceptAll(viaOps).isEmpty &&
      viaOps.exceptAll(viaBridge).isEmpty)

    // shuffleByHash mirrors the operator order and is batch-only
    val shuffled = DataStream(docs).shuffleByHash("doc_id")
      .toDF.select($"doc_id").as[Long].collect()
    assert(shuffled.sameElements(
      graft.operators.Sampling.shuffleByHash(docs, "doc_id")
        .select($"doc_id").as[Long].collect()))

    // streaming dispatch: the plan must be the stateful packer
    // (TransformWithState), not the batch window
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long](spark)
    val packed = DataStream(stream.toDF.withColumnRenamed("value", "id")
        .withColumn("n", lit(10L)))
      .packChunks("id", "n", capacity = 64L)
    assert(packed.toDF.isStreaming)
    val plan = packed.toDF.queryExecution.analyzed.toString
    assert(plan.contains("TransformWithState"),
      s"streaming packChunks must plan the stateful packer:\n$plan")
    // a global sort cannot stream — the bridge must refuse, not plan
    intercept[IllegalArgumentException](
      DataStream(stream.toDF.withColumnRenamed("value", "id"))
        .shuffleByHash("id"))

    // stripBoilerplate mirrors the operator; corpus-wide line
    // frequency cannot stream — refuse there too
    val viaStrip = DataStream(docs).stripBoilerplate("doc_id", "text").toDF
    val viaStripOps = graft.operators.TextAnalysis.stripBoilerplateLines(
      docs, "doc_id", "text")
    assert(viaStrip.exceptAll(viaStripOps).isEmpty &&
      viaStripOps.exceptAll(viaStrip).isEmpty)
    intercept[IllegalArgumentException](
      DataStream(stream.toDF.withColumnRenamed("value", "id")
          .withColumn("text", lit("x")))
        .stripBoilerplate("id", "text"))

    // temperatureMix mirrors the operator; corpus-wide domain counts
    // cannot stream — refuse
    val viaMix = DataStream(docs).temperatureMix("doc_id", "lang").toDF
    val viaMixOps = graft.operators.Sampling.temperatureMixSample(
      docs, "doc_id", "lang")
    assert(viaMix.exceptAll(viaMixOps).isEmpty &&
      viaMixOps.exceptAll(viaMix).isEmpty)
    intercept[IllegalArgumentException](
      DataStream(stream.toDF.withColumnRenamed("value", "id")
          .withColumn("lang", lit("en")))
        .temperatureMix("id", "lang"))
  }
}
