package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Sampling, TextAnalysis}
import graft.streaming.StreamingBudget

case class BudgetDoc(doc_id: Long, stratum: String, n_tok: Long)

/** Streaming token-budget admission: single-batch replay equals the
  * batch operator's kept set, cross-batch prefix-close semantics
  * (first overflow shuts the stratum), and checkpoint recovery of the
  * spent totals.
  */
class StreamingBudgetSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("single-batch replay reproduces the batch operator's kept set") {
    val docs = Graft.table(spark, sf, "documents")
      .select($"doc_id", $"lang",
        TextAnalysis.tokenCount($"text").cast("long").as("ntok"))
    val dir = Files.createTempDirectory("graft-sbudget").toFile
    val inPath = new java.io.File(dir, "in").getAbsolutePath
    docs.coalesce(1).write.parquet(inPath) // one file → one micro-batch

    val stream = spark.readStream
      .schema(spark.read.parquet(inPath).schema).parquet(inPath)
    val out = StreamingBudget.selectToTokenBudget(stream, "doc_id",
      "ntok", budget = 2000L, strataCol = Some("lang"))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sbudget_replay").start()
    try {
      q.processAllAvailable()
      val got = spark.table("sbudget_replay")
        .select($"doc_id").as[Long].collect().toSet
      val want = Sampling.selectToTokenBudget(docs, "doc_id", $"ntok",
          budget = 2000L, strataCol = Some("lang"))
        .select($"doc_id").as[Long].collect().toSet
      assert(got == want,
        s"single-batch streaming kept set must equal batch: " +
          s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    } finally q.stop()
  }

  test("first overflow closes the stratum: later smaller rows are " +
      "dropped (prefix, not best-fit); other strata unaffected") {
    val input = MemoryStream[BudgetDoc](spark)
    val out = StreamingBudget.selectToTokenBudget(input.toDF, "doc_id",
      "n_tok", budget = 100L, strataCol = Some("stratum"))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sbudget_close").start()
    try {
      input.addData(BudgetDoc(1, "a", 60), BudgetDoc(50, "b", 99))
      q.processAllAvailable()
      input.addData(BudgetDoc(2, "a", 50)) // 60+50 > 100 → closes "a"
      q.processAllAvailable()
      input.addData(BudgetDoc(3, "a", 10), // would fit greedily: 60+10
        BudgetDoc(51, "b", 1))             // "b" still open: 99+1 = 100
      q.processAllAvailable()
      val got = spark.table("sbudget_close")
        .select($"doc_id").as[Long].collect().toSet
      assert(got == Set(1L, 50L, 51L),
        s"prefix-close semantics violated: $got")
    } finally q.stop()
  }

  test("spent totals survive a checkpoint restart") {
    val dir = Files.createTempDirectory("graft-sbudget-rec").toFile
    val inputDir = new java.io.File(dir, "input"); inputDir.mkdirs()
    val ckpt = new java.io.File(dir, "ckpt").getAbsolutePath
    val outDir = new java.io.File(dir, "out").getAbsolutePath

    def writeBatch(rows: Seq[BudgetDoc]): Unit =
      rows.toDF().coalesce(1).write.mode("append")
        .parquet(inputDir.getAbsolutePath)

    def startQuery() = {
      val src = spark.readStream
        .schema(spark.read.parquet(inputDir.getAbsolutePath).schema)
        .parquet(inputDir.getAbsolutePath)
      StreamingBudget.selectToTokenBudget(src, "doc_id", "n_tok",
          budget = 100L, strataCol = Some("stratum"))
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .option("path", outDir).format("parquet").start()
    }

    writeBatch(Seq(BudgetDoc(1, "a", 70)))
    val q1 = startQuery(); q1.processAllAvailable(); q1.stop()

    // arrives while the query is DOWN: 70+40 > 100 must still close
    writeBatch(Seq(BudgetDoc(2, "a", 40)))
    val q2 = startQuery(); q2.processAllAvailable(); q2.stop()

    writeBatch(Seq(BudgetDoc(3, "a", 5))) // post-close: dropped
    val q3 = startQuery(); q3.processAllAvailable(); q3.stop()

    val kept = spark.read.parquet(outDir)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L),
      s"restart must resume spent=70 then close on overflow: $kept")
  }
}
