package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Joins

class JoinsSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  test("asOfJoinBackward picks latest prior right row per key") {
    val trades = Seq((1L, "A", ts(10000), 100.0), (2L, "A", ts(20000), 101.0),
      (3L, "B", ts(15000), 50.0), (4L, "C", ts(15000), 7.0))
      .toDF("trade_id", "sym", "tts", "px")
    val quotes = Seq(("A", ts(9000), 99.5), ("A", ts(19000), 100.5),
      ("A", ts(25000), 777.0), ("B", ts(15000), 49.9))
      .toDF("qsym", "qts", "bid")
    val got = Joins.asOfJoinBackward(trades, quotes,
      Seq("sym"), Seq("qsym"), "tts", "qts")
      .select($"trade_id", $"bid").as[(Long, Option[Double])]
      .collect().toMap
    assert(got == Map(
      1L -> Some(99.5),   // latest quote <= 10s
      2L -> Some(100.5),  // 19s quote, not the 25s one
      3L -> Some(49.9),   // equality counts as prior
      4L -> None))        // no quotes for C at all
  }

  test("asOfJoinBackward tolerance bounds the lookback") {
    val l = Seq((1L, "A", ts(100000))).toDF("id", "k", "lts")
    val r = Seq(("A", ts(10000), "stale")).toDF("rk", "rts", "v")
    val unbounded = Joins.asOfJoinBackward(l, r, Seq("k"), Seq("rk"),
      "lts", "rts").select($"v").head.getString(0)
    assert(unbounded == "stale")
    val bounded = Joins.asOfJoinBackward(l, r, Seq("k"), Seq("rk"),
      "lts", "rts", tolerance = Some("30 seconds"))
      .select($"v").head
    assert(bounded.isNullAt(0), "match older than tolerance must drop")
  }

  test("saltedJoin is row-identical to the plain equi-join") {
    val orders = Graft.table(spark, sf, "orders")
    val customer = Graft.table(spark, sf, "customer")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(customer, Seq("o_custkey"))
      .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"),
        round(sum($"o_totalprice"), 2).as("t"))
    val salted = Joins.saltedJoin(orders, customer, Seq("o_custkey"))
      .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"),
        round(sum($"o_totalprice"), 2).as("t"))
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }
}
