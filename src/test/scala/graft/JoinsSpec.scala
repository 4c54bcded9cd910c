package graft

import org.apache.spark.sql.{Column, DataFrame}
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

  test("asOfJoinBackward merge form matches the rank form") {
    // randomized-but-deterministic workload incl. a hot key, duplicate
    // timestamps, and keys present on only one side
    val rnd = new scala.util.Random(7)
    val lrows = (1 to 400).map { i =>
      val k = if (i % 3 == 0) "hot" else s"k${rnd.nextInt(20)}"
      (i.toLong, k, ts(rnd.nextInt(100) * 1000L))
    }
    val rrows = (1 to 600).map { i =>
      val k = if (i % 2 == 0) "hot" else s"k${rnd.nextInt(25)}"
      (i.toLong, k, ts(rnd.nextInt(100) * 1000L), rnd.nextDouble())
    }
    val l = lrows.toDF("lid", "k", "lts")
    val r = rrows.toDF("rid", "rk", "rts", "v")
    for (tol <- Seq(None, Some("30 seconds"))) {
      val merge = Joins.asOfJoinBackward(l, r, Seq("k"), Seq("rk"),
        "lts", "rts", tol)
        .select($"lid", unix_millis($"rts").as("rt"))
      val rank = Joins.asOfJoinBackwardViaRank(l, r, Seq("k"), Seq("rk"),
        "lts", "rts", tol)
        .select($"lid", unix_millis($"rts").as("rt"))
      // compare on matched TIMESTAMP (the as-of contract); tied-ts row
      // identity is checked separately below
      assert(merge.exceptAll(rank).isEmpty && rank.exceptAll(merge).isEmpty,
        s"merge vs rank mismatch at tolerance=$tol")
      assert(merge.count() == l.count(), "one output row per left row")
    }
  }

  test("asOfJoinBackward ignores right rows with null timestamps") {
    val l = Seq((1L, "A", ts(10000))).toDF("lid", "k", "lts")
    val r = Seq(("A", Option.empty[java.sql.Timestamp], "ghost"),
      ("A", Some(ts(5000)), "real")).toDF("rk", "rts", "v")
    for (tol <- Seq(None, Some("1 minute"))) {
      val got = Joins.asOfJoinBackward(l, r, Seq("k"), Seq("rk"),
        "lts", "rts", tol).select($"v").head.getString(0)
      assert(got == "real",
        s"null-ts right row must never match (tolerance=$tol)")
    }
    // only the null-ts row present → left survives unmatched
    val ghostOnly = Seq(("A", Option.empty[java.sql.Timestamp], "ghost"))
      .toDF("rk", "rts", "v")
    val row = Joins.asOfJoinBackward(l, ghostOnly, Seq("k"), Seq("rk"),
      "lts", "rts").select($"v").head
    assert(row.isNullAt(0), "left must survive with nulls")
  }

  test("asOfJoinBackward tie-break matches rank form (equal timestamps)") {
    val l = Seq((1L, "A", ts(10000))).toDF("lid", "k", "lts")
    val r = Seq(("A", ts(10000), "r1"), ("A", ts(10000), "r2"),
      ("A", ts(10000), "r3")).toDF("rk", "rts", "v")
    val merge = Joins.asOfJoinBackward(l, r, Seq("k"), Seq("rk"),
      "lts", "rts").select($"v").head.getString(0)
    val rank = Joins.asOfJoinBackwardViaRank(l, r, Seq("k"), Seq("rk"),
      "lts", "rts").select($"v").head.getString(0)
    assert(merge == rank, "equal-ts winner must be hash-deterministic")
  }

  test("asOfJoinBackward never materializes candidate pairs") {
    // hot-key torture: 1 key, 2000 lefts × 2000 rights. The rank form
    // would build 4M candidate rows; the merge form peaks at |L|+|R|.
    val l = (1 to 2000).map(i => (i.toLong, "hot", ts(i * 1000L)))
      .toDF("lid", "k", "lts")
    val r = (1 to 2000).map(i => (i.toLong, "hot", ts(i * 500L), i * 1.0))
      .toDF("rid2", "rk", "rts", "v")
    val joined = Joins.asOfJoinBackward(l, r, Seq("k"), Seq("rk"),
      "lts", "rts")
    assert(joined.count() == 2000)
    // plan shape: no range-predicate join before the window — the only
    // joins are the final id equi-join (and the physical plan carries
    // a Window over the union, not a join fan-out)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), "merge form must plan a window")
    assert(!plan.toLowerCase.contains("cartesian"),
      "no cartesian fan-out in the as-of merge plan")
    // spot-check: left at 3000ms matches the latest right on the 500ms
    // grid, i.e. rts = 3000ms exactly
    val row = joined.filter($"lid" === 3).select(unix_millis($"rts")).head
    assert(row.getLong(0) == 3000L)
  }

  test("asOfJoinForward and asOfJoinNearest never materialize " +
      "candidate pairs either") {
    val l = (1 to 2000).map(i => (i.toLong, "hot", ts(i * 1000L)))
      .toDF("lid", "k", "lts")
    val r = (1 to 2000).map(i => (i.toLong, "hot", ts(i * 500L), i * 1.0))
      .toDF("rid2", "rk", "rts", "v")
    val fwd = Joins.asOfJoinForward(l, r, Seq("k"), Seq("rk"),
      "lts", "rts")
    assert(fwd.count() == 2000)
    val fplan = fwd.queryExecution.executedPlan.toString
    assert(fplan.contains("Window") &&
      !fplan.toLowerCase.contains("cartesian"))
    // left at 3000ms: earliest right >= 3000 on the 500ms grid is 3000
    assert(fwd.filter($"lid" === 3).select(unix_millis($"rts"))
      .head.getLong(0) == 3000L)

    val near = Joins.asOfJoinNearest(l, r, Seq("k"), Seq("rk"),
      "lts", "rts")
    assert(near.count() == 2000)
    val nplan = near.queryExecution.executedPlan.toString
    assert(nplan.contains("Window") &&
      !nplan.toLowerCase.contains("cartesian"))
    // one Exchange for both window passes: the two carries share the
    // partitioning, so nearest costs one shuffle + two sorts
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(nplan).length
    assert(exchanges <= 1,
      s"nearest must reuse one partitioning for both carries:\n$nplan")
  }

  test("asOfJoinBackward with day-time tolerance partitions by time bucket") {
    val l = Seq((1L, "A", ts(100000))).toDF("lid", "k", "lts")
    val r = Seq(("A", ts(90000), 1.0)).toDF("rk", "rts", "v")
    val bucketed = Joins.asOfJoinBackward(l, r, Seq("k"), Seq("rk"),
      "lts", "rts", tolerance = Some("30 seconds"))
    // hot-key skew protection: the window partition key must include
    // the time bucket so one key's history spreads over many tasks.
    // Checking for the explode (right-row bucket replication) and a
    // non-constant bucket, not just the column name: a dead path
    // emitting `0 AS __bkt` contains the name too (the Spark 4 lazy
    // expr() regression hid exactly that way until the task-level
    // measurement below caught it)
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(plan.contains("__bkt"),
      s"tolerance path must time-bucket the sort partition:\n$plan")
    assert(plan.toLowerCase.contains("generate explode") ||
        plan.toLowerCase.contains("explode("),
      s"right rows must replicate into adjacent buckets:\n$plan")
    assert(!plan.contains("0 AS __bkt"),
      s"the bucket must derive from the timestamp, not a constant:\n$plan")
    // year-month tolerance has no fixed length → plain per-key path
    val monthly = Joins.asOfJoinBackward(l, r, Seq("k"), Seq("rk"),
      "lts", "rts", tolerance = Some("1 MONTH"))
    assert(monthly.count() == 1, "year-month tolerance still works")
  }

  test("task-level skew balance: bucketed merge spreads a hot key over " +
      "many tasks; plain merge and rank-form candidates concentrate it") {
    // MEASUREMENT, not plan-shape: spark_partition_id() captured right
    // after the operator (only narrow ops follow the window/join
    // exchange) is the actual task that processed each row. AQE off so
    // runtime coalescing can't merge the tiny fixture's partitions and
    // mask (or fake) the spread.
    val adaptiveWas = spark.conf.get("spark.sql.adaptive.enabled")
    val broadcastWas = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val rnd = new scala.util.Random(11)
      // one key carries ~30% of both sides; timestamps span ~100
      // 30-second tolerance buckets. repartition() forces a genuinely
      // distributed input — a LocalRelation would let Catalyst evaluate
      // the whole query on the driver, where every pid reads 0
      def key(i: Int) = if (i % 10 < 3) "hot" else s"k${rnd.nextInt(40)}"
      val l = (1 to 2000).map(i =>
        (i.toLong, key(i), ts(rnd.nextInt(3000) * 1000L)))
        .toDF("lid", "k", "lts").repartition(5)
      val r = (1 to 2000).map(i =>
        (i.toLong, key(i), ts(rnd.nextInt(3000) * 1000L), rnd.nextDouble()))
        .toDF("rid2", "rk", "rts", "v").repartition(5)

      // rows of the hot key per task, at the operator's own partitioning.
      // The agg also hashes EVERY output column AND KEEPS IT in the
      // collected result: without a surviving anchor, column pruning
      // drops the operator's Window (it neither filters rows nor feeds
      // the count) along with its exchange, and the pids silently
      // degrade to the scan stage's round-robin spread
      def hotRowsPerTask(df: DataFrame, hot: Column): Seq[Long] =
        df.withColumn("__pid", spark_partition_id())
          .filter(hot).groupBy($"__pid")
          .agg(count(lit(1)).as("n"),
            sum(pmod(xxhash64(df.columns.map(col): _*), lit(1000003L)))
              .as("__anchor"))
          .as[(Int, Long, Long)].collect().toSeq.map(_._2)

      // (a) time-bucketed merge: window partitions on (key, bucket) —
      // the hot key's rows must land on >1 task, with no single task
      // holding a majority (the balance HALF of round-2 item #5)
      val bucketed = Joins.asOfJoinBackward(l, r, Seq("k"), Seq("rk"),
        "lts", "rts", tolerance = Some("30 seconds"))
      val bPerTask = hotRowsPerTask(bucketed, $"k" === "hot")
      assert(bPerTask.size > 1,
        s"bucketed merge must spread the hot key, got ${bPerTask.size} task")
      assert(bPerTask.max * 2 < bPerTask.sum,
        "no single task may process a majority of the hot key's rows: " +
          s"max=${bPerTask.max} of total=${bPerTask.sum}")

      // (b) the un-bucketed merge FAILS the same assert: one sorted
      // partition per key is exactly the documented skew ceiling
      val plain = Joins.asOfJoinBackward(l, r, Seq("k"), Seq("rk"),
        "lts", "rts", tolerance = None)
      val pPerTask = hotRowsPerTask(plain, $"k" === "hot")
      assert(pPerTask.size == 1,
        s"plain merge concentrates the hot key on one task, got $pPerTask")

      // (c) the rank form's candidate join both CONCENTRATES (one task)
      // and FANS OUT (candidate pairs >> |L|+|R|) — the two failure
      // modes the merge form exists to avoid; the candidate frame below
      // is verbatim the rank form's join input
      val candidates = l.join(r,
        l("k") === r("rk") && r("rts") <= l("lts"), "left")
      val cPerTask = hotRowsPerTask(candidates, l("k") === "hot")
      assert(cPerTask.size == 1,
        s"rank-form candidates must collapse to one task, got $cPerTask")
      assert(cPerTask.sum > 2L * (2000 + 2000),
        "rank-form hot-key fan-out must exceed the merge form's whole " +
          s"|L|+|R| ceiling, got ${cPerTask.sum} candidate rows")

      // (d) saltedJoin spreads the same hot key the plain equi-join
      // concentrates (broadcast disabled so the join actually shuffles)
      val dim = (Seq("hot") ++ (0 until 40).map(i => s"k$i"))
        .map(k => (k, k.length)).toDF("k", "attr")
      val plainJoin = l.join(dim, Seq("k"))
      val plainJ = hotRowsPerTask(plainJoin, $"k" === "hot")
      assert(plainJ.size == 1,
        s"plain equi-join concentrates the hot key, got $plainJ")
      // saltFactor well above the partition count so the hash
      // allocation of (key, salt) pairs over partitions evens out
      val saltedJoin = Joins.saltedJoin(l, dim, Seq("k"), saltFactor = 32)
      val saltedJ = hotRowsPerTask(saltedJoin, $"k" === "hot")
      assert(saltedJ.size > 1,
        s"saltedJoin must spread the hot key, got ${saltedJ.size} task")
      assert(saltedJ.max * 2 < saltedJ.sum,
        s"salted hot-key rows must balance: max=${saltedJ.max} " +
          s"of ${saltedJ.sum}")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", adaptiveWas)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastWas)
    }
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

  test("asOfJoinForward picks earliest at-or-after right row per key, " +
      "tolerance bounds the lookahead") {
    val trades = Seq((1L, "A", ts(10000)), (2L, "A", ts(20000)),
      (3L, "B", ts(15000)), (4L, "C", ts(15000)))
      .toDF("trade_id", "sym", "tts")
    val quotes = Seq(("A", ts(9000), 99.5), ("A", ts(19000), 100.5),
      ("A", ts(25000), 777.0), ("B", ts(15000), 49.9))
      .toDF("qsym", "qts", "bid")
    val got = Joins.asOfJoinForward(trades, quotes,
      Seq("sym"), Seq("qsym"), "tts", "qts")
      .select($"trade_id", $"bid").as[(Long, Option[Double])]
      .collect().toMap
    assert(got == Map(
      1L -> Some(100.5),  // earliest quote >= 10s
      2L -> Some(777.0),  // 25s quote
      3L -> Some(49.9),   // equality counts as a forward match
      4L -> None))
    val bounded = Joins.asOfJoinForward(trades, quotes,
      Seq("sym"), Seq("qsym"), "tts", "qts",
      tolerance = Some("4 seconds"))
      .select($"trade_id", $"bid").as[(Long, Option[Double])]
      .collect().toMap
    assert(bounded(2L).isEmpty, "25s quote is past 20s + 4s tolerance")
    assert(bounded(1L).isEmpty, "19s quote is past 10s + 4s tolerance")
    assert(bounded(3L).contains(49.9))
  }

  test("asOfJoinForward merge form matches the rank form (incl. hot " +
      "key, dup timestamps, tolerance bucketing)") {
    val rnd = new scala.util.Random(11)
    val lrows = (1 to 400).map { i =>
      val k = if (i % 3 == 0) "hot" else s"k${rnd.nextInt(20)}"
      (i.toLong, k, ts(rnd.nextInt(100) * 1000L))
    }
    val rrows = (1 to 600).map { i =>
      val k = if (i % 2 == 0) "hot" else s"k${rnd.nextInt(25)}"
      (i.toLong, k, ts(rnd.nextInt(100) * 1000L), rnd.nextDouble())
    }
    val l = lrows.toDF("lid", "k", "lts")
    val r = rrows.toDF("rid", "rk", "rts", "v")
    for (tol <- Seq(None, Some("30 seconds"))) {
      val merge = Joins.asOfJoinForward(l, r, Seq("k"), Seq("rk"),
        "lts", "rts", tol)
        .select($"lid", unix_millis($"rts").as("rt"))
      val rank = Joins.asOfJoinForwardViaRank(l, r, Seq("k"), Seq("rk"),
        "lts", "rts", tol)
        .select($"lid", unix_millis($"rts").as("rt"))
      assert(merge.exceptAll(rank).isEmpty && rank.exceptAll(merge).isEmpty,
        s"forward merge vs rank mismatch at tolerance=$tol")
      assert(merge.count() == l.count(), "one output row per left row")
    }
  }

  test("asOfJoinNearest picks the closer side; ties prefer backward; " +
      "tolerance bounds both directions") {
    val l = Seq((1L, "A", ts(10000)), (2L, "A", ts(30000)),
      (3L, "A", ts(50000)), (4L, "B", ts(10000)))
      .toDF("id", "k", "lts")
    val r = Seq(("A", ts(7000), "b3"), ("A", ts(12000), "f2"),
      ("A", ts(26000), "b4"), ("A", ts(34000), "f4"),
      ("A", ts(49000), "b1"), ("A", ts(51000), "f1"))
      .toDF("rk", "rts", "v")
    val got = Joins.asOfJoinNearest(l, r, Seq("k"), Seq("rk"),
      "lts", "rts")
      .select($"id", $"v").as[(Long, Option[String])].collect().toMap
    assert(got(1L).contains("f2"), "12s is closer to 10s than 7s")
    assert(got(2L).contains("b4"), "equal 4s distance prefers backward")
    assert(got(3L).contains("b1"),
      "49s and 51s are both 1s from 50s — the tie prefers backward")
    assert(got(4L).isEmpty, "no B rows")
    val bounded = Joins.asOfJoinNearest(l, r, Seq("k"), Seq("rk"),
      "lts", "rts", tolerance = Some("1 second"))
      .select($"id", $"v").as[(Long, Option[String])].collect().toMap
    assert(bounded(1L).isEmpty && bounded(2L).isEmpty,
      "nothing within 1s of 10s/30s")
    assert(bounded(3L).contains("b1"), "49s is exactly 1s before 50s")
  }
}
