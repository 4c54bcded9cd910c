package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.streaming.StreamingQueryListener
import scala.collection.mutable.ArrayBuffer

/** Round-17 optimization scratch profiler (not part of the driver
  * contract) for the STREAMING bench rows, which live in Bench's
  * extra runners rather than SparkEntry.queries and so are invisible
  * to [[ProfileR16]]. Two listeners decompose each run:
  *
  *  - a StreamingQueryListener records every micro-batch's
  *    durationMs map (triggerExecution / queryPlanning / getBatch /
  *    addBatch / walCommit / commitOffsets / latestOffset) plus the
  *    per-batch state-store metrics — the committed evidence for
  *    "where does a streaming row's wall-clock actually go";
  *  - the ProfileR16-style job listener records job spans and driver
  *    gaps so batch-side jobs (baseline builds, schema reads) are
  *    separated from the streaming query itself.
  *
  * Usage: GRAFT_PROFILE_ONLY=streaming_neardup,streaming_window \
  *        sbt -batch "runMain graft.ProfileR17"
  */
object ProfileR17 {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = sys.env.getOrElse("GRAFT_PROFILE_ONLY", "streaming_window")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val reps = sys.env.getOrElse("GRAFT_PROFILE_REPS", "2").toInt
    val spark = Graft.session(appName = "graft-profile-r17")

    case class JobRec(id: Int, t0: Long, var t1: Long = -1L,
                      var stages: Int = 0, var tasks: Int = 0)
    val jobs = ArrayBuffer.empty[JobRec]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized {
          jobs += JobRec(e.jobId, System.nanoTime(),
            stages = e.stageInfos.size,
            tasks = e.stageInfos.map(_.numTasks).sum)
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.find(_.id == e.jobId).foreach(_.t1 = System.nanoTime())
        }
    })

    // micro-batch progress: durations per phase + state-store metrics
    case class BatchRec(batchId: Long, rows: Long,
                        dur: Map[String, Long], stateDesc: String)
    val batches = ArrayBuffer.empty[BatchRec]
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        batches.synchronized {
          val p = e.progress
          val dur = {
            val it = p.durationMs.entrySet().iterator()
            val b = Map.newBuilder[String, Long]
            while (it.hasNext) {
              val en = it.next(); b += en.getKey -> en.getValue.longValue()
            }
            b.result()
          }
          val st = p.stateOperators.map { s =>
            s"rows=${s.numRowsTotal} updated=${s.numRowsUpdated} " +
              f"commitMs=${s.commitTimeMs} memUsed=${s.memoryUsedBytes}"
          }.mkString(" | ")
          batches += BatchRec(p.batchId, p.numInputRows, dur, st)
        }
    })

    // ---- the streaming runner bodies, mirroring Bench's exactly ----
    def runStreamingWindow(): Unit = {
      val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
      val src = spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(sfDir)
      val q = graft.api.DataStream(Graft.normalizeTs(src), "ts")
        .window(Seq(col("event_type")),
          Seq(count(lit(1)).as("n"), min(col("value")).as("mn"),
            max(col("value")).as("mx"), avg(col("value")).as("av")),
          "1 hour", Some("30 minutes"))
        .sinkMemory("prof_stream")
      try q.processAllAvailable()
      finally { q.stop(); spark.sql("DROP TABLE IF EXISTS prof_stream") }
    }

    def runStreamingNearDup(): Unit = {
      val schema = spark.read.parquet(s"$sfDir/documents.parquet").schema
      val base = spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(sfDir)
        .select(col("doc_id"), col("text"))
      val mutated = base
        .withColumn("doc_id", col("doc_id") + 1000000L)
        .withColumn("text", regexp_replace(col("text"), "the", "thee"))
      val src = base.unionByName(mutated)
        .withColumn("ts",
          timestamp_millis(pmod(col("doc_id"), lit(1000000L)) * 20))
      val out = graft.streaming.StreamingDedup.simhashPairs(src,
        graft.functions.simhash64_md5(
          graft.operators.TextAnalysis.tokenize(col("text"))),
        "doc_id", "ts", horizonMs = 86400000L)
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName("prof_sneardup").start()
      try q.processAllAvailable()
      finally { q.stop(); spark.sql("DROP TABLE IF EXISTS prof_sneardup") }
    }

    def runStreamingEmbDedup(): Unit = {
      val schema = spark.read.parquet(s"$sfDir/embeddings.parquet").schema
      val base = spark.readStream.schema(schema)
        .option("pathGlobFilter", "embeddings.parquet").parquet(sfDir)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double"))
            .as("embedding"))
      val mutated = base
        .withColumn("vec_id", col("vec_id") + 1000000L)
        .withColumn("embedding", concat(
          array(element_at(col("embedding"), 1) + lit(0.015625)),
          slice(col("embedding"), 2, 63)))
      val src = base.unionByName(mutated)
        .withColumn("ts", timestamp_millis(
          (pmod(col("vec_id"), lit(1000000L)) + 1) * 10))
      val out = graft.streaming.StreamingDedup.embeddingPairs(src,
        "embedding", "vec_id", "ts", horizonMs = 86400000L,
        threshold = 0.9, nPlanes = 16, dim = 64, nTables = 8)
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName("prof_sembdedup").start()
      try q.processAllAvailable()
      finally { q.stop(); spark.sql("DROP TABLE IF EXISTS prof_sembdedup") }
    }

    def runDistinctMonitor(): Unit = {
      val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
      val src = spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(sfDir)
      val q = graft.api.DataStream(Graft.normalizeTs(src), "ts")
        .distinctMonitor("user_id", "1 hour")
        .sinkMemory("prof_monitor")
      try q.processAllAvailable()
      finally { q.stop(); spark.sql("DROP TABLE IF EXISTS prof_monitor") }
    }

    def runHealthMonitor(): Unit = {
      val bounds = Seq(10.0, 25.0, 50.0, 100.0, 200.0)
      val baseEv = Graft.normalizeTs(
        spark.read.parquet(s"$sfDir/events.parquet"))
        .filter(unix_millis(col("ts")) < 1705276800000L)
      val fracs = graft.operators.Drift.histFractions(baseEv, "value",
        bounds).toSeq
      val cats = graft.operators.Drift.categoryFractions(baseEv,
        "event_type", topN = 3)
      val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
      val src = spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(sfDir)
      val q = graft.api.DataStream(Graft.normalizeTs(src), "ts")
        .healthMonitor("user_id", "1 hour",
          value = Some(graft.operators.Drift.ValueBaseline(
            "value", bounds, fracs)),
          category = Some(graft.operators.Drift.CategoryBaseline(
            "event_type", cats)),
          k = 8192)
        .sinkMemory("prof_health")
      try q.processAllAvailable()
      finally { q.stop(); spark.sql("DROP TABLE IF EXISTS prof_health") }
    }

    def runExactWindow(pane: Boolean): Unit = {
      import graft.streaming.ExactWindow
      val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
      val src = spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(sfDir)
      val srcTs = Graft.normalizeTs(src)
        .filter(col("value").isNotNull)
        .select(col("event_type"), col("ts"),
          col("value").cast("double").as("value"))
      val aggs = Seq(ExactWindow.ExactAgg.count("n", "value"),
        ExactWindow.ExactAgg.sum("sum", "value"),
        ExactWindow.ExactAgg.min("mn", "value"),
        ExactWindow.ExactAgg.max("mx", "value"),
        ExactWindow.ExactAgg.avg("av", "value"))
      val out =
        if (pane) ExactWindow.slidingPanes(srcTs, Seq("event_type"), "ts",
          lengthMs = 3600000L, slideMs = 300000L, aggs)
        else ExactWindow.slidingRows(srcTs, Seq("event_type"), "ts",
          lengthMs = 3600000L, slideMs = 300000L, aggs)
      val name = if (pane) "prof_ew_pane" else "prof_ew_explode"
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try q.processAllAvailable()
      finally { q.stop(); spark.sql(s"DROP TABLE IF EXISTS $name") }
    }

    def runByteUnigramTrain(): Unit = {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("text"))
      val vocab = graft.operators.Tokenizer.learnByteUnigram(
        docs, "text", vocabSize = 512)
      require(vocab.nonEmpty, "no vocab learned")
      val n = docs.select(graft.functions
          .byte_unigram_encode(col("text"), vocab).as("toks"))
        .select(explode(col("toks")).as("t"))
        .count()
      require(n > 0, "no tokens emitted")
    }

    def runUnigramTrain(): Unit = {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("text"))
      val vocab = graft.operators.Tokenizer.learnUnigram(
        docs, "text", vocabSize = 512)
      require(vocab.nonEmpty, "no vocab learned")
      val n = docs.select(graft.functions
          .unigram_encode(col("text"), vocab).as("toks"))
        .select(explode(col("toks")).as("t"))
        .count()
      require(n > 0, "no tokens emitted")
    }

    val runners: Map[String, () => Unit] = Map(
      "byte_unigram_train" -> (() => runByteUnigramTrain()),
      "unigram_train" -> (() => runUnigramTrain()),
      "streaming_window" -> (() => runStreamingWindow()),
      "streaming_neardup" -> (() => runStreamingNearDup()),
      "streaming_embdedup" -> (() => runStreamingEmbDedup()),
      "streaming_distinct_monitor" -> (() => runDistinctMonitor()),
      "streaming_health_monitor" -> (() => runHealthMonitor()),
      "exact_window_explode" -> (() => runExactWindow(pane = false)),
      "exact_window_pane" -> (() => runExactWindow(pane = true)))

    // warmup
    SparkEntry.queries("q1_agg")(spark, sfDir)
      .write.mode("overwrite").format("noop").save()
    SparkEntry.queries("q1_agg")(spark, sfDir)
      .write.mode("overwrite").format("noop").save()

    names.foreach { name =>
      val run = runners.getOrElse(name,
        () => SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save())
      (1 to reps).foreach { rep =>
        System.gc(); Thread.sleep(300)
        jobs.synchronized(jobs.clear())
        batches.synchronized(batches.clear())
        val t0 = System.nanoTime()
        run()
        val total = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // settle so late listener events land
        val js = jobs.synchronized(jobs.toVector).sortBy(_.t0)
        val jobTime = js.filter(_.t1 > 0).map(j => (j.t1 - j.t0) / 1e9).sum
        println(f"== $name rep$rep: total=$total%.3f s, " +
          f"jobs=${js.size}, sum(job wall)=$jobTime%.3f s, " +
          f"non-job=${total - jobTime}%.3f s")
        var prevEnd = t0
        js.foreach { j =>
          val gap = (j.t0 - prevEnd) / 1e9
          val dur = if (j.t1 > 0) (j.t1 - j.t0) / 1e9 else -1.0
          println(f"   gap=$gap%.3f s | job ${j.id}%3d dur=$dur%.3f s " +
            f"stages=${j.stages} tasks=${j.tasks}")
          if (j.t1 > prevEnd) prevEnd = j.t1
        }
        val bs = batches.synchronized(batches.toVector).sortBy(_.batchId)
        bs.foreach { b =>
          val d = b.dur.toSeq.sortBy(-_._2)
            .map { case (k, v) => s"$k=${v}ms" }.mkString(" ")
          println(s"   batch ${b.batchId} rows=${b.rows} $d")
          if (b.stateDesc.nonEmpty) println(s"     state: ${b.stateDesc}")
        }
      }
    }
    spark.stop()
  }
}
