package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, TextAnalysis}
import graft.streaming.StreamingDedup

case class Doc(occurred_at_ms: Long, doc_id: Long, text: String)

case class EmbRow(occurred_at_ms: Long, vec_id: Long,
                  embedding: Seq[Double])

/** Streaming near-dup dedup (StreamingDedup): pair-set equivalence with
  * the batch LSH operators on a fully replayed input, canonical-band
  * single emission, horizon eviction, and checkpoint recovery.
  */
class StreamingDedupSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def docSig = graft.functions.simhash64_md5(
    TextAnalysis.tokenize(col("text")))

  /** Normalized unordered pair set with string ids (the streaming
    * operator casts ids to string; ordering within a pair is
    * lexicographic there vs numeric in batch).
    */
  private def pairSet(rows: Seq[(String, String, Int)]): Set[(Set[String], Int)] =
    rows.map { case (a, b, h) => (Set(a, b), h) }.toSet

  test("replaying the d5 fixture as a stream matches the batch pair set") {
    // the d5 gate fixture: documents plus one-word-mutated copies
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
    val mutated = docs
      .withColumn("doc_id", $"doc_id" + 1000000L)
      .withColumn("text", regexp_replace($"text", "the", "thee"))
    val all = docs.unionByName(mutated)
      // deterministic event times, all inside the horizon; orig and
      // mutant land at different instants so pairing crosses state
      .withColumn("ts", timestamp_millis(lit(1000L) +
        pmod($"doc_id", lit(1000000L)) * 20 +
        when($"doc_id" >= 1000000L, 1L).otherwise(0L)))

    val dir = Files.createTempDirectory("graft-sdedup").toFile
    val inPath = new java.io.File(dir, "in").getAbsolutePath
    all.write.parquet(inPath)

    val stream = spark.readStream
      .schema(spark.read.parquet(inPath).schema)
      .parquet(inPath)
    val out = StreamingDedup.simhashPairs(stream, docSig, "doc_id", "ts",
      horizonMs = 86400000L)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sdedup_d5").start()
    try {
      q.processAllAvailable()
      val got = spark.table("sdedup_d5")
        .select($"doc_id_1", $"doc_id_2", $"hamming")
        .as[(String, String, Int)].collect().toSeq
      val want = Dedup.simhashPairsFromSig(all, docSig, "doc_id")
        .select($"doc_id_1".cast("string"), $"doc_id_2".cast("string"),
          $"hamming")
        .as[(String, String, Int)].collect().toSeq
      assert(want.nonEmpty, "fixture must produce pairs")
      assert(got.length == pairSet(got).size,
        "each pair must emit exactly once (canonical band)")
      assert(pairSet(got) == pairSet(want),
        s"stream pair set must equal batch: got ${got.length}, " +
          s"want ${want.length}")
    } finally q.stop()
  }

  test("streaming IMAGE near-dup: decode → dHash → banded state " +
      "matches the batch m7 recipe on a replayed bounded input") {
    import graft.operators.Multimodal
    // the m7 fixture shape at micro scale: 60 patterned images plus a
    // re-encode of every 10th (same pattern, other container, new id)
    val base = spark.range(60).select($"id".as("doc_id"),
      Multimodal.encodeTestImagePattern(
        element_at(array(lit("png"), lit("bmp")),
          (pmod($"id", lit(2)) + 1).cast("int")),
        (pmod($"id", lit(28)) + 9).cast("int"),
        (pmod($"id", lit(17)) + 8).cast("int"),
        pmod($"id" * 7, lit(256)).cast("int")).as("blob"))
    val copies = base.filter(pmod($"doc_id", lit(10)) === 0)
      .withColumn("doc_id", $"doc_id" + 1000000L)
    val all = base.unionByName(copies)
      .withColumn("ts", timestamp_millis(lit(1000L) +
        pmod($"doc_id", lit(1000000L)) * 20 +
        when($"doc_id" >= 1000000L, 1L).otherwise(0L)))
    val dir = Files.createTempDirectory("graft-simgdedup").toFile
    val inPath = new java.io.File(dir, "in").getAbsolutePath
    all.write.parquet(inPath)
    val stream = spark.readStream
      .schema(spark.read.parquet(inPath).schema)
      .parquet(inPath)
    val out = StreamingDedup.simhashPairs(stream,
      Multimodal.imageDHash($"blob"), "doc_id", "ts",
      horizonMs = 86400000L)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("simgdedup").start()
    try {
      q.processAllAvailable()
      val got = spark.table("simgdedup")
        .select($"doc_id_1", $"doc_id_2", $"hamming")
        .as[(String, String, Int)].collect().toSeq
      val want = Dedup.simhashPairsFromSig(
          Multimodal.imageDHashPartitions(all, "blob", "doc_id"),
          col("dhash"), "doc_id")
        .select($"doc_id_1".cast("string"), $"doc_id_2".cast("string"),
          $"hamming")
        .as[(String, String, Int)].collect().toSeq
      assert(want.nonEmpty, "fixture must produce image pairs")
      // every copy pairs with its original at hamming 0
      val copyPairs = got.filter { case (a, b, _) =>
        math.abs(a.toLong - b.toLong) == 1000000L }
      assert(copyPairs.size == 6 && copyPairs.forall(_._3 == 0))
      assert(got.length == pairSet(got).size,
        "each pair must emit exactly once")
      assert(pairSet(got) == pairSet(want),
        "stream image pair set must equal the batch m7 recipe")
    } finally q.stop()
  }

  test("streaming AUDIO near-dup: decode → energy fingerprint → " +
      "banded state pairs re-gained re-containered copies at hamming 0") {
    import graft.operators.Multimodal
    // the m11 fixture shape at micro scale: 40 patterned recordings,
    // every 10th re-encoded at 2× gain in a different container
    def enc(ids: org.apache.spark.sql.DataFrame, shift: Int, gain: Int) = {
      val src = when($"doc_id" >= 1000000L, $"doc_id" - 1000000L)
        .otherwise($"doc_id")
      ids.select($"doc_id", Multimodal.encodeTestAudioPattern(
        element_at(array(lit("wave"), lit("aiff"), lit("au")),
          (pmod(src + lit(shift), lit(3)) + 1).cast("int")),
        lit(8000), (pmod(src, lit(3)) + 2).cast("int"),
        pmod(src * 13, lit(100003)).cast("int"), lit(gain)).as("blob"))
    }
    val ids = spark.range(40).select($"id".as("doc_id"))
    val base = enc(ids, 0, 1)
    val copies = enc(ids.filter(pmod($"doc_id", lit(10)) === 0)
      .withColumn("doc_id", $"doc_id" + 1000000L), 1, 2)
    val all = base.unionByName(copies)
      .withColumn("ts", timestamp_millis(lit(1000L) +
        pmod($"doc_id", lit(1000000L)) * 20 +
        when($"doc_id" >= 1000000L, 1L).otherwise(0L)))
    val dir = Files.createTempDirectory("graft-sandedup").toFile
    val inPath = new java.io.File(dir, "in").getAbsolutePath
    all.write.parquet(inPath)
    val stream = spark.readStream
      .schema(spark.read.parquet(inPath).schema).parquet(inPath)
    val out = StreamingDedup.simhashPairs(stream,
      Multimodal.audioFingerprint($"blob"), "doc_id", "ts",
      horizonMs = 86400000L)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sandedup").start()
    try {
      q.processAllAvailable()
      val got = spark.table("sandedup")
        .select($"doc_id_1", $"doc_id_2", $"hamming")
        .as[(String, String, Int)].collect().toSeq
      val want = Dedup.simhashPairsFromSig(
          Multimodal.audioFingerprintPartitions(all, "blob", "doc_id"),
          col("afp"), "doc_id")
        .select($"doc_id_1".cast("string"), $"doc_id_2".cast("string"),
          $"hamming")
        .as[(String, String, Int)].collect().toSeq
      val copyPairs = got.filter { case (a, b, _) =>
        math.abs(a.toLong - b.toLong) == 1000000L }
      assert(copyPairs.size == 4 && copyPairs.forall(_._3 == 0),
        "each re-gained copy must pair with its original at hamming 0")
      assert(got.length == pairSet(got).size)
      assert(pairSet(got) == pairSet(want),
        "stream audio pair set must equal the batch m11 recipe")
    } finally q.stop()
  }

  test("streaming VIDEO near-dup: decode → temporal fingerprint → " +
      "banded state pairs re-encoded sequences at hamming 0") {
    import graft.operators.Multimodal
    // the m12 fixture shape at micro scale: 12 patterned AVIs, every
    // 3rd re-encoded at other dims/fps (same frame sequence)
    def enc(ids: org.apache.spark.sql.DataFrame, dw: Int, dfps: Int) = {
      val src = when($"doc_id" >= 1000000L, $"doc_id" - 1000000L)
        .otherwise($"doc_id")
      ids.select($"doc_id", Multimodal.encodeTestVideoAviPattern(
        (pmod(src, lit(5)) + 8 + dw).cast("int"),
        (pmod(src, lit(3)) + 6).cast("int"),
        (pmod(src, lit(4)) + 66).cast("int"),
        pmod(src * 17, lit(99991)).cast("int"),
        lit(10 + dfps)).as("blob"))
    }
    val ids = spark.range(12).select($"id".as("doc_id"))
    val base = enc(ids, 0, 0)
    val copies = enc(ids.filter(pmod($"doc_id", lit(3)) === 0)
      .withColumn("doc_id", $"doc_id" + 1000000L), 4, 5)
    val all = base.unionByName(copies)
      .withColumn("ts", timestamp_millis(lit(1000L) +
        pmod($"doc_id", lit(1000000L)) * 20 +
        when($"doc_id" >= 1000000L, 1L).otherwise(0L)))
    val dir = Files.createTempDirectory("graft-svdedup").toFile
    val inPath = new java.io.File(dir, "in").getAbsolutePath
    all.write.parquet(inPath)
    val stream = spark.readStream
      .schema(spark.read.parquet(inPath).schema).parquet(inPath)
    val out = StreamingDedup.simhashPairs(stream,
      Multimodal.videoFingerprint($"blob"), "doc_id", "ts",
      horizonMs = 86400000L)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("svdedup").start()
    try {
      q.processAllAvailable()
      val got = spark.table("svdedup")
        .select($"doc_id_1", $"doc_id_2", $"hamming")
        .as[(String, String, Int)].collect().toSeq
      val want = Dedup.simhashPairsFromSig(
          Multimodal.videoFingerprintPartitions(all, "blob", "doc_id"),
          col("vfp"), "doc_id")
        .select($"doc_id_1".cast("string"), $"doc_id_2".cast("string"),
          $"hamming")
        .as[(String, String, Int)].collect().toSeq
      val copyPairs = got.filter { case (a, b, _) =>
        math.abs(a.toLong - b.toLong) == 1000000L }
      assert(copyPairs.size == 4 && copyPairs.forall(_._3 == 0),
        "each re-encode must pair with its original at hamming 0")
      assert(got.length == pairSet(got).size)
      assert(pairSet(got) == pairSet(want),
        "stream video pair set must equal the batch m12 recipe")
    } finally q.stop()
  }

  test("streaming AUDIO exact dedup: container-independent content " +
      "hash keeps one spelling per recording within the watermark") {
    import graft.operators.Multimodal
    // 8 recordings, each saved under all three containers (24 rows);
    // plus one non-audio row: its hash is null, and null keys compare
    // EQUAL in dropDuplicates-family dedup (the audioContentHash
    // scaladoc's mixed-corpus caveat), so a single one survives as-is
    val audio = spark.range(8).select($"id".as("key"))
      .crossJoin(Seq("wave", "aiff", "au").toDF("container"))
      .select($"key", $"container",
        Multimodal.encodeTestAudio($"container",
          element_at(array(lit(8000), lit(16000)),
            (pmod($"key", lit(2)) + 1).cast("int")),
          lit(1), ($"key" + 50).cast("int"),
          ($"key" * 9 - 30).cast("int")).as("blob"))
    val junk = Seq((99L, "none", "not audio bytes"))
      .toDF("key", "container", "t")
      .select($"key", $"container", Multimodal.asBlob($"t").as("blob"))
    val rows = audio.unionByName(junk)
      .withColumn("row_id",
        $"key" * 10 + when($"container" === "wave", 0)
          .when($"container" === "aiff", 1).otherwise(2))
      .withColumn("ts", timestamp_millis(lit(1000L) + $"row_id" * 20))
    val dir = Files.createTempDirectory("graft-saudio").toFile
    val inPath = new java.io.File(dir, "in").getAbsolutePath
    rows.write.parquet(inPath)
    val stream = spark.readStream
      .schema(spark.read.parquet(inPath).schema).parquet(inPath)
    val out = graft.api.DataStream(stream, "ts")
      .withColumn("h", Multimodal.audioContentHash($"blob"))
      .dedupWithinWatermark(Seq("h"))
    val q = out.toDF.writeStream.outputMode("append")
      .format("memory").queryName("saudio").start()
    try {
      q.processAllAvailable()
      val kept = spark.table("saudio")
        .select($"key", $"h").as[(Long, Option[String])].collect()
      // one survivor per recording + the lone null-hash junk row
      assert(kept.length == 9)
      assert(kept.map(_._1).toSet == (0L until 8L).toSet + 99L)
      assert(kept.flatMap(_._2).toSet.size == 8)
      assert(kept.find(_._1 == 99L).get._2.isEmpty,
        "non-audio bytes must carry a null content hash")
    } finally q.stop()
    // batch parity: the same hash groups all three containers
    val h = Multimodal.decodeAudioPartitions(
        audio.withColumn("row_id",
          $"key" * 10 + when($"container" === "wave", 0)
            .when($"container" === "aiff", 1).otherwise(2))
          .select($"row_id", $"blob"), "blob", "row_id")
      .join(rows.select($"row_id", $"key"), "row_id")
      .groupBy($"key").agg(countDistinct($"pcm_sha256").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(h.values.forall(_ == 1L),
      "all containers of one recording must share the content hash")
  }

  test("identical docs colliding on all bands emit exactly one pair") {
    val input = MemoryStream[Doc](spark)
    val src = input.toDF
      .withColumn("ts", timestamp_millis($"occurred_at_ms"))
    val out = StreamingDedup.simhashPairs(src, docSig, "doc_id", "ts",
      horizonMs = 3600000L)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sdedup_canon").start()
    try {
      input.addData(Doc(1000, 1, "the quick brown fox jumps over the dog"))
      q.processAllAvailable()
      // identical text → identical signature → all 4 bands collide
      input.addData(Doc(2000, 2, "the quick brown fox jumps over the dog"))
      q.processAllAvailable()
      val rows = spark.table("sdedup_canon").collect()
      assert(rows.length == 1, s"want exactly 1 pair, got ${rows.length}")
      assert(rows(0).getAs[String]("doc_id_1") == "1")
      assert(rows(0).getAs[String]("doc_id_2") == "2")
      assert(rows(0).getAs[Int]("hamming") == 0)
      assert(rows(0).getAs[java.sql.Timestamp]("ts").getTime == 2000,
        "pair timestamp is the later row's event time")
    } finally q.stop()
  }

  test("entries beyond the horizon are evicted and cannot pair") {
    val text = "alpha beta gamma delta epsilon zeta eta theta"
    val input = MemoryStream[Doc](spark)
    val src = input.toDF
      .withColumn("ts", timestamp_millis($"occurred_at_ms"))
    val out = StreamingDedup.simhashPairs(src, docSig, "doc_id", "ts",
      horizonMs = 50000L)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sdedup_horizon").start()
    try {
      input.addData(Doc(0, 1, text))
      q.processAllAvailable()
      // dissimilar filler pushes the watermark past 1's expiry (50s)
      input.addData(Doc(100000, 99,
        "zzz yyy xxx www vvv uuu ttt sss rrr qqq ppp ooo"))
      q.processAllAvailable()
      // same text again, inside doc 99's horizon but past doc 1's
      input.addData(Doc(120000, 2, text))
      q.processAllAvailable()
      assert(spark.table("sdedup_horizon").isEmpty,
        "doc 1 expired at watermark 100s; no pair may emit")
      // positive control: a third copy within doc 2's horizon pairs
      input.addData(Doc(130000, 3, text))
      q.processAllAvailable()
      val rows = spark.table("sdedup_horizon").collect()
      assert(rows.length == 1)
      assert(rows(0).getAs[String]("doc_id_1") == "2")
      assert(rows(0).getAs[String]("doc_id_2") == "3")
    } finally q.stop()
  }

  test("rows farther apart than the horizon never pair, even within " +
      "one micro-batch") {
    // both rows land in state together (the watermark has not advanced
    // past either), so only the pair-predicate horizon guard — not
    // eviction — can block the match; the pair set must be a function
    // of event time alone, not of micro-batch boundaries
    val text = "alpha beta gamma delta epsilon zeta eta theta"
    val input = MemoryStream[Doc](spark)
    val src = input.toDF
      .withColumn("ts", timestamp_millis($"occurred_at_ms"))
    val out = StreamingDedup.simhashPairs(src, docSig, "doc_id", "ts",
      horizonMs = 50000L)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sdedup_batch_horizon").start()
    try {
      input.addData(Doc(0, 1, text), Doc(120000, 2, text))
      q.processAllAvailable()
      assert(spark.table("sdedup_batch_horizon").isEmpty,
        "120s apart with a 50s horizon must not pair in one batch")
      // positive control in the same run: within-horizon still pairs
      input.addData(Doc(130000, 3, text))
      q.processAllAvailable()
      val rows = spark.table("sdedup_batch_horizon").collect()
      assert(rows.length == 1)
      assert(rows(0).getAs[String]("doc_id_1") == "2")
      assert(rows(0).getAs[String]("doc_id_2") == "3")
    } finally q.stop()
  }

  test("bucket state survives a checkpoint restart") {
    val dir = Files.createTempDirectory("graft-sdedup-rec").toFile
    val inputDir = new java.io.File(dir, "input"); inputDir.mkdirs()
    val ckpt = new java.io.File(dir, "ckpt").getAbsolutePath
    val outDir = new java.io.File(dir, "out").getAbsolutePath

    def writeBatch(rows: Seq[Doc]): Unit =
      rows.toDF().coalesce(1).write.mode("append")
        .parquet(inputDir.getAbsolutePath)

    def startQuery() = {
      val src = spark.readStream
        .schema(spark.read.parquet(inputDir.getAbsolutePath).schema)
        .parquet(inputDir.getAbsolutePath)
        .withColumn("ts", timestamp_millis($"occurred_at_ms"))
      StreamingDedup.simhashPairs(src, docSig, "doc_id", "ts",
          horizonMs = 3600000L)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .option("path", outDir)
        .format("parquet").start()
    }

    val text = "one two three four five six seven eight nine ten"
    writeBatch(Seq(Doc(1000, 1, text)))
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    assert(spark.read.parquet(outDir).isEmpty)

    // the near-duplicate arrives while the query is DOWN: the pair can
    // only be found from doc 1's RECOVERED bucket state
    writeBatch(Seq(Doc(2000, 2, text)))
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    val rows = spark.read.parquet(outDir).collect()
    assert(rows.length == 1,
      s"restart must recover bucket state; got ${rows.length} pairs")
    assert(rows(0).getAs[String]("doc_id_1") == "1")
    assert(rows(0).getAs[String]("doc_id_2") == "2")
  }

  test("DataStream.nearDupPairs bridge wires the operator fluently") {
    val input = MemoryStream[Doc](spark)
    val src = input.toDF
      .withColumn("ts", timestamp_millis($"occurred_at_ms"))
    val out = api.DataStream(src, "ts")
      .nearDupPairs("text", "doc_id", "1 hour")
    val q = out.toDF.writeStream.outputMode("append")
      .format("memory").queryName("sdedup_bridge").start()
    try {
      input.addData(Doc(1000, 7, "lorem ipsum dolor sit amet consectetur"))
      q.processAllAvailable()
      input.addData(Doc(2000, 8, "lorem ipsum dolor sit amet consectetur"))
      q.processAllAvailable()
      val rows = spark.table("sdedup_bridge").collect()
      assert(rows.length == 1 && rows(0).getAs[Int]("hamming") == 0)
    } finally q.stop()
  }

  test("DataStream.embeddingNearDupPairs bridge wires the embedding " +
      "operator fluently") {
    val input = MemoryStream[EmbRow](spark)
    val src = input.toDF
      .withColumn("ts", timestamp_millis($"occurred_at_ms"))
    val out = api.DataStream(src, "ts")
      .embeddingNearDupPairs("embedding", "vec_id", "1 hour",
        threshold = 0.99, nPlanes = 4, dim = 4, nTables = 4)
    val q = out.toDF.writeStream.outputMode("append")
      .format("memory").queryName("sdedup_emb_bridge").start()
    try {
      input.addData(EmbRow(1000, 7, Seq(1.0, 0.5, 0.25, 0.125)))
      q.processAllAvailable()
      input.addData(
        EmbRow(2000, 8, Seq(1.0, 0.5, 0.25, 0.125)), // identical → cos 1
        EmbRow(3000, 9, Seq(-1.0, 0.5, 0.25, 0.125))) // far → no pair
      q.processAllAvailable()
      val rows = spark.table("sdedup_emb_bridge").collect()
      assert(rows.length == 1 && rows(0).getAs[Double]("cos") == 1.0,
        s"want one exact pair, got ${rows.toSeq}")
    } finally q.stop()
  }

  test("streaming decontamination anti-joins a static reference " +
      "digest set") {
    val ref = Seq("known benchmark question one",
      "known benchmark question two").toDF("text")
    val input = MemoryStream[Doc](spark)
    val out = api.DataStream(
      input.toDF.withColumn("ts", timestamp_millis($"occurred_at_ms")),
      "ts").decontaminate(ref, "text")
    val q = out.toDF.writeStream.outputMode("append")
      .format("memory").queryName("sdedup_decon").start()
    try {
      input.addData(
        Doc(1000, 1, "known benchmark question one"),
        Doc(2000, 2, "novel training document"),
        Doc(3000, 3, "known benchmark question two"),
        Doc(4000, 4, "another novel document"))
      q.processAllAvailable()
      val kept = spark.table("sdedup_decon")
        .select($"doc_id").as[Long].collect().toSet
      assert(kept == Set(2L, 4L),
        s"contaminated rows must drop mid-stream, got $kept")
    } finally q.stop()
  }

  test("streaming embedding pairs replay the batch LSH operator's " +
      "pair set with identical cosines") {
    // the d11 gate fixture shape: embeddings plus a tiny-perturbation
    // copy (cos ≈ 0.9999), every row timestamped inside one horizon
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id",
        transform($"embedding", x => x.cast("double")).as("embedding"))
    val mutated = emb
      .withColumn("vec_id", $"vec_id" + 1000000L)
      .withColumn("embedding", concat(
        array(element_at($"embedding", 1) + lit(0.015625)),
        slice($"embedding", 2, 63)))
    val all = emb.unionByName(mutated)

    val want = Dedup.embeddingNearDupPairsLsh(all, "embedding", "vec_id",
        threshold = 0.9, nPlanes = 16, dim = 64, nTables = 8)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => (Set(a.toString, b.toString), c) }.toSet
    assert(want.nonEmpty, "fixture must produce pairs")

    val dir = Files.createTempDirectory("graft-sdedup-emb").toFile
    val inPath = new java.io.File(dir, "in").getAbsolutePath
    // +1: a row AT the initial watermark (ts = 0) is dropped by the
    // pre-operator late filter — keep every event strictly after it
    all.withColumn("ts",
        timestamp_millis((pmod($"vec_id", lit(1000000L)) + 1) * 10))
      .coalesce(1).write.parquet(inPath)
    val src = spark.readStream
      .schema(spark.read.parquet(inPath).schema).parquet(inPath)
    val out = graft.streaming.StreamingDedup.embeddingPairs(src,
      "embedding", "vec_id", "ts", horizonMs = 86400000L,
      threshold = 0.9, nPlanes = 16, dim = 64, nTables = 8)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sdedup_emb").start()
    try {
      q.processAllAvailable()
      val got = spark.table("sdedup_emb")
        .select($"vec_id_1", $"vec_id_2", $"cos")
        .as[(String, String, Double)].collect()
        .map { case (a, b, c) => (Set(a, b), c) }.toSet
      assert(got == want,
        s"streaming pair set must equal batch: missing=" +
          s"${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    } finally q.stop()
  }

  test("streaming MinHash pairs verify on the signature estimate") {
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val b = "the quick brown fox jumps over the lazy cat again and again"
    val input = MemoryStream[Doc](spark)
    val src = input.toDF
      .withColumn("ts", timestamp_millis($"occurred_at_ms"))
    val out = StreamingDedup.minhashPairs(src, "text", "doc_id", "ts",
      horizonMs = 3600000L, shingleN = 3, numHashes = 16, bands = 8,
      threshold = 0.3)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sdedup_minhash").start()
    try {
      input.addData(Doc(1000, 1, a), Doc(2000, 2, b),
        Doc(3000, 3, "completely unrelated words about maritime law"))
      q.processAllAvailable()
      val rows = spark.table("sdedup_minhash").collect()
      assert(rows.length == 1, s"want the (1,2) pair only, got " +
        rows.map(_.toString).mkString(", "))
      assert(rows(0).getAs[String]("doc_id_1") == "1")
      assert(rows(0).getAs[String]("doc_id_2") == "2")
      // the emitted score is exactly the batch-side signature estimate
      val sigs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
        .orderBy($"doc_id")
        .select(graft.functions.minhash_signature(
          graft.functions.shingle_hashes($"text", 3), 16).as("sig"))
        .as[Seq[Long]].collect()
      val est = sigs(0).zip(sigs(1)).count { case (x, y) => x == y } / 16.0
      assert(rows(0).getAs[Double]("est_jaccard") == est)
    } finally q.stop()
  }

  test("streaming decontamination against a persisted exact index: " +
      "contaminated rows drop mid-stream, batch twin bit-identical") {
    val contaminated = "this exact eval passage must never survive"
    val clean1 = "an ordinary training document about rivers"
    val clean2 = "another ordinary training document about stars"
    // build + persist the index once (the per-reference-drop step)
    val idxPath = Files.createTempDirectory("sdecon").toString + "/idx"
    graft.operators.DedupIndex.writeExact(
      Seq(contaminated, "some other benchmark item").toDF("text"),
      "text", idxPath)

    val input = MemoryStream[Doc](spark)
    val src = input.toDF
      .withColumn("ts", timestamp_millis($"occurred_at_ms"))
    val out = graft.api.DataStream(src, "ts")
      .decontaminateAgainstIndex(idxPath, "text")
      .df
    assert(out.isStreaming, "the anti-join must stay stateless/streamable")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sdecon").start()
    try {
      input.addData(Doc(1000, 1, clean1), Doc(2000, 2, contaminated),
        Doc(3000, 3, clean2))
      q.processAllAvailable()
      val kept = spark.table("sdecon").select("doc_id")
        .as[Long].collect().toSet
      assert(kept == Set(1L, 3L))
    } finally q.stop()

    // batch twin through the same persisted index equals the inline op
    val corpus = Seq((1L, clean1), (2L, contaminated), (3L, clean2))
      .toDF("doc_id", "text")
    val viaIndex = Dedup.decontaminateFromIndex(corpus,
      graft.operators.DedupIndex.readExact(spark, idxPath), "text")
      .select("doc_id").as[Long].collect().toSet
    val inline = Dedup.decontaminate(corpus,
      Seq(contaminated).toDF("text"), "text")
      .select("doc_id").as[Long].collect().toSet
    assert(viaIndex == Set(1L, 3L) && inline == Set(1L, 3L))

    // a winnow index is refused by the exact reader
    val e = intercept[IllegalArgumentException] {
      graft.operators.DedupIndex.readExact(spark,
        idxPath.replace("/idx", "/missing"))
    }
    assert(e.getMessage.contains("sidecar"))
  }

  test("corpusDeltaStream: arriving docs classify against a static " +
      "baseline (added/changed/unchanged, null-safe digests), " +
      "stateless stream-static join; batch parity with corpusDelta " +
      "on every new-drop id, 'removed' stays batch-only") {
    val baseline = Seq((1L, "alpha"), (2L, "beta"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val input = MemoryStream[Doc](spark)
    val out = Dedup.corpusDeltaStream(baseline, input.toDF,
      "doc_id", "text")
    assert(out.isStreaming,
      "the stream-static classification must stay streamable")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("cdelta_stream").start()
    try {
      input.addData(
        Doc(1000, 1, "alpha"),     // same digest → unchanged
        Doc(2000, 2, "beta v2"),   // different digest → changed
        Doc(3000, 4, "brand new")) // id not in baseline → added
      q.processAllAvailable()
      val got = spark.table("cdelta_stream").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == Map(1L -> "unchanged", 2L -> "changed",
        4L -> "added"))
      // a null-text baseline doc gaining text counts as changed,
      // not a null-digest artifact
      input.addData(Doc(4000, 3, "now present"))
      q.processAllAvailable()
      assert(spark.table("cdelta_stream").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
        .apply(3L) == "changed")
    } finally q.stop()
    // batch parity: on every id PRESENT in the new drop the two
    // spellings agree; ids only in the baseline are the batch form's
    // 'removed' rows — the status a stream cannot know
    val newDrop = Seq((2L, "beta v2"), (3L, "now present"),
      (4L, "brand new")).toDF("doc_id", "text")
    val streamedForm = Dedup.corpusDeltaStream(baseline, newDrop,
        "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val batchForm = Dedup.corpusDelta(baseline, newDrop,
        "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(streamedForm == Map(2L -> "changed", 3L -> "changed",
      4L -> "added"))
    assert(streamedForm.forall { case (id, st) => batchForm(id) == st })
    assert((batchForm.keySet -- streamedForm.keySet) == Set(1L) &&
      batchForm(1L) == "removed")
  }
}
