package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.api.DataStream

class FunctionsSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("date_bin floors to stride buckets, matches window().start") {
    val ev = Graft.table(spark, sf, "events")
    val mismatches = ev.select(
      graft.functions.date_bin(900, $"ts").as("binned"),
      window($"ts", "15 minutes").getField("start").as("wstart"))
      .filter($"binned" =!= $"wstart").count()
    assert(mismatches == 0)
  }

  test("date_bin honors a non-epoch origin") {
    val r = Seq(java.sql.Timestamp.valueOf("2024-01-01 00:07:30"))
      .toDF("ts")
      .select(graft.functions.date_bin(600, $"ts",
        originEpochSeconds = 300).cast("long"))
      .head.getLong(0)
    // origin 00:05, stride 10min → bucket start 00:05 = 1704067500
    assert(r == 1704067500L)
  }

  test("approx aggregates land within tolerance of exact") {
    val li = Graft.table(spark, sf, "lineitem")
    val row = li.agg(
      approx_count_distinct($"l_partkey").as("approx"),
      countDistinct($"l_partkey").as("exact"),
      percentile_approx($"l_quantity", lit(0.5), lit(1000)).as("p50_approx"),
      median($"l_quantity").as("p50_exact")).head
    val (a, e) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    assert(math.abs(a - e) / e < 0.05, s"approx_count_distinct off: $a vs $e")
    assert(math.abs(row.getDouble(2) - row.getDouble(3)) <= 1.0)
  }

  test("stream-stream join with time-range bound emits matched pairs") {
    val leftIn = MemoryStream[Measurement](spark)
    val rightIn = MemoryStream[Measurement](spark)
    def ds(in: MemoryStream[Measurement], tsName: String) = DataStream(
      in.toDF.withColumn(tsName, timestamp_millis($"occurred_at_ms"))
        .drop("occurred_at_ms"), tsName)
    val l = ds(leftIn, "lts").withColumn("lkey", $"sensor_name")
      .dropColumns("sensor_name").withColumn("lread", $"reading")
      .dropColumns("reading")
    val r = ds(rightIn, "rts").withColumn("rkey", $"sensor_name")
      .dropColumns("sensor_name").withColumn("rread", $"reading")
      .dropColumns("reading")
    val joined = l.joinWithinTime(r, l.df("lkey") === r.df("rkey"),
      "5 seconds")
    val q = joined.toDF.writeStream.outputMode("append")
      .format("memory").queryName("ssj_out").start()
    try {
      leftIn.addData(Measurement(10000, "a", 1.0))
      rightIn.addData(Measurement(12000, "a", 2.0),   // within 5s → match
        Measurement(30000, "a", 3.0))                  // outside → no match
      q.processAllAvailable()
      leftIn.addData(Measurement(60000, "z", 0.0))     // advance watermarks
      rightIn.addData(Measurement(60000, "z2", 0.0))
      q.processAllAvailable()
      val rows = spark.table("ssj_out")
        .select($"lkey", $"lread", $"rread").collect()
      assert(rows.map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
        .toSet == Set(("a", 1.0, 2.0)))
    } finally q.stop()
  }

  test("DataStream.union and fromCsv round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toFile
    Seq((1L, "x"), (2L, "y")).toDF("id", "v")
      .coalesce(1).write.option("header", "true").mode("overwrite")
      .csv(dir.getAbsolutePath)
    val ctx = graft.api.Context(spark)
    val a = ctx.fromCsv(dir.getAbsolutePath)
    val b = ctx.fromCsv(dir.getAbsolutePath)
    assert(a.union(b).toDF.count() == 4)
    assert(a.schema.fieldNames.toSeq == Seq("id", "v"))
  }

  test("jsonl source/sink: batch round-trip, schema-pinned read, " +
      "streaming directory source") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl")
      .toFile.getAbsolutePath + "/drop"
    val ctx = graft.api.Context(spark)
    val src = Seq((1L, "x y z", 1000L), (2L, "w", 2000L))
      .toDF("doc_id", "text", "ts")
    graft.api.DataStream(src).sinkJsonl(dir)
    // default mode = errorifexists: a second sink at the same path
    // must fail loudly, not silently delete the existing drop
    intercept[Exception] { graft.api.DataStream(src).sinkJsonl(dir) }
    // explicit overwrite refreshes in place
    graft.api.DataStream(src).sinkJsonl(dir, mode = "overwrite")
    // inferred-schema read: values round-trip (jsonl infers longs)
    val back = ctx.fromJsonl(dir).toDF
      .select($"doc_id", $"text", $"ts")
      .as[(Long, String, Long)].collect().toSet
    assert(back == Set((1L, "x y z", 1000L), (2L, "w", 2000L)))
    // schema-pinned read: single-pass, declared types honored
    val pinned = ctx.fromJsonl(dir, src.schema).toDF
    // file sources surface every column nullable; names/types hold
    assert(pinned.schema.fields.map(f => f.name -> f.dataType).toSeq ==
      src.schema.fields.map(f => f.name -> f.dataType).toSeq)
    assert(pinned.count() == 2)
    // streaming directory source over the same drop
    val q = ctx.fromJsonlStream(dir, src.schema)
      .sinkMemory("jsonl_stream")
    try {
      q.processAllAvailable()
      assert(spark.table("jsonl_stream").count() == 2)
    } finally q.stop()
  }

  test("curation SQL functions match their Column-API operators") {
    import graft.operators.{Sampling, Similarity, TextAnalysis}
    val docs = Graft.table(spark, sf, "documents")
      .select($"doc_id", $"text")
    docs.createOrReplaceTempView("fs_docs")

    val viaSql = spark.sql(
      """SELECT doc_id, hash_draw(doc_id, 'sample') AS draw,
        |  hash_sample(doc_id, 0.2) AS keep,
        |  split_by_hash(doc_id, 'train', 0.8, 'val', 0.1, 'test', 0.1)
        |    AS split,
        |  split_by_hash(doc_id, 'a', 0.5, 'b', 0.5, 'mysalt') AS salted,
        |  redact_pii(text) AS clean
        |FROM fs_docs""".stripMargin)
    val viaApi = docs.select($"doc_id",
      Sampling.hashBucket($"doc_id", "sample").as("draw"),
      Sampling.sampleKeep($"doc_id", 0.2).as("keep"),
      Sampling.splitLabel($"doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"),
      Sampling.splitLabel($"doc_id", Seq("a" -> 0.5, "b" -> 0.5),
        "mysalt").as("salted"),
      TextAnalysis.redactPii($"text").as("clean"))
    assert(viaSql.exceptAll(viaApi).isEmpty &&
      viaApi.exceptAll(viaSql).isEmpty,
      "SQL curation functions must equal the operator compositions")

    val emb = Graft.table(spark, sf, "embeddings")
      .select($"vec_id", $"embedding")
    emb.createOrReplaceTempView("fs_emb")
    val qSql = spark.sql(
      """SELECT vec_id, quantize_int8(embedding) AS q,
        |  quant_scale(embedding) AS scale FROM fs_emb""".stripMargin)
    val qApi = emb.select($"vec_id",
      Similarity.quantizeInt8($"embedding").as("q"),
      Similarity.quantScale($"embedding").as("scale"))
    assert(qSql.exceptAll(qApi).isEmpty && qApi.exceptAll(qSql).isEmpty,
      "quantize_int8/quant_scale must equal the operator compositions")
  }

  test("gram_hashes / winnow_fingerprints / multi_pattern_counts / " +
      "wordpiece_encode on the SQL surface match the Column API") {
    val docs = Graft.table(spark, sf, "documents")
      .select($"doc_id", $"text")
    docs.createOrReplaceTempView("fs_sql_native")
    val viaSql = spark.sql(
      """SELECT doc_id, gram_hashes(text, 3) AS gh,
        |  winnow_fingerprints(text, 5, 4) AS wf,
        |  multi_pattern_counts(text, array('the', 'and')) AS mpc,
        |  wordpiece_encode(text, array('the', 'an', '##d'), '[UNK]')
        |    AS wp
        |FROM fs_sql_native""".stripMargin)
    val viaApi = docs.select($"doc_id",
      graft.functions.gram_hashes($"text", 3).as("gh"),
      graft.functions.winnow_fingerprints($"text", 5, 4).as("wf"),
      graft.functions.multi_pattern_counts($"text",
        Seq("the", "and")).as("mpc"),
      graft.functions.wordpiece_encode($"text",
        Seq("the", "an", "##d"), "[UNK]").as("wp"))
    assert(viaSql.exceptAll(viaApi).isEmpty &&
      viaApi.exceptAll(viaSql).isEmpty,
      "SQL-registered native expressions must equal the Column API")
    // non-literal pattern array rejected with the function name
    val e = intercept[Exception] {
      spark.sql("SELECT multi_pattern_counts(text, array(text)) " +
        "FROM fs_sql_native").collect()
    }
    assert(e.getMessage.contains("multi_pattern_counts"))
  }

  test("unicode_normalize / strip_accents / normalize_text") {
    // combining e + U+0301 composes under NFC; ligature ﬁ (U+FB01)
    // survives NFC but decomposes under NFKC
    val rows = Seq("Café", "ﬁne", "  Tabs\tand\nLines  ",
      "plain ascii").toDF("t")
    val got = rows.select(
      graft.functions.unicode_normalize($"t").as("nfc"),
      graft.functions.unicode_normalize($"t", "NFKC").as("nfkc"),
      graft.functions.strip_accents(
        graft.functions.unicode_normalize($"t")).as("stripped"),
      graft.operators.TextAnalysis.normalizeText($"t").as("norm"))
      .collect()
    assert(got(0).getString(0) == "Caf\u00e9")       // composed
    assert(got(0).getString(2) == "Cafe")            // accent gone
    assert(got(0).getString(3) == "caf\u00e9")       // lowered+NFC
    assert(got(1).getString(0) == "\ufb01ne")        // NFC keeps the ligature
    assert(got(1).getString(1) == "fine")            // NFKC expands
    assert(got(2).getString(3) == "tabs and lines")  // collapse+trim
    assert(got(3).getString(3) == "plain ascii")     // ascii fast path
    // bad form rejected at analysis
    val e = intercept[Exception] {
      rows.select(graft.functions.unicode_normalize($"t", "NFX")).collect()
    }
    assert(e.getMessage.contains("NFC"))
    // SQL registrations mirror the Column API
    rows.createOrReplaceTempView("fs_norm")
    val sql = spark.sql(
      """SELECT unicode_normalize(t) AS nfc, strip_accents(t) AS s,
        |  normalize_text(t) AS n FROM fs_norm""".stripMargin).collect()
    assert(sql(0).getString(0) == "Caf\u00e9" &&
      sql(0).getString(2) == "caf\u00e9")
  }

  test("wordpiece_encode: greedy longest match, ## continuations, UNK") {
    val vocab = Seq("un", "break", "fast", "ab", "a", "b",
      "##break", "##able", "##er", "##b")
    def enc(s: String): Seq[String] =
      Seq(s).toDF("t")
        .select(graft.functions.wordpiece_encode($"t", vocab))
        .head.getSeq[String](0)
    // start piece, then longest continuations
    assert(enc("unbreakable") == Seq("un", "##break", "##able"))
    assert(enc("faster") == Seq("fast", "##er"))
    // greedy: whole-word "ab" beats "a"+"##b"
    assert(enc("ab") == Seq("ab"))
    // no start piece for 'c' \u2192 the WHOLE word collapses, even though
    // a suffix would tokenize
    assert(enc("cab") == Seq("[UNK]"))
    // mid-word dead end (no ##a and "##able" doesn't match "ax")
    assert(enc("unax") == Seq("[UNK]"))
    // multi-word: per-word independence + order, runs of whitespace
    assert(enc("  faster \t un  cab ") ==
      Seq("fast", "##er", "un", "[UNK]"))
    assert(enc("") == Seq.empty)
    assert(enc("   ") == Seq.empty)
    // custom unk token
    val got = Seq("cab").toDF("t")
      .select(graft.functions.wordpiece_encode($"t", vocab, unk = "<x>"))
      .head.getSeq[String](0)
    assert(got == Seq("<x>"))
  }

  test("multi_pattern_counts: overlapping occurrences, UTF-8, drop") {
    val pats = Seq("abcabc", "cab", "bcd", "a a", "zz", "é")
    def cnt(s: String): Seq[Long] =
      Seq(s).toDF("t")
        .select(graft.functions.multi_pattern_counts($"t", pats))
        .head.getSeq[Long](0)
    // "abcabcabcd": abcabc at 0 AND 3 (overlap), cab at 2 and 5, bcd at 7
    assert(cnt("abcabcabcd") == Seq(2L, 2L, 1L, 0L, 0L, 0L))
    // "a a a": the 2-char phrase overlaps itself at positions 0 and 2
    assert(cnt("a a a") == Seq(0L, 0L, 0L, 2L, 0L, 0L))
    assert(cnt("") == Seq(0L, 0L, 0L, 0L, 0L, 0L))
    // multi-byte pattern matches byte-exactly
    assert(cnt("café").last == 1L)
    // operator wrappers
    val df = Seq((1L, "clean text"), (2L, "has cab here"))
      .toDF("id", "t")
    val stats = graft.operators.TextAnalysis
      .blocklistStats(df, "t", pats).collect()
      .map(r => (r.getLong(0),
        (r.getAs[Long]("n_hits"), r.getAs[Long]("n_phrases"),
          r.getAs[String]("hit_phrases")))).toMap
    assert(stats(1L) == ((0L, 0L, "")))
    assert(stats(2L) == ((1L, 1L, "cab")))
    val kept = graft.operators.TextAnalysis
      .dropBlocklisted(df, "t", pats).collect().map(_.getLong(0))
    assert(kept.toSeq == Seq(1L))
  }

  test("bpe_encode: GPT-2 iterative lowest-rank merge semantics — " +
      "rank priority, all-occurrence LTR merge, self-pairs, unicode") {
    val merges = Seq("t h", "i n", "e r", "th e", "r e")
    def enc(s: String, m: Seq[String] = merges): Seq[String] =
      Seq(s).toDF("t")
        .select(graft.functions.bpe_encode($"t", m)).head.getSeq[String](0)
    assert(enc("the") == Seq("the"))
    // rank decides: in "there", (e,r) rank 2 fires before (th,e)
    // rank 3 can — t,h,e,r,e → [th,e,r,e] → [th,er,e], and "the"
    // never forms
    assert(enc("there") == Seq("th", "er", "e"))
    assert(enc("thin") == Seq("th", "in"))
    // unlisted pairs → character fallback, never UNK
    assert(enc("xyz") == Seq("x", "y", "z"))
    assert(enc("") == Seq.empty)
    assert(enc("  the  thin ") == Seq("the", "th", "in"))
    // all-occurrence left-to-right merge within one step
    assert(enc("ththth") == Seq("th", "th", "th"))
    // SELF-PAIR merges take the canonical left-to-right alignment
    // per step ([a,a,a,a,a] → [aa,aa,a] → tail-merge [aa,aaa]) — the
    // case where the oracle's fixpoint-replace form can disagree,
    // hence excluded from the t29 merge list and pinned here instead
    val self = Seq("a a", "aa a")
    assert(enc("aaa", self) == Seq("aaa"))
    assert(enc("aaaa", self) == Seq("aa", "aa"))
    assert(enc("aaaaa", self) == Seq("aa", "aaa"))
    // multi-byte code points are single symbols
    assert(enc("é t h", Seq("t h")) == Seq("é", "t", "h"))
    assert(enc("éth", Seq("t h")) == Seq("é", "th"))
    // SQL surface agrees
    graft.functions.GraftFunctions.registerAll(spark)
    val viaSql = spark.sql("SELECT bpe_encode('there thin', " +
      "array('t h','i n','e r','th e','r e'))").head.getSeq[String](0)
    assert(viaSql == Seq("th", "er", "e", "th", "in"))
  }

  test("AhoCorasick sparse tier: bit-identical to dense, auto-selected " +
      "above the node threshold, edge-proportional memory") {
    import graft.expressions.AhoCorasick
    def bytes(s: String) = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    // tier-equivalence list: shared prefixes, prefix-of-another,
    // overlapping and multi-byte patterns
    val medium = (0 until 5000).map(i => s"ph${i % 37}x${i}") ++
      Seq("ab", "abc", "abcabc", "b", "bc", "a a", "é", "ст")
    val mediumB = medium.map(bytes)
    val dense = AhoCorasick.buildDense(mediumB)
    val sparse = AhoCorasick.buildSparse(mediumB)
    assert(dense.nNodes == sparse.nNodes)
    assert(dense.nNodes == AhoCorasick.trieNodeCount(mediumB))
    val texts = Graft.table(spark, sf, "documents").limit(40)
      .select($"text").as[String].collect() ++
      Seq("abcabcabcd ph3x3 ph3x40 a a a é caétст", "", "zzz",
        medium(123) * 3)
    texts.foreach { t =>
      val cd = new Array[Long](medium.size)
      val cs = new Array[Long](medium.size)
      dense.countInto(bytes(t), cd)
      sparse.countInto(bytes(t), cs)
      assert(cd.toSeq == cs.toSeq, s"tier mismatch on: $t")
    }
    // auto tier choice: a 100k-phrase blocklist (≈1M trie nodes —
    // a dense table would be ~1 GB/executor) must come back sparse...
    val big = (0 until 100000).map(i => s"blocked${i}phrase")
    val bigB = big.map(bytes)
    assert(AhoCorasick.trieNodeCount(bigB) > AhoCorasick.DenseMaxNodes)
    val auto = AhoCorasick.build(bigB)
    assert(auto.isInstanceOf[AhoCorasick.SparseAutomaton])
    // ...and the small list dense
    assert(AhoCorasick.build(mediumB)
      .isInstanceOf[AhoCorasick.DenseAutomaton])
    // sparse counts vs a naive indexOf scan on crafted text hitting a
    // sample of the big list (including repeated + adjacent hits)
    val sample = Seq(big(0), big(999), big(54321), big(99999))
    val crafted = sample.mkString(" ") + " " + big(999) * 2 + " blocked"
    val counts = new Array[Long](big.size)
    auto.countInto(bytes(crafted), counts)
    big.zipWithIndex.foreach { case (p, i) =>
      var n = 0
      var at = crafted.indexOf(p)
      while (at >= 0) { n += 1; at = crafted.indexOf(p, at + 1) }
      assert(counts(i) == n, s"sparse count wrong for $p")
    }
    // anyMatch ≡ (counts has a nonzero) on both tiers, early exit or not
    (texts :+ crafted).foreach { t =>
      val cd = new Array[Long](medium.size)
      dense.countInto(bytes(t), cd)
      assert(dense.anyMatch(bytes(t)) == cd.exists(_ > 0))
      assert(sparse.anyMatch(bytes(t)) == cd.exists(_ > 0))
    }
    // cachedBuild: same key → same instance (per-JVM once), and the
    // SQL surface agrees with the Column form
    assert(AhoCorasick.cachedBuild(mediumB) eq
      AhoCorasick.cachedBuild(medium.map(bytes)))
    graft.functions.GraftFunctions.registerAll(spark)
    val viaSql = spark.sql(
      "SELECT multi_pattern_any('has a a here', array('a a', 'zz')), " +
        "multi_pattern_any('clean', array('a a', 'zz'))").head
    assert(viaSql.getBoolean(0) && !viaSql.getBoolean(1))
  }

  test("gram_hashes: positional contract + equality classes match " +
      "string grams") {
    val docs = Graft.table(spark, sf, "documents").limit(80)
    val n = 5
    val toks = graft.operators.TextAnalysis.tokenize($"text")
    // string grams, positional (the spelling gram_hashes replaces)
    val strGrams = when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
    val both = docs.select(
      strGrams.as("gs"),
      graft.functions.gram_hashes($"text", n).as("gh"))
      .collect()
    val pairs = both.flatMap { r =>
      val gs = r.getSeq[String](0); val gh = r.getSeq[Long](1)
      assert(gs.length == gh.length) // same positional length, incl 0
      gs.zip(gh)
    }
    // hash-equality must coincide with string-equality (bijection on
    // this corpus: same gram \u21d2 same hash, distinct grams \u21d2 distinct
    // hashes at ~2^-64 collision odds)
    assert(pairs.groupBy(_._1).values.forall(_.map(_._2).distinct.size == 1))
    assert(pairs.groupBy(_._2).values.forall(_.map(_._1).distinct.size == 1))
    // short doc \u2192 EMPTY (no whole-text fallback, unlike shingle_hashes)
    val short = Seq("a b c").toDF("text")
      .select(graft.functions.gram_hashes($"text", 5))
      .head.getSeq[Long](0)
    assert(short.isEmpty)
  }
}
