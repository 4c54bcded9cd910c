package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def docs = Graft.table(spark, sf, "documents")

  test("hashSample is deterministic, nested across fractions, and a " +
      "pure scan filter") {
    val a = Sampling.hashSample(docs, "doc_id", 0.2)
      .select($"doc_id").as[Long].collect().toSet
    val b = Sampling.hashSample(docs, "doc_id", 0.2)
      .select($"doc_id").as[Long].collect().toSet
    assert(a == b, "same fraction must select identical rows every run")
    val wider = Sampling.hashSample(docs, "doc_id", 0.5)
      .select($"doc_id").as[Long].collect().toSet
    assert(a.subsetOf(wider),
      "thresholds nest: a smaller fraction is a subset of a larger one")
    val n = docs.count().toDouble
    assert(math.abs(a.size / n - 0.2) < 0.15,
      s"fraction far off: kept ${a.size} of $n")
    // scale shape: a sample is a filter — no shuffle may appear
    val plan = Sampling.hashSample(docs, "doc_id", 0.2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"hashSample must not shuffle:\n$plan")
    // degenerate fractions
    assert(Sampling.hashSample(docs, "doc_id", 1.0).count() == n.toLong)
    assert(Sampling.hashSample(docs, "doc_id", 0.0).count() == 0L)
  }

  test("weightedHashSample keeps per-row probability, is monotone in " +
      "the weight, and stays a pure scan filter") {
    import org.apache.spark.sql.functions.{col, lit}
    val w = col("n_chars") / lit(400.0)
    val a = Sampling.weightedHashSample(docs, "doc_id", w)
      .select($"doc_id").as[Long].collect().toSet
    val b = Sampling.weightedHashSample(docs, "doc_id", w)
      .select($"doc_id").as[Long].collect().toSet
    assert(a == b, "same weights must select identical rows every run")
    // monotone: halving every weight only removes rows
    val narrower = Sampling.weightedHashSample(docs, "doc_id",
        w / lit(2.0))
      .select($"doc_id").as[Long].collect().toSet
    assert(narrower.subsetOf(a),
      "per-row thresholds nest: lower weights select a subset")
    // expected kept count = sum of clamped weights
    val expected = docs
      .select(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.least(lit(1.0), w)))
      .as[Double].head()
    assert(math.abs(a.size - expected) / expected < 0.2,
      s"kept ${a.size}, expected ≈$expected")
    // weight >= 1 always keeps; <= 0 always drops
    assert(Sampling.weightedHashSample(docs, "doc_id", lit(1.0))
      .count() == docs.count())
    assert(Sampling.weightedHashSample(docs, "doc_id", lit(0.0))
      .count() == 0L)
    assert(Sampling.weightedHashSample(docs, "doc_id", lit(-3.0))
      .count() == 0L)
    // rows at weight >= 1 survive regardless of their draw
    val heavy = docs.filter(col("n_chars") >= 400)
      .select($"doc_id").as[Long].collect().toSet
    assert(heavy.subsetOf(a), "weight >= 1 rows must all be kept")
    // scale shape: still a pure filter — no shuffle
    val plan = Sampling.weightedHashSample(docs, "doc_id", w)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"weightedHashSample must not shuffle:\n$plan")
  }

  test("upsampleByWeight: integer weights give exact copy counts, " +
      "fractional draws nest, epochs are dense and stable") {
    import org.apache.spark.sql.functions.{col, lit}
    // exact integers: no draw involved
    assert(Sampling.upsampleByWeight(docs, "doc_id", lit(2.0))
      .count() == 2 * docs.count())
    assert(Sampling.upsampleByWeight(docs, "doc_id", lit(0.0))
      .count() == 0L)
    assert(Sampling.upsampleByWeight(docs, "doc_id", lit(-1.5))
      .count() == 0L, "negative weights emit nothing")
    // epoch column is 0-based and dense per row
    val two = Sampling.upsampleByWeight(docs, "doc_id", lit(2.0))
      .groupBy($"doc_id")
      .agg(org.apache.spark.sql.functions.sort_array(
        org.apache.spark.sql.functions.collect_list($"epoch")).as("e"))
      .select($"e").as[Seq[Long]].collect()
    assert(two.forall(_ == Seq(0L, 1L)), "epochs must be 0..n-1")
    // fractional part: w and w+1 emit nested epoch sets (monotone),
    // and the extra-epoch subset matches the weight<=1 sampler's
    // draw in the SAME salt domain (shared machinery, shared draw)
    val w = col("n_chars") / lit(400.0)
    val one = Sampling.upsampleByWeight(docs, "doc_id", w)
      .select($"doc_id", $"epoch").as[(Long, Long)].collect().toSet
    val boosted = Sampling.upsampleByWeight(docs, "doc_id", w + lit(1.0))
      .select($"doc_id", $"epoch").as[(Long, Long)].collect().toSet
    assert(one.map { case (id, e) => (id, e + 1) }.subsetOf(boosted),
      "raising every weight by 1 appends one epoch to every row " +
        "and keeps the rest of the draw identical")
    assert(boosted.size == one.size + docs.count(),
      "w+1 emits exactly one extra copy per row")
    val drawKept = Sampling.weightedHashSample(docs, "doc_id", w,
        salt = Sampling.EpochSalt)
      .filter(w < 1.0).select($"doc_id").as[Long].collect().toSet
    val fracExtra = one.groupBy(_._1).collect {
      case (id, es) if es.size == 1 => id
    }.toSet // w in (0,1): the single kept copy IS the fractional draw
    assert(drawKept.subsetOf(fracExtra ++
        one.groupBy(_._1).filter(_._2.size > 1).keySet),
      "fractional copies follow the weighted sampler's draw")
    // pure projection + explode: no shuffle
    val plan = Sampling.upsampleByWeight(docs, "doc_id", w)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"upsampleByWeight must not shuffle:\n$plan")
  }

  test("splitByHash partitions rows completely, disjointly, and " +
      "leakage-safe") {
    val split = Sampling.splitByHash(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val byBand = split.groupBy($"split").count()
      .as[(String, Long)].collect().toMap
    assert(byBand.keySet == Set("train", "val", "test"),
      s"every band must be non-empty on the fixture, got $byBand")
    assert(byBand.values.sum == docs.count(),
      "bands must partition the input exactly")
    // leakage safety: duplicated ids land in the same band
    val dup = docs.unionByName(docs)
    val assignments = Sampling.splitByHash(dup, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy($"doc_id")
      .agg(countDistinct($"split").as("nb"))
      .filter($"nb" > 1).count()
    assert(assignments == 0L,
      "equal ids must never straddle bands (train/test leakage)")
    // opting INTO a shared draw: with the same explicit salt, the
    // train band is exactly hashSample(0.8) — callers who want a split
    // aligned with an earlier sample pass identical salts
    val shared = Sampling.splitByHash(docs, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "s0")
      .filter($"split" === "train")
      .select($"doc_id").as[Long].collect().toSet
    val sampled = Sampling.hashSample(docs, "doc_id", 0.8, salt = "s0")
      .select($"doc_id").as[Long].collect().toSet
    assert(shared == sampled,
      "identical salts must share the draw across operators")
    // and with the DEFAULT (distinct) salts they must NOT be the same
    // draw — that shared-hash degeneracy is what domain separation fixes
    val train = split.filter($"split" === "train")
      .select($"doc_id").as[Long].collect().toSet
    assert(train != sampled,
      "default salts must give split a draw independent of hashSample")
  }

  test("splitByHashComponents keeps every near-dup cluster in one band " +
      "and equals splitByHash off-cluster") {
    // corpus = docs ∪ shifted copies; pairs link each doc to its copy
    // for the first half of ids only — the second half stays unpaired
    val copies = docs.withColumn("doc_id", $"doc_id" + 1000000L)
    val all = docs.unionByName(copies)
    val maxId = docs.agg(max($"doc_id")).as[Long].head()
    val pairs = docs.filter($"doc_id" <= maxId / 2)
      .select($"doc_id".as("a"), ($"doc_id" + 1000000L).as("b"))
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val got = Sampling.splitByHashComponents(all, "doc_id", pairs,
        "a", "b", w)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(got.size == all.count(),
      "every row must get a band exactly once")
    // leakage safety: both ends of every pair share a band
    pairs.select($"a", $"b").as[(Long, Long)].collect().foreach {
      case (a, b) => assert(got(a) == got(b),
        s"pair ($a,$b) straddles bands: ${got(a)} vs ${got(b)}")
    }
    // off-cluster rows draw exactly as plain splitByHash
    val plain = Sampling.splitByHash(all, "doc_id", w)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    got.keys.filter(id => (id % 1000000L) > maxId / 2).foreach { id =>
      assert(got(id) == plain(id),
        s"unpaired row $id must keep its own-id draw")
    }
    // and WITHOUT the cluster labels, some pair would straddle bands
    // (the hazard this operator exists to close)
    assert(pairs.select($"a", $"b").as[(Long, Long)].collect()
        .exists { case (a, b) => plain(a) != plain(b) },
      "fixture too small to exhibit the leakage hazard")
  }

  test("shuffleByHash is a deterministic permutation, salt-independent, " +
      "and sorts by range exchange (no single-reducer)") {
    val a = Sampling.shuffleByHash(docs, "doc_id")
      .select($"doc_id").as[Long].collect()
    val b = Sampling.shuffleByHash(docs, "doc_id")
      .select($"doc_id").as[Long].collect()
    assert(a.sameElements(b), "same salt must give the identical order")
    assert(a.sorted.sameElements(
      docs.select($"doc_id").as[Long].collect().sorted),
      "a shuffle is a permutation — same rows, new order")
    assert(!a.sameElements(a.sorted), "order must actually change")
    val epoch2 = Sampling.shuffleByHash(docs, "doc_id", "shuffle-epoch2")
      .select($"doc_id").as[Long].collect()
    assert(!a.sameElements(epoch2),
      "a different salt must give an independent permutation")
    val plan = Sampling.shuffleByHash(docs, "doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"),
      s"global shuffle must sort via range exchange:\n$plan")
  }

  test("stratifiedHashSample applies per-stratum fractions with default") {
    val kept = Sampling.stratifiedHashSample(docs, "doc_id", "lang",
        Map("en" -> 1.0, "de" -> 0.0), defaultFraction = 0.2)
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    val full = docs.groupBy($"lang").count()
      .as[(String, Long)].collect().toMap
    assert(kept("en") == full("en"), "fraction 1.0 keeps the stratum whole")
    assert(!kept.contains("de"), "fraction 0.0 drops the stratum")
    val others = full.keySet -- Set("en", "de")
    others.foreach { l =>
      assert(kept.getOrElse(l, 0L) < full(l),
        s"default fraction must subsample stratum $l")
    }
    // per-stratum selection with a shared explicit salt is exactly
    // hashSample(f) restricted to the stratum
    val en = Sampling.stratifiedHashSample(docs, "doc_id", "lang",
        Map("zh" -> 0.3), defaultFraction = 0.0, salt = "s1")
      .select($"doc_id").as[Long].collect().toSet
    val direct = Sampling.hashSample(docs.filter($"lang" === "zh"),
        "doc_id", 0.3, salt = "s1")
      .select($"doc_id").as[Long].collect().toSet
    assert(en == direct)
  }

  test("redactPii strips emails and phone runs, leaves clean text alone") {
    import graft.operators.TextAnalysis
    val rows = Seq(
      ("write to a.user+tag@sub.example.org today",
        "write to [EMAIL] today"),
      ("call +1 (415) 555-0142 or 020 7946 0958 now",
        "call [PHONE] or [PHONE] now"),
      // email first: the digits inside an address must not become a
      // phone fragment
      ("mail 123456789@numbers.example.com please",
        "mail [EMAIL] please"),
      ("no pii here, just 42 and 3.14", "no pii here, just 42 and 3.14"),
      // date ranges and id-length digit runs are NOT phone-shaped:
      // separators over 2 chars / under 7 total digits survive
      ("active 2020 - 2024, order 123456", "active 2020 - 2024, order 123456"))
    val got = rows.map(_._1).toDF("t")
      .select(TextAnalysis.redactPii($"t")).as[String].collect().toSeq
    assert(got == rows.map(_._2), s"got $got")
  }

  test("repetitionStats: empty and whitespace-only docs report zeros, " +
      "not maximal repetition") {
    import graft.operators.TextAnalysis
    val rows = Seq((1L, "a a b"), (2L, ""), (3L, "   "), (4L, "solo"))
    val got = TextAnalysis.repetitionStats(rows.toDF("doc_id", "text"),
        "text", "doc_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got(1L) == ((3L, 2L, 2L, 2L, 2L)), s"got ${got(1L)}")
    assert(got(2L) == ((0L, 0L, 0L, 0L, 0L)),
      "empty doc must report zero counts (tokenize's '' token filtered)")
    assert(got(3L) == ((0L, 0L, 0L, 0L, 0L)),
      "whitespace-only doc must report zero counts")
    assert(got(4L) == ((1L, 1L, 1L, 0L, 0L)))
  }

  test("ngramNoveltyStats counts corpus-common n-grams per doc, " +
      "short docs fall back to whole-text grams") {
    import graft.operators.TextAnalysis
    val rows = Seq((1L, "a b c d"), (2L, "a b c x"),
      (3L, "zz"), (4L, "zz"), (5L, "only unique words here"))
    val got = TextAnalysis.ngramNoveltyStats(
        rows.toDF("doc_id", "text"), "doc_id", "text", n = 3, minDf = 2)
      .orderBy($"doc_id").as[(Long, Long, Long)].collect().toSeq
    // doc1 {"a b c","b c d"}, doc2 {"a b c","b c x"}: share "a b c";
    // docs 3/4 are whole-text grams "zz" (df=2); doc5 all-novel
    assert(got == Seq((1L, 2L, 1L), (2L, 2L, 1L), (3L, 1L, 1L),
      (4L, 1L, 1L), (5L, 2L, 0L)), s"got $got")
    // no cartesian anywhere in the inverted-index plan
    val plan = TextAnalysis.ngramNoveltyStats(
        rows.toDF("doc_id", "text"), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), s"all-pairs plan:\n$plan")
  }

  test("temperatureMixSample flattens the domain mixture: smallest " +
      "domain keeps all, retention tracks (nmin/n)^(1-tau), tau=1 no-op") {
    import graft.operators.Sampling
    val docs = Graft.table(spark, sf, "documents")
    val natural = docs.groupBy($"lang").count()
      .as[(String, Long)].collect().toMap
    val nmin = natural.values.min
    val mixed = Sampling.temperatureMixSample(docs, "doc_id", "lang",
      tau = 0.5)
    val got = mixed.groupBy($"lang").count()
      .as[(String, Long)].collect().toMap
    assert(got(natural.minBy(_._2)._1) == nmin,
      "smallest domain must keep every row (maximal retention)")
    // retention follows the planned rate (draws are uniform and the
    // fixture domains are tens-to-hundreds of rows: allow hash noise)
    for ((lang, n) <- natural) {
      val rate = math.sqrt(nmin.toDouble / n)
      val kept = got.getOrElse(lang, 0L).toDouble / n
      assert(math.abs(kept - rate) < 0.15,
        s"$lang kept $kept of rows vs planned rate $rate")
    }
    // the selection is a subset of the corpus, columns unchanged
    assert(mixed.columns.sameElements(docs.columns))
    assert(mixed.exceptAll(docs).isEmpty)
    // tau = 1 targets the natural mixture — exact no-op
    assert(Sampling.temperatureMixSample(docs, "doc_id", "lang",
      tau = 1.0).count() == docs.count())
    assertThrows[IllegalArgumentException](
      Sampling.temperatureMixSample(docs, "doc_id", "lang", tau = 0.0))
    // rates broadcast onto the scan: no cartesian over corpus rows
    // (the 1-row nmin cross-join plans a broadcast nested loop)
    val plan = mixed.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"all-pairs plan:\n$plan")
  }

  test("stripBoilerplateLines removes cross-doc lines, keeps empty " +
      "lines, empties fully-boilerplate docs") {
    import graft.operators.TextAnalysis
    val rows = Seq(
      (1L, "nav bar\n\ncontent one\nnav bar"), // dup WITHIN doc too
      (2L, "nav bar\nunique two"),
      (3L, "only here\n\n"), // trailing empty lines survive the rebuild
      (4L, "gone\ngone"),
      (5L, "gone"))
    val got = TextAnalysis.stripBoilerplateLines(
        rows.toDF("doc_id", "text"), "doc_id", "text", minDf = 2)
      .orderBy($"doc_id").as[(Long, String, Long, Long)].collect().toSeq
    // "nav bar" df=2 (within-doc dup counts ONCE toward df, but both
    // occurrences in doc1 are removed); "gone" df=2 empties docs 4/5;
    // empty lines are exempt structure
    assert(got == Seq(
      (1L, "\ncontent one", 4L, 2L),
      (2L, "unique two", 2L, 1L),
      (3L, "only here\n\n", 3L, 0L),
      (4L, "", 2L, 2L),
      (5L, "", 1L, 1L)), s"got $got")
    // inverted-index plan: no cartesian anywhere
    val plan = TextAnalysis.stripBoilerplateLines(
        rows.toDF("doc_id", "text"), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), s"all-pairs plan:\n$plan")
    // minDf=1 would flag every line in the corpus — rejected up front
    assertThrows[IllegalArgumentException] {
      TextAnalysis.stripBoilerplateLines(
        rows.toDF("doc_id", "text"), "doc_id", "text", minDf = 1)
    }
  }

  test("topQuantilePerKey keeps ceil(q*n) best rows per key, ties by " +
      "id, tiny keys never empty") {
    import graft.operators.Sampling
    val rows = Seq(
      (1L, "a", 9L), (2L, "a", 8L), (3L, "a", 7L), (4L, "a", 8L),
      (5L, "a", 1L),
      (6L, "b", 0L)).toDF("doc_id", "lang", "score")
    // key a: n=5, q=0.5 -> ceil(2.5)=3 -> scores 9,8,8 (tie 2 before
    // 4 by id); key b: n=1 -> ceil(0.5)=1 -> its single row survives
    val got = Sampling.topQuantilePerKey(rows, "lang", "doc_id",
        col("score"), q = 0.5)
      .select($"doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 4L, 6L), s"got $got")
    intercept[IllegalArgumentException] {
      Sampling.topQuantilePerKey(rows, "lang", "doc_id",
        col("score"), q = 0.0)
    }
  }

  test("topQuantilePerKey: adversarial shapes — one constant hot key, " +
      "all-equal scores, string ids — rank stays exact and parallel") {
    import graft.operators.Sampling
    // ONE key holds every row (the 100 TB lang-column shape) with
    // varied scores: histogram rank must equal the brute-force global
    // rank, and the ranking window must partition by (key, bucket)
    val n = 4000
    val rows = (1L to n.toLong).map(i => (i, "en", (i * 37 % 1001)))
      .toDF("doc_id", "lang", "score").repartition(11)
    val q = 0.3
    val got = Sampling.topQuantilePerKey(rows, "lang", "doc_id",
      $"score", q)
    val plan = got.queryExecution.optimizedPlan.toString
    assert(plan.contains("windowspecdefinition(lang"), "rank window")
    assert(plan.contains("__sb"),
      "ranking window must include the score bucket — a key-only " +
        "window serializes the hot key")
    val keep = math.ceil(n * q).toLong
    val want = (1L to n.toLong).map(i => (i, i * 37 % 1001))
      .sortBy { case (id, s) => (-s, id) }.take(keep.toInt)
      .map(_._1).toSet
    val ids = got.select($"doc_id").as[Long].collect().toSet
    assert(ids == want)

    // all-equal scores (the degenerate grid): order is pure id asc
    val flat = (1L to 100L).map(i => (i, "en", 5L))
      .toDF("doc_id", "lang", "score")
    val fids = Sampling.topQuantilePerKey(flat, "lang", "doc_id",
      $"score", 0.25).select($"doc_id").as[Long].collect().toSet
    assert(fids == (1L to 25L).toSet)

    // string ids, mixed keys incl. a degenerate one
    val srows = Seq(("d1", "a", 3L), ("d2", "a", 9L), ("d3", "a", 9L),
      ("e1", "b", 7L), ("e2", "b", 7L), ("e3", "b", 7L), ("e4", "b", 7L))
      .toDF("doc_id", "lang", "score")
    val sids = Sampling.topQuantilePerKey(srows, "lang", "doc_id",
      $"score", 0.5).select($"doc_id").as[String].collect().toSet
    // a: ceil(1.5)=2 -> d2,d3 (score 9); b: ceil(2)=2 -> e1,e2 (ids)
    assert(sids == Set("d2", "d3", "e1", "e2"))

    // null scores sort last, never displace scored rows
    val nrows = Seq((1L, "a", java.lang.Long.valueOf(4L)),
      (2L, "a", null.asInstanceOf[java.lang.Long]),
      (3L, "a", java.lang.Long.valueOf(2L)),
      (4L, "a", null.asInstanceOf[java.lang.Long]))
      .toDF("doc_id", "lang", "score")
    val nids = Sampling.topQuantilePerKey(nrows, "lang", "doc_id",
      $"score", 0.5).select($"doc_id").as[Long].collect().toSet
    assert(nids == Set(1L, 3L))
  }

  test("topNPerKey: a constant hot key two-level ranks to the same " +
      "reservoir as the single-window spelling") {
    import graft.operators.Sampling
    val rows = (1L to 3000L).map(i => (i, "en")).toDF("doc_id", "lang")
      .repartition(7)
    val got = Sampling.topNPerKey(rows, "lang", "doc_id", 50)
      .select($"doc_id").as[Long].collect().toSet
    assert(got.size == 50)
    // brute force: replay the NUL-delimited md5 draw JVM-side
    def draw(id: Long): String = java.security.MessageDigest
      .getInstance("MD5")
      .digest((id.toString + "\u0000" + Sampling.ReservoirSalt)
        .getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    val want = (1L to 3000L).map(i => (i, draw(i)))
      .sortBy { case (id, d) => (d, id) }.take(50).map(_._1).toSet
    assert(got == want)
  }

  test("bigramLm + lmScore: stupid-backoff probabilities, OOV floor, " +
      "backoff counters") {
    import graft.operators.TextAnalysis
    val ref = Seq("a b a c", "a b b").toDF("text")
    val lm = TextAnalysis.bigramLm(ref, "text")
    val uni = lm.filter($"prev".isNull).select($"tok", $"c")
      .as[(String, Long)].collect().toMap
    assert(uni == Map("a" -> 3L, "b" -> 3L, "c" -> 1L))
    val big = lm.filter($"prev".isNotNull).select($"prev", $"tok", $"c")
      .as[(String, String, Long)].collect()
      .map { case (p, tk, c) => (p, tk) -> c }.toMap
    assert(big == Map(("a", "b") -> 2L, ("b", "a") -> 1L,
      ("a", "c") -> 1L, ("b", "b") -> 1L))
    // doc 1 all in-vocab/in-bigram; doc 2 hits the OOV floor (z, q)
    // and the backoff path (prev OOV; unseen bigram a->q)
    val docs = Seq((1L, "a b a c"), (2L, "z a q")).toDF("doc_id", "text")
    val got = TextAnalysis.lmScore(docs, "doc_id", "text", lm)
      .orderBy($"doc_id").as[(Long, Long, Long, Long, Double)]
      .collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3, r._4)) ==
      Seq((1L, 4L, 0L, 0L), (2L, 3L, 2L, 2L)), s"got $got")
    val x1 = -(math.log10(3.0 / 7) + math.log10(2.0 / 3) +
      math.log10(1.0 / 3) + math.log10(1.0 / 3)) / 4
    val x2 = -(math.log10(1.0 / 7) + math.log10(0.4 * (3.0 / 7)) +
      math.log10(0.4 * (1.0 / 7))) / 3
    assert(math.abs(got(0)._5 - x1) < 1e-6, s"doc1 xent ${got(0)._5}")
    assert(math.abs(got(1)._5 - x2) < 1e-6, s"doc2 xent ${got(1)._5}")
  }

  test("trigramLm + lmScore3: full stupid-backoff chain, level " +
      "counters, OOV double-backoff") {
    import graft.operators.TextAnalysis
    val ref = Seq("a b c a b d", "a b c").toDF("text")
    val lm = TextAnalysis.trigramLm(ref, "text")
    val uni = lm.filter($"p2".isNull && $"p1".isNull)
      .select($"tok", $"c").as[(String, Long)].collect().toMap
    assert(uni == Map("a" -> 3L, "b" -> 3L, "c" -> 2L, "d" -> 1L))
    val tri = lm.filter($"p2".isNotNull)
      .select($"p2", $"p1", $"tok", $"c")
      .as[(String, String, String, Long)].collect()
      .map { case (x, y, z, c) => (x, y, z) -> c }.toMap
    assert(tri == Map(("a", "b", "c") -> 2L, ("b", "c", "a") -> 1L,
      ("c", "a", "b") -> 1L, ("a", "b", "d") -> 1L))
    // doc 1 walks every level: unigram start, seen bigram, seen
    // trigram, OOV double-backoff, unseen-context double-backoff,
    // single backoff to a seen bigram
    val docs = Seq((1L, "a b c z b c"), (2L, "a b c"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.lmScore3(docs, "doc_id", "text", lm)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3, r._4, r._5)) ==
      Seq((1L, 6L, 1L, 1L, 2L), (2L, 3L, 0L, 1L, 1L)), s"got $got")
    val x1 = -(math.log10(3.0 / 9) + math.log10(3.0 / 3) +
      math.log10(2.0 / 3) + math.log10(0.4 * (0.4 * (1.0 / 9))) +
      math.log10(0.4 * (0.4 * (3.0 / 9))) +
      math.log10(0.4 * (2.0 / 3))) / 6
    val x2 = -(math.log10(3.0 / 9) + math.log10(3.0 / 3) +
      math.log10(2.0 / 3)) / 3
    assert(math.abs(got(0)._6 - x1) < 1e-6, s"doc1 xent ${got(0)._6}")
    assert(math.abs(got(1)._6 - x2) < 1e-6, s"doc2 xent ${got(1)._6}")
  }

  test("importanceWeights: capped per-token likelihood ratio from the " +
      "two LM scores, target-domain docs keep weight 1") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "a b a c", "t"), (2L, "a b b", "t"),
      (3L, "z q z q z", "o"), (4L, "a b z", "o")
    ).toDF("doc_id", "text", "dom")
    val lmT = TextAnalysis.bigramLm(docs.filter($"dom" === "t"), "text")
    val lmS = TextAnalysis.bigramLm(docs, "text")
    val got = TextAnalysis.importanceWeights(
        docs, "doc_id", "text", lmT, lmS)
      .select($"doc_id", $"imp_weight").as[(Long, Double)]
      .collect().toMap
    // recompute from the two score frames: w = round6(min(1, 10^(hs-ht)))
    def xent(lm: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      TextAnalysis.lmScore(docs, "doc_id", "text", lm)
        .select($"doc_id", $"lm_log10_ppt").as[(Long, Double)]
        .collect().toMap
    val (ht, hs) = (xent(lmT), xent(lmS))
    docs.select($"doc_id").as[Long].collect().foreach { id =>
      val exp = BigDecimal(math.min(1.0, math.pow(10, hs(id) - ht(id))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(id) == exp, s"doc $id: ${got(id)} != $exp")
    }
    // target-domain docs score no worse under their own LM than the
    // mixed source LM -> ratio >= 1 -> capped at exactly 1
    assert(got(1L) == 1.0 && got(2L) == 1.0, s"got $got")
    // the all-off-domain doc is clearly down-weighted (0.118 on this
    // fixture: every token OOV under the target LM)
    assert(got(3L) < 0.5, s"doc 3 weight ${got(3L)}")
  }

  test("quantizeInt8 single-arg convenience equals the two-step form") {
    import graft.operators.Similarity
    val emb = Graft.table(spark, sf, "embeddings").limit(50)
    val viaConvenience = emb.select($"vec_id",
        Similarity.quantizeInt8($"embedding").as("q"))
      .as[(Long, Seq[Int])].collect().toMap
    val viaTwoStep = emb
      .withColumn("__m", Similarity.vectorMaxAbs($"embedding"))
      .select($"vec_id",
        Similarity.quantizeInt8With($"embedding", $"__m").as("q"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(viaConvenience == viaTwoStep)
  }

  test("quantizeInt8 round-trips within half a scale step") {
    import graft.operators.Similarity
    val emb = Graft.table(spark, sf, "embeddings")
    val checked = emb.select($"vec_id", $"embedding",
        Similarity.quantizeInt8($"embedding").as("q"),
        Similarity.quantScale($"embedding").as("scale"))
      .withColumn("max_err",
        array_max(zip_with($"embedding", $"q",
          (v, q) => abs(v.cast("double") - q * $"scale"))))
      .agg(max($"max_err"), max(array_max(transform($"q", abs(_)))))
      .as[(Double, Int)].head()
    assert(checked._1 <= emb.select(
        max(Similarity.quantScale($"embedding") / 2.0)).as[Double].head(),
      s"dequantization error ${checked._1} exceeds scale/2")
    assert(checked._2 <= 127, "quantized values must stay in int8 range")
  }

  test("topNPerKey keeps exactly min(n, group size) smallest draws per key") {
    val top = Sampling.topNPerKey(docs, "lang", "doc_id", 10)
    val sizes = top.groupBy($"lang").count()
      .as[(String, Long)].collect().toMap
    val full = docs.groupBy($"lang").count()
      .as[(String, Long)].collect().toMap
    full.foreach { case (l, n) =>
      assert(sizes(l) == math.min(10L, n), s"wrong count for $l")
    }
    // deterministic: repeated runs pick the identical rows
    val again = Sampling.topNPerKey(docs, "lang", "doc_id", 10)
      .select($"doc_id").as[Long].collect().toSet
    assert(top.select($"doc_id").as[Long].collect().toSet == again)
    // the kept rows are the n smallest hash draws of their key (in the
    // reservoir salt domain)
    val zhKept = top.filter($"lang" === "zh")
      .select(Sampling.hashBucket($"doc_id", Sampling.ReservoirSalt))
      .as[String].collect().max
    val zhDropped = docs.filter($"lang" === "zh")
      .exceptAll(top.filter($"lang" === "zh"))
      .select(Sampling.hashBucket($"doc_id", Sampling.ReservoirSalt))
      .as[String].collect().min
    assert(zhKept < zhDropped,
      "every kept draw must be smaller than every dropped draw")
  }

  test("selectToTokenBudget equals the single-window definition, " +
      "nests across budgets, and respects per-stratum totals") {
    val base = docs.select($"doc_id", $"lang",
      graft.operators.TextAnalysis.tokenCount($"text").cast("long")
        .as("ntok"))
    val kept = Sampling.selectToTokenBudget(base, "doc_id", $"ntok",
        2000L, Some("lang"))
      .select($"doc_id").as[Long].collect().toSet
    // the definition the bucket-histogram path must reproduce exactly:
    // one global window per stratum in (draw, id) order
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"lang")
      .orderBy(Sampling.hashBucket($"doc_id", Sampling.BudgetSalt),
        $"doc_id")
    val naive = base.withColumn("cum", sum($"ntok").over(w))
      .filter($"cum" <= 2000L)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == naive,
      s"histogram path diverges from single-window definition: " +
        s"extra=${kept -- naive} missing=${naive -- kept}")
    // budgets nest like fractions do
    val small = Sampling.selectToTokenBudget(base, "doc_id", $"ntok",
        500L, Some("lang"))
      .select($"doc_id").as[Long].collect().toSet
    assert(small.subsetOf(kept), "a smaller budget must keep a subset")
    // every stratum lands within budget (and selection is non-trivial)
    val totals = Sampling.selectToTokenBudget(base, "doc_id", $"ntok",
        2000L, Some("lang"))
      .groupBy($"lang").agg(sum($"ntok").as("t"))
      .as[(String, Long)].collect()
    assert(totals.nonEmpty && totals.forall(_._2 <= 2000L))
    // unstratified form budgets globally; zero budget keeps nothing
    val g = Sampling.selectToTokenBudget(base, "doc_id", $"ntok", 3000L)
    assert(g.agg(sum($"ntok")).as[Long].head() <= 3000L)
    assert(Sampling.selectToTokenBudget(base, "doc_id", $"ntok", 0L)
      .count() == 0L)
  }

  test("composed curation draws are independent across operators " +
      "(domain-separated salts)") {
    import graft.operators.Packing
    // a synthetic id universe large enough for tight fraction bounds
    val ids = spark.range(20000).select($"id".as("doc_id"))

    // sample → split: band fractions WITHIN the sample track the split
    // weights (the un-salted draw put 100% of a 0.2-sample in `train`
    // because 0.2 < 0.8 — both operators compared the same hash)
    val sampled = Sampling.hashSample(ids, "doc_id", 0.2)
    val nSampled = sampled.count().toDouble
    assert(nSampled > 3000, s"fixture too small: $nSampled")
    val bands = Sampling.splitByHash(sampled, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy($"split").count().as[(String, Long)].collect().toMap
    Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1).foreach {
      case (band, w) =>
        val got = bands.getOrElse(band, 0L) / nSampled
        assert(math.abs(got - w) < 0.05,
          s"band $band got fraction $got of the sample, want ≈$w " +
            s"(counts $bands)")
    }

    // sample → pack: every one of the 16 shards is populated (the
    // un-salted shard key was the draw's high nibble: a 0.2 sample
    // populated only shards 0–3)
    val shards = Packing.packChunks(
        sampled.withColumn("n_tok", lit(10L)), "doc_id", "n_tok",
        capacity = 64L)
      .select($"shard").distinct().as[String].collect().toSet
    // == 16 is safe ONLY because of the nSampled > 3000 floor asserted
    // above: P(any shard empty) ≈ 16·(15/16)^3000 ≈ 10^-83. If the
    // fixture or fraction ever shrinks below that floor, loosen this to
    // `> 4` — 4 shards (the draw's high nibble under 0.2) is the exact
    // degeneracy the un-salted shard key produced and the fix guards
    // against.
    assert(shards.size == 16,
      s"a 0.2 sample must still fill all 16 shards, got $shards")

    // sample → per-key reservoir: the reservoir is NOT simply the
    // sample's lowest sampling draws — the domains are separate
    val keyed = sampled.withColumn("k", lit("all"))
    val reservoir = Sampling.topNPerKey(keyed, "k", "doc_id", 100)
      .select($"doc_id").as[Long].collect().toSet
    val lowestSampleDraws = sampled
      .orderBy(Sampling.hashBucket($"doc_id", Sampling.SampleSalt),
        $"doc_id")
      .limit(100).select($"doc_id").as[Long].collect().toSet
    assert(reservoir != lowestSampleDraws,
      "reservoir draws must be independent of the sampling draws")
  }

  test("hashSample/splitByHash/weightedHashSample are streaming-safe " +
      "and keep the batch draws (pure stateless filters/projections)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[Long](spark)
    // weight = id/700: both always-keep (id ≥ 700) and drawn branches
    def weighted(df: org.apache.spark.sql.DataFrame) =
      Sampling.weightedHashSample(df, "doc_id", col("doc_id") / lit(700.0))
    val streamed = Sampling.splitByHash(
      weighted(Sampling.hashSample(
        input.toDF.withColumnRenamed("value", "doc_id"), "doc_id", 0.5)),
      "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val q = streamed.writeStream.outputMode("append")
      .format("memory").queryName("sampling_stream").start()
    try {
      input.addData(1L to 500L: _*)
      input.addData(501L to 1000L: _*)
      q.processAllAvailable()
      val got = spark.table("sampling_stream")
        .select($"doc_id", $"split").as[(Long, String)].collect().toSet
      val want = Sampling.splitByHash(
        weighted(Sampling.hashSample((1L to 1000L).toDF("doc_id"),
          "doc_id", 0.5)),
        "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select($"doc_id", $"split").as[(Long, String)].collect().toSet
      assert(got == want,
        "streaming curation filters must select/assign exactly the " +
          "batch draws")
      assert(want.nonEmpty)
    } finally q.stop()
  }

  test("temperatureMixWithRates streams against static rates with " +
      "the batch draws; snapshot-absent domains are dropped") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val batch = Graft.table(spark, sf, "documents")
      .select($"doc_id", $"lang")
    val rates = Sampling.domainMixRates(batch, "lang", tau = 0.5)
    val input = MemoryStream[(Long, String)](spark)
    val mixed = Sampling.temperatureMixWithRates(
      input.toDF.toDF("doc_id", "lang"), rates, "doc_id", "lang")
    assert(mixed.isStreaming,
      "rate application must plan on a streaming frame")
    val q = mixed.writeStream.outputMode("append")
      .format("memory").queryName("mix_stream").start()
    try {
      // replay the snapshot corpus, plus a domain born after it
      input.addData(batch.as[(Long, String)].collect().toIndexedSeq: _*)
      input.addData((999999L, "xx"))
      q.processAllAvailable()
      val got = spark.table("mix_stream")
        .as[(Long, String)].collect().toSet
      val want = Sampling.temperatureMixSample(batch, "doc_id", "lang")
        .as[(Long, String)].collect().toSet
      assert(got == want,
        "streaming mix must keep exactly the batch selection")
      assert(!got.exists(_._2 == "xx"),
        "a domain absent from the rate snapshot must drop, not pass")
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS mix_stream")
    }
  }

  test("allocateMix: water-filling hand examples — single and " +
      "cascading saturation, budget delivered exactly, unsaturated " +
      "ratios preserved; randomized invariants; refusals") {
    // one short source: c needs 20 of its 10 → saturates; its
    // deficit redistributes 5:3 over a and b
    val f1 = Sampling.allocateMix(
      Map("a" -> 100L, "b" -> 50L, "c" -> 10L),
      Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2), 100L)
    assert(f1("c") == 1.0)
    assert(f1("a") == 0.5625 && f1("b") == 0.675)
    // delivered tokens = Σ frac·avail = budget, exactly here
    assert(f1.map { case (s, f) =>
      f * Map("a" -> 100L, "b" -> 50L, "c" -> 10L)(s) }.sum == 100.0)
    // cascade: b and c both saturate, a absorbs everything left
    val f2 = Sampling.allocateMix(
      Map("a" -> 100L, "b" -> 20L, "c" -> 10L),
      Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0), 120L)
    assert(f2 == Map("a" -> 0.9, "b" -> 1.0, "c" -> 1.0))
    // no saturation: plain weight-proportional shares
    val f3 = Sampling.allocateMix(
      Map("a" -> 100L, "b" -> 100L),
      Map("a" -> 3.0, "b" -> 1.0), 80L)
    assert(f3 == Map("a" -> 0.6, "b" -> 0.2))
    // budget = everything available → every source saturates
    assert(Sampling.allocateMix(Map("a" -> 5L, "b" -> 7L),
      Map("a" -> 1.0, "b" -> 9.0), 12L) ==
      Map("a" -> 1.0, "b" -> 1.0))
    // zero-availability source is a trivial saturation, never a
    // division by zero
    val fz = Sampling.allocateMix(Map("a" -> 100L, "z" -> 0L),
      Map("a" -> 1.0, "z" -> 1.0), 50L)
    assert(fz("z") == 1.0 && fz("a") == 0.5)
    // randomized invariants: fractions bounded, budget delivered,
    // unsaturated pairs keep their target ratio
    val rng = new scala.util.Random(4242)
    for (_ <- 1 to 50) {
      val n = 2 + rng.nextInt(6)
      val avail = (0 until n)
        .map(i => s"s$i" -> (1L + rng.nextInt(10000))).toMap
      val w = (0 until n)
        .map(i => s"s$i" -> (0.05 + rng.nextDouble())).toMap
      val budget = 1L + rng.nextLong(avail.values.sum)
      val f = Sampling.allocateMix(avail, w, budget)
      assert(f.keySet == avail.keySet)
      assert(f.values.forall(x => x >= 0.0 && x <= 1.0 + 1e-12))
      val delivered = f.map { case (s, x) => x * avail(s) }.sum
      assert(math.abs(delivered - budget) < 1e-6 * budget + 1e-6,
        s"delivered $delivered of $budget")
      val unsat = f.filter(_._2 < 1.0 - 1e-12).keys.toSeq
      for (Seq(i, j) <- unsat.combinations(2)) {
        val ri = f(i) * avail(i) / w(i)
        val rj = f(j) * avail(j) / w(j)
        assert(math.abs(ri - rj) < 1e-6 * math.max(ri, rj),
          "unsaturated sources must keep the target ratio")
      }
    }
    // refusals
    intercept[IllegalArgumentException] {
      Sampling.allocateMix(Map("a" -> 10L), Map("a" -> 1.0), 11L)
    }
    intercept[IllegalArgumentException] {
      Sampling.allocateMix(Map("a" -> 10L), Map("b" -> 1.0), 5L)
    }
    intercept[IllegalArgumentException] {
      Sampling.allocateMix(Map("a" -> 10L), Map("a" -> 0.0), 5L)
    }
    intercept[IllegalArgumentException] {
      Sampling.allocateMix(Map.empty[String, Long], Map.empty, 0L)
    }
  }

  test("allocateMix fractions drive stratifiedHashSample: the " +
      "sampled corpus hits the budget in expectation and the " +
      "saturated source survives whole") {
    val rows = (0 until 3000).map { i =>
      val src = if (i % 10 == 0) "rare" else if (i % 2 == 0) "web"
        else "code"
      (i.toLong, src, 10L) // 10 tokens per doc, uniform
    }
    val df = rows.toDF("id", "src", "ntok")
    val avail = df.groupBy($"src").agg(sum($"ntok").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // rare is a tenth of the corpus but wants 60% weight at a
    // half-corpus budget → saturates
    val f = Sampling.allocateMix(avail,
      Map("web" -> 0.2, "code" -> 0.2, "rare" -> 0.6),
      avail.values.sum / 2)
    assert(f("rare") == 1.0)
    val kept = Sampling.stratifiedHashSample(df, "id", "src", f)
    assert(kept.filter($"src" === "rare").count() ==
      df.filter($"src" === "rare").count(),
      "a saturated source must survive whole")
    val keptTok = kept.agg(sum($"ntok")).head().getLong(0)
    val budget = avail.values.sum / 2
    assert(math.abs(keptTok - budget).toDouble / budget < 0.15,
      s"sampled $keptTok tokens for a $budget budget")
  }
}
