package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Property tests (SURVEY §5 plan): ScalaCheck-generated inputs,
  * invariants asserted over whole generated DataFrames in one Spark
  * job per property (per-case Spark jobs would be pathological).
  */
class PropertySpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int): Seq[A] = {
    val params = Gen.Parameters.default
    val seed0 = rng.Seed(42L)
    Iterator.iterate((Option.empty[A], seed0)) { case (_, s) =>
      val r = g.doPureApply(params, s)
      (Some(r.retrieve.get), r.seed)
    }.drop(1).take(n).flatMap(_._1).toSeq
  }

  test("window assignment: start <= ts < start+len, start aligned") {
    // mirrors the reference's snap_to_window_start floor semantics
    // (continuous/streaming_window.rs:1053-1094)
    val tsGen = Gen.chooseNum(0L, 4102444800000L) // 1970..2100 in ms
    val rows = sample(tsGen, 5000).toDF("ms")
      .withColumn("ts", timestamp_millis($"ms"))
    for (strideSec <- Seq(1L, 60L, 900L, 3600L, 86400L)) {
      val bad = rows.select($"ms",
        unix_millis(graft.functions.date_bin(strideSec, $"ts")).as("ws"))
        .filter($"ws" % (strideSec * 1000) =!= 0 ||
          $"ws" > $"ms" || $"ms" >= $"ws" + strideSec * 1000)
        .count()
      assert(bad == 0, s"stride ${strideSec}s violated window bounds")
      // agreement with Spark's own TimeWindow floor
      val disagree = rows.select(
        graft.functions.date_bin(strideSec, $"ts").as("a"),
        window($"ts", s"$strideSec seconds").getField("start").as("b"))
        .filter($"a" =!= $"b").count()
      assert(disagree == 0, s"stride ${strideSec}s disagrees with window()")
    }
  }

  test("jaccard: bounded [0,1], reflexive=1, symmetric") {
    val wordGen = Gen.oneOf("a b c d", "a b", "x y z a b c", "q w e r t",
      "a a a a", "z z y y x x w w v v")
    val pairs = sample(Gen.zip(wordGen, wordGen), 500)
      .toDF("t1", "t2")
      .select(Dedup.shingles($"t1", 2).as("s1"),
        Dedup.shingles($"t2", 2).as("s2"))
    val bad = pairs.select(
      Dedup.jaccard($"s1", $"s2").as("j12"),
      Dedup.jaccard($"s2", $"s1").as("j21"),
      Dedup.jaccard($"s1", $"s1").as("jself"))
      .filter($"j12" < 0 || $"j12" > 1 || $"j12" =!= $"j21" ||
        $"jself" =!= 1.0)
      .count()
    assert(bad == 0)
  }

  test("minhash: equal inputs give equal sigs; sig length always k") {
    val textGen = Gen.nonEmptyListOf(
      Gen.oneOf("spark", "window", "stream", "batch", "merge", "sort"))
      .map(_.mkString(" "))
    val df = sample(textGen, 1000).toDF("t")
      .select($"t", Dedup.minhashSignature(
        Dedup.shingleHashes($"t", 3), 16).as("sig"))
    assert(df.filter(size($"sig") =!= 16).count() == 0)
    // determinism: same text → same signature (group by text, one sig)
    val nonDet = df.groupBy($"t")
      .agg(countDistinct($"sig").as("n")).filter($"n" > 1).count()
    assert(nonDet == 0)
  }

  test("simhash: order-invariant (vote commutativity), non-constant") {
    val tokGen = Gen.nonEmptyListOf(Gen.identifier).map(_.take(8))
    val df = sample(tokGen, 500).toDF("toks")
      .select(functions.simhash64($"toks").as("fwd"),
        functions.simhash64(reverse($"toks")).as("rev"))
    assert(df.filter($"fwd" =!= $"rev").count() == 0,
      "token order must not change the signature")
    assert(df.select(countDistinct($"fwd")).head.getLong(0) > 100,
      "distinct token lists must spread over distinct signatures")
  }

  test("l2_normalize output has unit norm") {
    val vecGen = Gen.nonEmptyListOf(Gen.chooseNum(-100.0f, 100.0f))
      .map(_.take(16)).suchThat(_.exists(_ != 0.0f))
    val df = sample(vecGen, 500).toDF("v")
      .select(functions.dot_product(
        functions.l2_normalize($"v"), functions.l2_normalize($"v"))
        .as("n2"))
    val bad = df.filter(abs($"n2" - 1.0) > 1e-9).count()
    assert(bad == 0)
  }

  test("asOfJoinNearest distance never exceeds either directional " +
      "match (generated workload)") {
    import graft.operators.Joins
    val rnd = new scala.util.Random(13)
    val l = (1 to 300).map(i =>
      (i.toLong, s"k${rnd.nextInt(8)}",
        new java.sql.Timestamp(rnd.nextInt(100000).toLong)))
      .toDF("lid", "k", "lts")
    val r = (1 to 500).map(i =>
      (i.toLong, s"k${rnd.nextInt(10)}",
        new java.sql.Timestamp(rnd.nextInt(100000).toLong)))
      .toDF("rid", "rk", "rts")
    def dist(j: org.apache.spark.sql.DataFrame) = j
      .select($"lid", when($"rts".isNotNull,
        abs(unix_millis($"rts") - unix_millis($"lts"))).as("d"))
      .as[(Long, Option[Long])].collect().toMap
    val dn = dist(Joins.asOfJoinNearest(l, r, Seq("k"), Seq("rk"),
      "lts", "rts"))
    val db = dist(Joins.asOfJoinBackward(l, r, Seq("k"), Seq("rk"),
      "lts", "rts"))
    val df_ = dist(Joins.asOfJoinForward(l, r, Seq("k"), Seq("rk"),
      "lts", "rts"))
    dn.foreach { case (lid, nd) =>
      val best = Seq(db(lid), df_(lid)).flatten.minOption
      assert(nd == best,
        s"lid $lid: nearest $nd must equal min(backward, forward) $best")
    }
  }

  test("connectedComponents is idempotent and labels are closed under " +
      "the pair relation (generated graphs)") {
    val rnd = new scala.util.Random(17)
    val pairs = (1 to 300).map(_ =>
      (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
      .toDF("a", "b")
    val comps = Dedup.connectedComponents(pairs, "a", "b")
    val byId = comps.as[(Long, Long)].collect().toMap
    // closure: both endpoints of every pair share a component
    val violations = pairs.as[(Long, Long)].collect()
      .count { case (a, b) => byId(a) != byId(b) }
    assert(violations == 0, "pair endpoints must share a component")
    // labels are component minimums: every label maps to itself
    byId.values.toSet.foreach { c: Long =>
      assert(byId(c) == c, s"label $c must be its own component") }
    // idempotence: re-running on (id, comp) edges reproduces the labels
    val again = Dedup.connectedComponents(
      comps.select($"id".as("a"), $"comp".as("b")), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(again == byId, "CC must be a fixed point of itself")
  }

  test("pointer jumping converges min-label CC on a long path in " +
      "O(log diameter) rounds (regression: deep mutation chains)") {
    // diameter 199 with the minimum at one end — the worst shape for
    // plain neighbor propagation (needs 200 rounds; the sf1 d15
    // fixture built >30-deep chains that threw non-convergence).
    // maxIter 12 only passes if the comp←comp(comp) jump step is
    // halving pointer depth every round. The local union-find escape
    // hatch is disabled so the test exercises the DISTRIBUTED loop —
    // the path a production-sized pair graph takes.
    spark.conf.set("spark.graft.cc.localEdgeLimit", "0")
    try {
      val path = (1L until 200L).map(i => (i, i + 1)).toDF("a", "b")
      val labels = Dedup.connectedComponents(path, "a", "b",
          maxIter = 12)
        .as[(Long, Long)].collect().toMap
      assert(labels.size == 200 && labels.values.forall(_ == 1L),
        "a 200-node path is one component labeled by its minimum")
    } finally spark.conf.unset("spark.graft.cc.localEdgeLimit")
  }

  test("driver union-find escape hatch labels BIT-identically to the " +
      "distributed loops (random graphs, both algorithms)") {
    for ((nEdges, nNodes, seed) <- Seq((40, 200, 5), (300, 120, 23),
        (800, 90, 71))) {
      val rnd = new scala.util.Random(seed)
      val pairs = (1 to nEdges).map(_ =>
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong))
        .filter { case (a, b) => a != b }
        .toDF("a", "b")
      // local path (default limit covers these sizes)
      val localMin = Dedup.connectedComponents(pairs, "a", "b")
        .as[(Long, Long)].collect().toMap
      val localStar = Dedup.connectedComponentsStar(pairs, "a", "b")
        .as[(Long, Long)].collect().toMap
      // distributed path, forced
      spark.conf.set("spark.graft.cc.localEdgeLimit", "0")
      try {
        val distMin = Dedup.connectedComponents(pairs, "a", "b",
            maxIter = 60)
          .as[(Long, Long)].collect().toMap
        val distStar = Dedup.connectedComponentsStar(pairs, "a", "b")
          .as[(Long, Long)].collect().toMap
        assert(localMin == distMin,
          s"seed $seed: union-find diverges from the min-label loop")
        assert(localStar == distStar,
          s"seed $seed: union-find diverges from star contraction")
      } finally spark.conf.unset("spark.graft.cc.localEdgeLimit")
    }
  }

  test("star-contraction CC labels equal min-label CC on random " +
      "graphs, and converges on a long path in O(log n) rounds") {
    // random graphs of three densities: sparse (mostly trees/paths),
    // medium, dense (one giant component)
    for ((nEdges, nNodes, seed) <- Seq((40, 200, 3), (300, 120, 17),
        (800, 90, 99))) {
      val rnd = new scala.util.Random(seed)
      val pairs = (1 to nEdges).map(_ =>
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong))
        .filter { case (a, b) => a != b }
        .toDF("a", "b")
      val want = Dedup.connectedComponents(pairs, "a", "b", maxIter = 60)
        .as[(Long, Long)].collect().toMap
      val got = Dedup.connectedComponentsStar(pairs, "a", "b")
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"star CC diverges at seed $seed: " +
        s"${(got.toSet -- want.toSet).take(3)}")
    }
    // the shape min-label propagation is worst at: a path of 200
    // nodes (diameter 199 — the simple loop would need 200 rounds,
    // far past its default maxIter); star contraction needs O(log n).
    // Local escape hatch disabled so the CONTRACTION loop is what
    // converges here.
    spark.conf.set("spark.graft.cc.localEdgeLimit", "0")
    try {
      val path = (1L until 200L).map(i => (i, i + 1)).toDF("a", "b")
      val labels = Dedup.connectedComponentsStar(path, "a", "b",
          maxIter = 12)
        .as[(Long, Long)].collect().toMap
      assert(labels.size == 200 && labels.values.forall(_ == 1L),
        "a 200-node path is one component labeled by its minimum")
    } finally spark.conf.unset("spark.graft.cc.localEdgeLimit")
  }

  test("bpe_encode matches an independent iterative reference on " +
      "random words and merge lists (self-pairs included)") {
    // slow reference: the GPT-2 inference loop written directly over
    // Seq[String], independent of the expression's array machinery
    def reference(word: String, merges: Seq[String]): Seq[String] = {
      // duplicate merge entries: FIRST rank wins (reverse → earlier
      // insertions overwrite later in toMap), matching putIfAbsent
      val rank = merges.zipWithIndex.reverse.toMap
      var syms: Vector[String] = word.map(_.toString).toVector
      var done = syms.size <= 1
      while (!done) {
        val present = syms.zip(syms.tail)
          .map { case (a, b) => s"$a $b" }.filter(rank.contains)
        if (present.isEmpty) done = true
        else {
          val Array(a, b) = present.minBy(rank).split(" ", -1)
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.size) {
            if (i < syms.size - 1 && syms(i) == a && syms(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += syms(i); i += 1 }
          }
          syms = out.result()
          done = syms.size <= 1
        }
      }
      syms
    }
    val alpha = "thinaer"
    val rnd = new scala.util.Random(42)
    def randMerges(): Seq[String] = {
      // random pairs over chars and previously-formed symbols;
      // duplicates and self-pairs allowed (first rank wins)
      val symbols = scala.collection.mutable.ArrayBuffer(
        alpha.map(_.toString): _*)
      (0 until 12).map { _ =>
        val a = symbols(rnd.nextInt(symbols.size))
        val b = symbols(rnd.nextInt(symbols.size))
        if (a.length + b.length <= 4) symbols += (a + b)
        s"$a $b"
      }
    }
    (0 until 20).foreach { trial =>
      val merges = randMerges()
      val words = (0 until 60).map(_ =>
        (0 until (1 + rnd.nextInt(10)))
          .map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
      val got = words.toDF("w")
        .select(graft.functions.bpe_encode($"w", merges))
        .as[Seq[String]].collect()
      words.zip(got).foreach { case (w, g) =>
        assert(g == reference(w, merges),
          s"trial $trial word '$w' merges $merges: " +
            s"got $g want ${reference(w, merges)}")
      }
    }
  }

  test("validation suite: every check's (value, passed) equals a " +
      "driver-side brute-force recomputation over randomized data " +
      "and thresholds") {
    import graft.operators.Validate
    import graft.operators.Validate._
    val rowGen = for {
      v <- Gen.option(Gen.chooseNum(-50L, 150L))
      s <- Gen.option(Gen.oneOf("aa", "bb", "cc", "dd", "ee", "aa"))
    } yield (v, s)
    val rnd = new scala.util.Random(20260817L)
    (0 until 5).foreach { trial =>
      val rows = sample(rowGen, 400 + trial * 37)
        .zipWithIndex.map { case ((v, s), i) => (i.toLong, v, s) }
      val df = rows.toDF("id", "v", "s")
      val lo = rnd.nextInt(50).toDouble
      val hi = lo + rnd.nextInt(100).toDouble
      val frac = rnd.nextInt(100) / 100.0
      val suite = Seq(
        Completeness("v", frac), Uniqueness("s", frac, k = 1024),
        FracBetween("v", lo, hi, frac),
        InSet("s", Seq("aa", "bb"), frac),
        MinOf("v", lo), MaxOf("v", hi),
        MeanBetween("v", lo, hi), SizeAtLeast(rows.size / 2))
      val got = Validate.report(df, suite).collect()
        .map(r => r.getAs[String]("check_name") ->
          (Option(r.getAs[java.lang.Double]("value")),
            Option(r.getAs[java.lang.Boolean]("passed")))).toMap
      def r6(x: Double) =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble
      val n = rows.size.toDouble
      val vs = rows.flatMap(_._2)
      val ss = rows.flatMap(_._3)
      def expFrac(num: Double, den: Double, min: Double) =
        if (den == 0) (None, None)
        else (Some(r6(num / den)), Some(num / den >= min))
      val exp = Map[String, (Option[Double], Option[Boolean])](
        "completeness(v)" ->
          (Some(r6(vs.size / n)), Some(vs.size / n >= frac)),
        "uniqueness(s)" ->
          expFrac(ss.distinct.size, ss.size, frac),
        "between(v)" -> expFrac(
          vs.count(x => x >= lo && x <= hi), vs.size, frac),
        "in_set(s)" -> expFrac(
          ss.count(Set("aa", "bb")), ss.size, frac),
        "min(v)" -> (if (vs.isEmpty) (None, None)
          else (Some(vs.min.toDouble), Some(vs.min >= lo))),
        "max(v)" -> (if (vs.isEmpty) (None, None)
          else (Some(vs.max.toDouble), Some(vs.max <= hi))),
        "mean(v)" -> (if (vs.isEmpty) (None, None)
          else {
            val m = vs.sum.toDouble / vs.size
            (Some(r6(m)), Some(m >= lo && m <= hi))
          }),
        "size()" -> (Some(n), Some(n >= rows.size / 2)))
      exp.foreach { case (name, (ev, ep)) =>
        val (gv, gp) = got(name)
        assert(gv == ev && gp.map(Boolean.unbox) == ep,
          s"trial $trial $name: got ($gv, $gp) want ($ev, $ep) " +
            s"[lo=$lo hi=$hi frac=$frac]")
      }
    }
  }

  test("aucReport ≡ brute-force pair counting (wins + half-ties) " +
      "on random labeled scores; invariant under strictly monotone " +
      "score transforms") {
    import graft.operators.TextAnalysis
    // discrete score grid on purpose: plenty of ties to stress the
    // average-rank arithmetic
    val rowGen = Gen.zip(Gen.oneOf(0, 1), Gen.chooseNum(-5, 5))
    for (trial <- 1 to 5) {
      val rows = sample(Gen.listOfN(120, rowGen), trial).last
        .map { case (y, s) => (y, s / 2.0) }
      val np = rows.count(_._1 == 1).toLong
      val nn = rows.count(_._1 == 0).toLong
      val df = rows.toDF("y", "s")
      val got = TextAnalysis.aucReport(df, "y", "s").collect().head
      assert((got.getAs[Long]("n_pos"), got.getAs[Long]("n_neg")) ==
        ((np, nn)))
      if (np > 0 && nn > 0) {
        // brute force over all pos×neg pairs
        val pos = rows.filter(_._1 == 1).map(_._2)
        val neg = rows.filter(_._1 == 0).map(_._2)
        val u = (for (p <- pos; n <- neg) yield
          if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
        val want = u / (np * nn)
        val auc = got.getAs[Double]("auc")
        assert(math.abs(auc - want) < 1e-12,
          s"trial $trial: auc=$auc brute=$want")
        // AUC is a RANK statistic: any strictly increasing transform
        // leaves it bit-identical (the rank table is unchanged)
        val warped = df.withColumn("s", exp($"s" * 3) + lit(1.0))
        assert(TextAnalysis.aucReport(warped, "y", "s")
          .collect().head.getAs[Double]("auc") == auc,
          s"trial $trial: monotone transform moved the AUC")
      }
    }
  }

  test("prAucReport ≡ brute-force average precision with tie " +
      "blocks on random labeled scores; bounded (0,1]; monotone-" +
      "transform invariant") {
    import graft.operators.TextAnalysis
    val rowGen = Gen.zip(Gen.oneOf(0, 0, 1), Gen.chooseNum(-4, 4))
    for (trial <- 1 to 5) {
      val rows = sample(Gen.listOfN(90, rowGen), trial).last
        .map { case (y, s) => (y, s.toDouble) }
      val np = rows.count(_._1 == 1).toLong
      val df = rows.toDF("y", "s")
      val got = TextAnalysis.prAucReport(df, "y", "s").collect().head
      if (np == 0)
        assert(got.isNullAt(got.fieldIndex("pr_auc")))
      else {
        // brute force: distinct scores desc, AP = Σ pos_g·(P_g/C_g)/n⁺
        val byScore = rows.groupBy(_._2).toSeq.sortBy(-_._1)
        var (cpos, ccnt, ap) = (0L, 0L, 0.0)
        byScore.foreach { case (_, g) =>
          val p = g.count(_._1 == 1).toLong
          cpos += p; ccnt += g.size
          if (p > 0) ap += p.toDouble * cpos / ccnt
        }
        val want = ap / np
        val pr = got.getAs[Double]("pr_auc")
        // nano-unit term quantization: floor bias < 1e-9 (plus last-
        // ulp noise in the brute-force double fold itself)
        assert(math.abs(pr - want) < 1e-9,
          s"trial $trial: pr_auc=$pr brute=$want")
        assert(pr > 0.0 && pr <= 1.0)
        // AP is a rank statistic over INTEGER quantized terms: a
        // strictly monotone transform leaves it bit-identical
        val warped = df.withColumn("s", exp($"s"))
        assert(TextAnalysis.prAucReport(warped, "y", "s")
          .collect().head.getAs[Double]("pr_auc") == pr,
          s"trial $trial: monotone transform moved the AP")
      }
    }
  }
}
