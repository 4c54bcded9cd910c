package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{col, explode}
import graft.operators.Tokenizer

/** BPE merge learning, pinned against an INDEPENDENT reference
  * trainer: the reference below recounts pair frequencies with plain
  * immutable Scala collections and applies merges by list rebuild —
  * no code shared with `Tokenizer.learnFromTypes`'s array loop — so
  * agreement is evidence of the algorithm, not of the implementation.
  */
class TokenizerTrainSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  // ---- independent reference trainer (Sennrich Alg. 1, naive) ----

  private def refSymbols(w: String): List[String] =
    w.codePoints().toArray.toList
      .map(cp => new String(Character.toChars(cp)))

  private def refApply(s: List[String], a: String,
                       b: String): List[String] = s match {
    case x :: y :: rest if x == a && y == b =>
      (a + b) :: refApply(rest, a, b)
    case x :: rest => x :: refApply(rest, a, b)
    case Nil => Nil
  }

  private def refTrain(types: Seq[(String, Long)],
                       numMerges: Int,
                       minPairCount: Long = 2L): Seq[String] = {
    var seqs = types.map { case (w, c) => (refSymbols(w), c) }
    var merges = Vector.empty[String]
    var stop = false
    while (!stop && merges.length < numMerges) {
      val counts = seqs.flatMap { case (s, c) =>
        s.zip(s.drop(1)).map(p => (p, c))
      }.groupBy(_._1).map { case (p, xs) => (p, xs.map(_._2).sum) }
      if (counts.isEmpty) stop = true
      else {
        val ((a, b), cnt) = counts.minBy { case ((l, r), c) =>
          (-c, l, r)
        }
        if (cnt < minPairCount) stop = true
        else {
          merges :+= (a + " " + b)
          seqs = seqs.map { case (s, c) => (refApply(s, a, b), c) }
        }
      }
    }
    merges
  }

  private def refFinalSegmentation(types: Seq[(String, Long)],
                                   merges: Seq[String])
      : Map[String, List[String]] = {
    var seqs = types.map { case (w, c) => (w, refSymbols(w)) }
    merges.foreach { m =>
      val Array(a, b) = m.split(" ", -1)
      seqs = seqs.map { case (w, s) => (w, refApply(s, a, b)) }
    }
    seqs.toMap
  }

  // ---- specs ----

  test("bpe train: hand-worked Sennrich example, first merges exact") {
    // weighted type table: es(9+3)=12 dominates, then est, lo, low…
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .mkString(" ")
    val df = Seq(docs).toDF("text")
    val merges = Tokenizer.learnBpeMerges(df, "text", 4)
    // e-s appears in newest(6) + widest(3) = 9; e-w 6+2=8, l-o 7,
    // o-w 7, s-t 9 — tie (e,s) vs (s,t) breaks lexicographically to
    // (e,s); then (es,t) = 9 wins over the rest.
    assert(merges.take(2) == Seq("e s", "es t"))
    assert(merges.length == 4)
  }

  test("bpe train: matches the independent reference trainer on " +
    "random corpora (counts, ties, early stop)") {
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 0 until 8) {
      val vocab = Seq("ab", "abc", "bca", "cab", "aa", "bb", "abab",
        "cabab", "x", "yz", "xyz", "zz")
      val words = Seq.fill(60 + trial * 10)(
        vocab(rnd.nextInt(vocab.length)))
      val text = words.mkString(" ")
      val df = Seq(text).toDF("text")
      val types = words.groupBy(identity).toSeq
        .map { case (w, xs) => (w, xs.length.toLong) }
        .sortBy { case (w, c) => (-c, w) }
      val got = Tokenizer.learnBpeMerges(df, "text", 12,
        minPairCount = 2L)
      val want = refTrain(types, 12, minPairCount = 2L)
      assert(got == want, s"trial $trial: $got vs $want")
    }
  }

  test("bpe train: inference with the learned list reproduces the " +
    "trainer's own final segmentation of every training word") {
    val rnd = new scala.util.Random(99L)
    val vocab = Seq("alpha", "alphabet", "beta", "betamax", "gamma",
      "gam", "amma", "delta", "adelta")
    val words = Seq.fill(120)(vocab(rnd.nextInt(vocab.length)))
    val df = Seq(words.mkString(" ")).toDF("text")
    val merges = Tokenizer.learnBpeMerges(df, "text", 20)
    val types = words.groupBy(identity).toSeq
      .map { case (w, xs) => (w, xs.length.toLong) }
    val want = refFinalSegmentation(types, merges)
    val enc = Seq(vocab.mkString(" ")).toDF("t")
      .select(graft.functions.bpe_encode(
        org.apache.spark.sql.functions.col("t"), merges).as("toks"))
      .collect()(0).getSeq[String](0)
    val wantFlat = vocab.flatMap(w => want(w))
    assert(enc == wantFlat)
  }

  test("bpe train: deterministic across partitionings") {
    val docs = (1 to 40).map(i =>
      s"pack my box with five dozen liquor jugs number $i quick")
    val a = Tokenizer.learnBpeMerges(docs.toDF("text"), "text", 10)
    val b = Tokenizer.learnBpeMerges(
      docs.toDF("text").repartition(7), "text", 10)
    assert(a == b && a.length == 10)
  }

  test("bpe train: minPairCount stops before memorizing singletons") {
    val df = Seq("aa aa aa zq").toDF("text")
    // "a a" has count 3; every pair inside zq has count 1
    val merges = Tokenizer.learnBpeMerges(df, "text", 10,
      minPairCount = 2L)
    assert(merges == Seq("a a"))
  }

  test("bpe train: maxTypes cap is deterministic and honored") {
    // 3 types; cap at 2 keeps the two most frequent (tie on count
    // breaks by word asc: "bb" over "cc")
    val df = Seq("aa aa aa bb cc").toDF("text")
    val merges = Tokenizer.learnBpeMerges(df, "text", 5, maxTypes = 2,
      minPairCount = 1L)
    assert(merges == Seq("a a", "b b"))
  }

  test("bpe merges: persisted artifact round-trips in rank order and " +
      "refuses incomplete or foreign directories") {
    val dir = java.nio.file.Files.createTempDirectory("bpe_art")
      .toString
    val path = s"$dir/merges"
    val df = Seq("low low lower newest newest widest").toDF("text")
    val merges = Tokenizer.learnBpeMerges(df, "text", 6,
      minPairCount = 1L)
    Tokenizer.writeMerges(spark, merges, path)
    assert(Tokenizer.readMerges(spark, path) == merges)
    // errorifexists: a frozen artifact is never silently replaced
    intercept[Exception] {
      Tokenizer.writeMerges(spark, merges, path)
    }
    // a sidecar-less parquet dir is refused
    val bare = s"$dir/bare"
    Seq((0, "a b")).toDF("rank", "pair").write.parquet(bare)
    val e = intercept[IllegalArgumentException] {
      Tokenizer.readMerges(spark, bare)
    }
    assert(e.getMessage.contains("sidecar"))
    // a dedup index is not a tokenizer artifact
    val wrongKind = s"$dir/winnow"
    graft.operators.DedupIndex.writeWinnow(
      Seq("some reference text with enough tokens here").toDF("text"),
      "text", wrongKind)
    val e2 = intercept[IllegalArgumentException] {
      Tokenizer.readMerges(spark, wrongKind)
    }
    assert(e2.getMessage.contains("bpe_merges"))
  }

  test("bpe vocab: alphabet + merge products, sorted") {
    val df = Seq("ab ab cd").toDF("text")
    val merges = Tokenizer.learnBpeMerges(df, "text", 2,
      minPairCount = 1L)
    val v = Tokenizer.bpeVocab(df, "text", merges)
    assert(merges.head == "a b")
    assert(v.contains("ab") && Seq("a", "b", "c", "d").forall(
      v.contains))
    assert(v == v.sorted)
  }

  // ---- byte-level (GPT-2-style) trainer ----

  test("byte bpe: byte-unicode table is a 256-way bijection onto " +
      "printable code points; space maps to the canonical 'Ġ'; " +
      "emoji fall back to one symbol per UTF-8 byte") {
    val tbl = Tokenizer.ByteToUnicode
    assert(tbl.length == 256 && tbl.toSet.size == 256)
    // printable ASCII maps to itself; space is displaced to U+0120
    assert(tbl('a'.toInt) == 'a' && tbl('!'.toInt) == '!')
    assert(tbl(' '.toInt) == 'Ġ') // the famous Ġ
    assert(Tokenizer.byteSymbols(" the").toSeq ==
      Seq("Ġ", "t", "h", "e"))
    // 4-byte emoji → 4 byte-fallback symbols, never out-of-alphabet
    assert(Tokenizer.byteSymbols("🙂").length == 4)
  }

  test("byte bpe: GPT-2 pretokenizer keeps the space WITH the " +
      "following word and splits contractions") {
    val got = Tokenizer.pretokenCounts(
        Seq("don't stop don't").toDF("text"), "text")
      .orderBy($"word").as[(String, Long)].collect().toSeq
    assert(got == Seq((" don", 1L), (" stop", 1L), ("'t", 2L),
      ("don", 1L)))
  }

  test("byte bpe: hand-worked example — space-prefixed types learn " +
      "their own merges; argmax and tie order match the code-point " +
      "trainer's rules over byte symbols") {
    // pretokens: the, ·cat, ·the, ·cat, ·ate (· = Ġ space symbol).
    // round 1: (a,t) = cat 2 + ate 1 = 3 wins over the 2-count pairs
    // round 2: tie at 2 among (t,h),(h,e),(Ġ,c),(c,at) — left-asc
    //          breaks to (c,at) ('c' < 'h' < 't' < 'Ġ'=U+0120)
    // round 3: tie among (t,h),(h,e),(Ġ,cat) breaks to (h,e)
    val df = Seq("the cat the cat ate").toDF("text")
    val merges = Tokenizer.learnByteBpeMerges(df, "text", 3,
      minPairCount = 1L)
    assert(merges == Seq("a t", "c at", "h e"))
  }

  test("byte bpe: deterministic across partitionings; minPairCount " +
      "early stop; non-ASCII text trains without any out-of-" +
      "alphabet failure") {
    val docs = (1 to 30).map(i => s"naïve café $i — déjà vu")
    val a = Tokenizer.learnByteBpeMerges(docs.toDF("text"), "text", 8)
    val b = Tokenizer.learnByteBpeMerges(
      docs.toDF("text").repartition(7), "text", 8)
    assert(a == b && a.length == 8)
    // é is 2 UTF-8 bytes: its byte pair inside "café" recurs 30×,
    // so some learned merge joins two non-ASCII byte symbols
    assert(a.exists(_.split(" ").forall(_.forall(_ > '\u007f'))))
    // early stop: pretokens aa(1), ·aa(2), ·zq(1) — (a,a)=3 then
    // (Ġ,aa)=2 merge; every pair inside ·zq sits at 1 < minPairCount
    val rare = Seq("aa aa aa zq").toDF("text")
    assert(Tokenizer.learnByteBpeMerges(rare, "text", 10,
      minPairCount = 2L) == Seq("a a", "Ġ aa"))
  }

  test("byte bpe inference: byte_bpe_encode applies learned merges " +
      "over byte symbols (hand-checked tokens), reproduces the " +
      "trainer's final segmentation, and decodeByteTokens inverts " +
      "it losslessly — spaces, accents and emoji included") {
    import org.apache.spark.sql.functions.col
    val corpus = Seq("the cat the cat ate").toDF("text")
    val merges = Tokenizer.learnByteBpeMerges(corpus, "text", 3,
      minPairCount = 1L)
    assert(merges == Seq("a t", "c at", "h e"))
    // hand-applied: "the"→[t,he] (only "h e" applies);
    // " cat"→[Ġ,cat] ("a t" then "c at"); " the"→[Ġ,t,he];
    // " ate"→[Ġ,at,e]
    val toks = corpus
      .select(graft.functions.byte_bpe_encode(col("text"), merges)
        .as("t"))
      .head().getSeq[String](0)
    assert(toks == Seq("t", "he", "Ġ", "cat", "Ġ", "t", "he",
      "Ġ", "cat", "Ġ", "at", "e"))
    // SQL registry spelling agrees
    graft.functions.GraftFunctions.registerAll(spark)
    corpus.createOrReplaceTempView("bbpe_in")
    assert(spark.sql(
      "SELECT byte_bpe_encode(text, array('a t','c at','h e')) " +
        "FROM bbpe_in").head().getSeq[String](0) == toks)
    // lossless decode for arbitrary text — the property byte-level
    // tokenization exists for (pretokens partition the input; the
    // byte table is a bijection)
    val tricky = "naïve  café — déjà\tvu 🙂 twice 🙂🙂 end."
    val toks2 = Seq(tricky).toDF("text")
      .select(graft.functions.byte_bpe_encode(col("text"), merges)
        .as("t"))
      .head().getSeq[String](0)
    assert(Tokenizer.decodeByteTokens(toks2) == tricky)
    // mixing non-byte-symbol tokens into a decode refuses
    val e = intercept[IllegalArgumentException] {
      Tokenizer.decodeByteTokens(Seq("🙂"))
    }
    assert(e.getMessage.contains("not a byte-level symbol"))
    // randomized round-trip property: decode∘encode = id over 300
    // strings drawn from a deliberately nasty alphabet (whitespace
    // runs, combining marks, surrogate-pair emoji, control chars)
    val rnd = new scala.util.Random(20260815L)
    val alphabet: IndexedSeq[String] = IndexedSeq(
      "a", "B", "7", " ", "  ", "\t", "\n", "'", ".", ",", "-",
      "é", "ï", "—", "Ω", "中", "🙂", "🦀", "é", " ",
      "", "züm", "don't")
    val samples = (0 until 300).map { _ =>
      (0 until rnd.nextInt(12))
        .map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString
    }.filter(_.nonEmpty).distinct
    val back = samples.toDF("text")
      .select(col("text"),
        graft.functions.byte_bpe_encode(col("text"), merges)
          .as("toks"))
      .as[(String, Seq[String])].collect()
    back.foreach { case (orig, toks) =>
      assert(Tokenizer.decodeByteTokens(toks) == orig,
        s"round trip broke for ${orig.map(_.toInt.toHexString)}")
    }
  }

  // ---- unigram-LM (SentencePiece-style) tokenizer ----

  private def lpMap(vocab: Seq[(String, Double)])
      : java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double]()
    vocab.foreach { case (p, l) => m.put(p, l) }
    m
  }

  /** Independent brute-force Viterbi reference: enumerate EVERY
    * segmentation (pieces from the vocab, or one code point of unk),
    * pick max score (random real-valued log-probs make exact ties
    * measure-zero, so score alone decides).
    */
  private def bruteBest(word: String, vocab: Map[String, Double],
                        maxLen: Int, unkLp: Double)
      : (Double, List[String]) = {
    val cps = {
      val b = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        b += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      b.toList
    }
    def go(rest: List[String]): Seq[(Double, List[String])] =
      if (rest.isEmpty) Seq((0.0, Nil))
      else (1 to math.min(maxLen, rest.length)).flatMap { len =>
        val piece = rest.take(len).mkString
        val tail = rest.drop(len)
        vocab.get(piece).map { lp =>
          go(tail).map { case (s, ps) => (s + lp, piece :: ps) }
        }.getOrElse(if (len == 1)
          go(tail).map { case (s, ps) =>
            (s + unkLp, Tokenizer.UnkPiece :: ps)
          } else Seq.empty)
      }
    go(cps).maxBy(_._1)
  }

  test("unigram viterbi: matches brute-force enumeration on 200 " +
      "randomized (vocab, word) draws incl. unk fallbacks") {
    val rnd = new scala.util.Random(20260816L)
    val alphabet = "abcde"
    (0 until 200).foreach { trial =>
      // random vocab: all singles (sometimes missing one → unk) +
      // random multi-char pieces, real-valued log-probs
      val singles = alphabet.map(_.toString)
        .filter(_ => rnd.nextDouble() > 0.15)
      val multis = (0 until rnd.nextInt(12)).map { _ =>
        (0 until (2 + rnd.nextInt(3)))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }.distinct
      val vocab = (singles ++ multis).distinct
        .map(p => p -> (-8.0 * rnd.nextDouble() - 0.1))
      if (vocab.nonEmpty) {
        val word = (1 to (1 + rnd.nextInt(8)))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        val maxLen = vocab.map(_._1.length).max
        val got = Tokenizer
          .viterbiSegment(word, lpMap(vocab), maxLen).toList
        val (bestScore, bestSeg) =
          bruteBest(word, vocab.toMap, maxLen, Tokenizer.UnkLogProb)
        val gotScore = got.map {
          case Tokenizer.UnkPiece => Tokenizer.UnkLogProb
          case p => vocab.toMap.apply(p)
        }.sum
        assert(math.abs(gotScore - bestScore) < 1e-12,
          s"trial $trial: viterbi score $gotScore vs brute " +
            s"$bestScore for '$word' vocab $vocab (got $got, " +
            s"brute $bestSeg)")
      }
    }
  }

  test("unigram viterbi: documented tie-breaks — fewer pieces, then " +
      "longer last piece; surrogate pairs never split; empty word") {
    // equal score, 1 piece vs 2 → the single piece
    val v1 = Seq("ab" -> -1.0, "a" -> -0.5, "b" -> -0.5)
    assert(Tokenizer.viterbiSegment("ab", lpMap(v1), 2).toSeq ==
      Seq("ab"))
    // equal score AND pieces: [ab, c] vs [a, bc] → longer LAST piece
    val v2 = Seq("ab" -> -1.0, "c" -> -1.0, "a" -> -1.0,
      "bc" -> -1.0)
    assert(Tokenizer.viterbiSegment("abc", lpMap(v2), 2).toSeq ==
      Seq("a", "bc"))
    // astral char (surrogate pair) is ONE code point of unk
    val v3 = Seq("x" -> -1.0)
    assert(Tokenizer.viterbiSegment("x🙂x", lpMap(v3), 1).toSeq ==
      Seq("x", Tokenizer.UnkPiece, "x"))
    assert(Tokenizer.viterbiSegment("", lpMap(v3), 1).isEmpty)
  }

  test("unigram train: hand-worked EM example — the frequent word " +
      "earns its own piece, probs are exact usage fractions") {
    val types = Array(("abab", 10L), ("ab", 5L))
    val vocab = Tokenizer.learnUnigramFromTypes(types, vocabSize = 4)
    val m = vocab.toMap
    assert(m.keySet == Set("a", "b", "ab", "abab"),
      s"got ${vocab}")
    // final E-step: 'abab'(10) → [abab], 'ab'(5) → [ab]
    // usage: abab=10, ab=5, total=15; singles unused → floor
    assert(math.abs(m("abab") - math.log(10.0 / 15)) < 1e-12)
    assert(math.abs(m("ab") - math.log(5.0 / 15)) < 1e-12)
    assert(math.abs(m("a") - math.log(0.5 / 15)) < 1e-12)
    assert(math.abs(m("b") - math.log(0.5 / 15)) < 1e-12)
    // artifact order: (logProb desc, piece asc)
    assert(vocab.map(_._1) == Seq("abab", "ab", "a", "b"))
  }

  test("unigram train: distributed trainer is deterministic across " +
      "partitionings and the learned vocab segments the corpus it " +
      "was trained on without unks") {
    val corpus = Seq.fill(40)("the cat sat on the mat") ++
      Seq.fill(25)("the dog ran to the cat") ++
      Seq.fill(10)("a cat and a dog met")
    val df1 = corpus.toDF("text")
    val df8 = corpus.toDF("text").repartition(8)
    val v1 = Tokenizer.learnUnigram(df1, "text", vocabSize = 30)
    val v8 = Tokenizer.learnUnigram(df8, "text", vocabSize = 30)
    assert(v1 == v8, "partitioning changed the learned vocab")
    assert(v1.size == 30)
    // inference over the training corpus: full coverage, no unks
    val toks = df1.select(explode(
      graft.functions.unigram_encode(col("text"), v1)).as("t"))
      .as[String].collect()
    assert(!toks.contains(Tokenizer.UnkPiece))
    // frequent whole words should have won their own pieces
    assert(v1.map(_._1).contains("the"))
    assert(v1.map(_._1).contains("cat"))
  }

  test("unigram inference: expression ≡ trainer's own viterbi on " +
      "every corpus word; SQL registry spelling agrees; unseen " +
      "chars → <unk>") {
    val corpus = Seq.fill(20)("aa bb aa ab") ++ Seq.fill(9)("ba aab")
    val df = corpus.toDF("text")
    val vocab = Tokenizer.learnUnigram(df, "text", vocabSize = 8,
      maxPieceLen = 3)
    val words = Seq("aa", "bb", "ab", "ba", "aab")
    val viaExpr = words.toDF("w")
      .select(graft.functions.unigram_encode(col("w"), vocab)
        .as("toks"))
      .as[Seq[String]].collect().toSeq
    val maxLen = vocab.map(p => p._1.codePointCount(0, p._1.length)).max
    val direct = words.map(w =>
      Tokenizer.viterbiSegment(w, lpMap(vocab), maxLen).toSeq)
    assert(viaExpr == direct)

    // SQL registry parity
    graft.functions.GraftFunctions.registerAll(spark)
    words.toDF("w").createOrReplaceTempView("unigram_words")
    val pieces = vocab.map(_._1)
      .map(p => s"'${p.replace("'", "''")}'").mkString(",")
    val lps = vocab.map(_._2.toString).mkString(",")
    val viaSql = spark.sql(
      s"SELECT unigram_encode(w, array($pieces), array($lps)) " +
        "FROM unigram_words")
      .as[Seq[String]].collect().toSeq
    assert(viaSql == direct)

    // unseen characters: one unk per code point, rest segmented
    val got = Seq("aaXab").toDF("w")
      .select(graft.functions.unigram_encode(col("w"), vocab)
        .as("toks")).as[Seq[String]].collect().head
    assert(got.contains(Tokenizer.UnkPiece))
    assert(got.filterNot(_ == Tokenizer.UnkPiece).forall(p =>
      vocab.map(_._1).contains(p)))
  }

  test("unigram artifact: persisted vocab round-trips in rank order; " +
      "foreign/incomplete artifacts refused; alphabet-exceeding " +
      "vocabSize refused") {
    val corpus = Seq.fill(30)("aa bb ab").toDF("text")
    val vocab = Tokenizer.learnUnigram(corpus, "text", vocabSize = 5)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-unigram").toString
    Tokenizer.writeUnigram(spark, vocab, s"$dir/v")
    assert(Tokenizer.readUnigram(spark, s"$dir/v") == vocab)
    // frozen artifact: a second write refuses
    intercept[Exception] {
      Tokenizer.writeUnigram(spark, vocab, s"$dir/v")
    }
    // wrong-kind artifact refused
    Tokenizer.writeMerges(spark, Seq("a b"), s"$dir/m")
    val e = intercept[IllegalArgumentException] {
      Tokenizer.readUnigram(spark, s"$dir/m")
    }
    assert(e.getMessage.contains("'bpe_merges' artifact"))
    // vocabSize below the alphabet refuses loudly
    val e2 = intercept[IllegalArgumentException] {
      Tokenizer.learnUnigram(corpus, "text", vocabSize = 2)
    }
    assert(e2.getMessage.contains("alphabet"))
  }

  test("byte unigram: full byte alphabet seeded so NO input ever " +
      "emits <unk> — emoji/CJK/control round-trip losslessly; " +
      "expression ≡ trainer viterbi; SQL registry parity; " +
      "deterministic across partitionings; tiny vocab refused") {
    import org.apache.spark.sql.functions.col
    val corpus = Seq.fill(20)("the cat the cat ate") ++
      Seq.fill(5)("a cab at bat")
    val df = corpus.toDF("text")
    val vocab = Tokenizer.learnByteUnigram(df, "text",
      vocabSize = 280, maxPieceLen = 4)
    assert(vocab.size == 280)
    // the 256 byte symbols are all present (never pruned)
    val pieces = vocab.map(_._1).toSet
    assert(Tokenizer.ByteToUnicode.forall(c =>
      pieces.contains(String.valueOf(c))),
      "every byte symbol must survive in the vocabulary")
    // learned multi-byte pieces exist (the corpus's hot words)
    assert(vocab.exists(_._1.length > 1),
      "training must learn multi-byte pieces")

    // NO unk, EVER: the nasty-alphabet property the byte table is
    // for — none of these byte sequences appeared in training
    val rnd = new scala.util.Random(20260816L)
    val alphabet: IndexedSeq[String] = IndexedSeq(
      "a", "B", "7", " ", "  ", "\t", "\n", "'", ".", ",", "-",
      "é", "ï", "—", "Ω", "中", "🙂", "🦀", " ", "züm", "don't")
    val samples = (0 until 200).map { _ =>
      (0 until rnd.nextInt(12))
        .map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString
    }.filter(_.nonEmpty).distinct
    val encoded = samples.toDF("text")
      .select(col("text"),
        graft.functions.byte_unigram_encode(col("text"), vocab)
          .as("toks"))
      .as[(String, Seq[String])].collect()
    encoded.foreach { case (orig, toks) =>
      assert(!toks.contains(Tokenizer.UnkPiece),
        s"byte fallback must never emit <unk>: " +
          orig.map(_.toInt.toHexString))
      assert(Tokenizer.decodeByteTokens(toks) == orig,
        s"round trip broke for ${orig.map(_.toInt.toHexString)}")
    }

    // expression ≡ the trainer's own viterbi over byte-mapped
    // GPT-2 pretokens
    val tricky = "the cat 🙂 ate"
    val viaExpr = Seq(tricky).toDF("text")
      .select(graft.functions.byte_unigram_encode(col("text"), vocab)
        .as("t")).as[Seq[String]].collect().head
    val maxLen = vocab.map(p => p._1.codePointCount(0, p._1.length)).max
    val pretoks = {
      val m = java.util.regex.Pattern
        .compile(Tokenizer.Gpt2Pretokenizer).matcher(tricky)
      val b = scala.collection.mutable.ArrayBuffer[String]()
      while (m.find()) if (m.group().nonEmpty) b += m.group()
      b.toSeq
    }
    val direct = pretoks.flatMap(w => Tokenizer.viterbiSegment(
      Tokenizer.byteSymbols(w).mkString, lpMap(vocab), maxLen))
    assert(viaExpr == direct)

    // SQL registry parity
    graft.functions.GraftFunctions.registerAll(spark)
    Seq(tricky).toDF("text").createOrReplaceTempView("bunigram_in")
    val piecesSql = vocab.map(_._1)
      .map(p => "'" + p.replace("\\", "\\\\")
        .replace("'", "\\'") + "'").mkString(",")
    val lps = vocab.map(_._2.toString).mkString(",")
    val viaSql = spark.sql(
      s"SELECT byte_unigram_encode(text, array($piecesSql), " +
        s"array($lps)) FROM bunigram_in")
      .as[Seq[String]].collect().head
    assert(viaSql == direct)

    // deterministic across partitionings
    val again = Tokenizer.learnByteUnigram(df.toDF("text")
      .repartition(7), "text", vocabSize = 280, maxPieceLen = 4)
    assert(again == vocab)

    // a vocab that cannot hold the byte alphabet refuses
    val e = intercept[IllegalArgumentException] {
      Tokenizer.learnByteUnigram(df, "text", vocabSize = 256)
    }
    assert(e.getMessage.contains("byte"))
  }
}
