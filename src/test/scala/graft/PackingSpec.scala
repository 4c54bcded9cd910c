package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Packing

class PackingSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val cap = 2048L

  test("packChunks lays documents contiguously per shard with exact " +
      "chunk/offset arithmetic") {
    val docs = Graft.table(spark, sf, "documents")
    val packed = Packing.packChunks(docs, "doc_id", "n_chars", cap)
      .select($"doc_id", $"shard", $"n_chars", $"start", $"chunk",
        $"offset", $"chunks_spanned")
      .as[(Long, String, Long, Long, Long, Long, Long)].collect()

    packed.foreach { case (id, _, tok, start, chunk, off, spanned) =>
      assert(off >= 0 && off < cap, s"offset out of range for doc $id")
      assert(chunk == start / cap && off == start % cap,
        s"chunk/offset must derive from start for doc $id")
      assert(spanned == (start + tok - 1) / cap - chunk + 1,
        s"chunks_spanned wrong for doc $id")
    }
    // per shard: documents tile the stream with no gaps or overlaps,
    // in doc_id order — total tokens are conserved
    packed.groupBy(_._2).foreach { case (shard, rows) =>
      val ordered = rows.sortBy(_._1)
      var expectedStart = 0L
      ordered.foreach { case (id, _, tok, start, _, _, _) =>
        assert(start == expectedStart,
          s"doc $id in shard $shard starts at $start, expected " +
            s"$expectedStart (gap or overlap)")
        expectedStart += tok
      }
      assert(expectedStart == rows.map(_._3).sum,
        s"shard $shard must conserve tokens")
    }
  }

  test("packChunks: zero-token documents span zero chunks and shift " +
      "nothing") {
    val rows = Seq((1L, 100L), (2L, 0L), (3L, 50L))
    val packed = Packing.packChunks(rows.toDF("doc_id", "n_tok"),
        "doc_id", "n_tok", capacity = 64L)
      .select($"doc_id", $"n_tok", $"start", $"chunks_spanned")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    packed.foreach { case (id, (_, spanned)) =>
      if (id == 2L) assert(spanned == 0L,
        "a zero-token doc must span zero chunks (and never hit the " +
          "negative-dividend div/floor divergence)")
      else assert(spanned >= 1L, s"doc $id must span >= 1 chunk")
    }
  }

  test("shardChars=2 widens to 256 balanced shards refining the " +
      "1-char keys by prefix") {
    val docs = Graft.table(spark, sf, "documents")
    val p1 = Packing.packChunks(docs, "doc_id", "n_chars", cap,
        shardChars = 1)
      .select($"doc_id", $"shard").as[(Long, String)].collect().toMap
    val p2 = Packing.packChunks(docs, "doc_id", "n_chars", cap,
        shardChars = 2)
      .select($"doc_id", $"shard", $"n_chars", $"start")
      .as[(Long, String, Long, Long)].collect()

    // shard count: 500 ids over 16^2 buckets occupy ~220 distinct
    // shards (256·(1-e^{-500/256})); >150 rules out any prefix/salt
    // degeneracy (16 or fewer), ≤256 pins the keyspace
    val byShard = p2.groupBy(_._2)
    assert(byShard.size > 150 && byShard.size <= 256,
      s"expected ~220 of 256 shards occupied, got ${byShard.size}")
    // balance: uniform md5 ⇒ Poisson(λ≈2) per shard; max 12 is ~5σ out
    val maxLoad = byShard.values.map(_.length).max
    assert(maxLoad <= 12, s"shard imbalance: max load $maxLoad")

    // hierarchical refinement: the 2-char key EXTENDS the 1-char key,
    // so widening shards re-partitions each shard internally instead
    // of reshuffling documents across unrelated shards
    p2.foreach { case (id, shard2, _, _) =>
      assert(shard2.startsWith(p1(id)),
        s"doc $id: 2-char shard $shard2 must refine 1-char ${p1(id)}")
    }

    // the tiling invariants hold at every shardChars: per shard,
    // id-ordered docs tile the stream gap-free (start positions are
    // RELATIVE to the shard universe — changing shardChars re-lays-out,
    // which is why the scaladoc mandates wholesale regeneration)
    byShard.foreach { case (shard, rows) =>
      var expected = 0L
      rows.sortBy(_._1).foreach { case (id, _, tok, start) =>
        assert(start == expected,
          s"doc $id in shard $shard: start $start != $expected")
        expected += tok
      }
    }
  }

  test("packChunks placement is shard-local: unrelated documents never " +
      "move a doc's layout") {
    val docs = Graft.table(spark, sf, "documents")
    val full = Packing.packChunks(docs, "doc_id", "n_chars", cap)
      .select($"doc_id", $"shard", $"start")
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // drop every OTHER shard's documents: survivors keep their layout
    val keptShard = full.values.map(_._1).head
    val subset = docs.filter(
      Packing.shardKey($"doc_id") === keptShard)
    val repacked = Packing.packChunks(subset, "doc_id", "n_chars", cap)
      .select($"doc_id", $"shard", $"start")
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(repacked.nonEmpty)
    repacked.foreach { case (id, layout) =>
      assert(full(id) == layout,
        s"doc $id layout changed when other shards were removed")
    }
  }

  test("chunkByTokens windows with overlap, drops suffix tails, skips " +
      "blank docs") {
    val docs = Seq(
      // 10 tokens, max 4 / overlap 2 (stride 2): starts 0,2,4,6 full;
      // start 8 has 2 tokens == overlap -> dropped as a pure suffix
      (1L, "a b c d e f g h i j"),
      // 3 tokens < max: exactly one chunk
      (2L, "x y z"),
      // whitespace-only: no chunks at all
      (3L, " \t "),
      // 7 tokens: starts 0,2,4 full-ish; start 6 has 1 token <= 2 ->
      // dropped; start 4 keeps 3 tokens (> overlap, partial tail OK)
      (4L, "p q r s t u v")
    ).toDF("doc_id", "text")
    val out = Packing.chunkByTokens(docs, "text", maxTokens = 4,
        overlap = 2)
      .select($"doc_id", $"chunk_index", $"chunk_tokens", $"chunk_text")
      .as[(Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2))
    assert(out.filter(_._1 == 3L).isEmpty, "blank doc must yield none")
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 3L, "x y z")))
    assert(out.filter(_._1 == 1L).toSeq == Seq(
      (1L, 0L, 4L, "a b c d"), (1L, 1L, 4L, "c d e f"),
      (1L, 2L, 4L, "e f g h"), (1L, 3L, 4L, "g h i j")))
    assert(out.filter(_._1 == 4L).toSeq == Seq(
      (4L, 0L, 4L, "p q r s"), (4L, 1L, 4L, "r s t u"),
      (4L, 2L, 3L, "t u v")))
  }

  test("chunkByTokens with zero overlap tiles the token stream " +
      "exactly and conserves tokens") {
    val docs = Graft.table(spark, sf, "documents")
    val chunks = Packing.chunkByTokens(docs, "text", maxTokens = 16)
      .groupBy($"doc_id")
      .agg(sum($"chunk_tokens").as("tok"),
        count(lit(1)).as("n"),
        max($"chunk_index").as("maxIdx"))
      .as[(Long, Long, Long, Long)].collect()
    val expected = docs.select($"doc_id",
        size(graft.operators.TextAnalysis.tokenize($"text")).cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(chunks.nonEmpty)
    chunks.foreach { case (id, tok, n, maxIdx) =>
      assert(tok == expected(id),
        s"doc $id: zero-overlap chunks must conserve tokens")
      assert(maxIdx == n - 1, s"doc $id: chunk_index must be contiguous")
      assert(n == (expected(id) + 15) / 16, s"doc $id: chunk count")
    }
  }

  test("balancedShards: serpentine over the global (weight desc, id) " +
      "rank; histogram path equals brute-force ranking") {
    val rnd = new scala.util.Random(42)
    val rows = (1L to 500L).map(i => (i, 1L + rnd.nextInt(1000).toLong))
    val df = rows.toDF("id", "w").repartition(13)
    val ns = 8
    val got = Packing.balancedShards(df, "id", $"w", ns)
      .select($"id", $"w", $"shard").as[(Long, Long, Long)]
      .collect().sortBy(_._1)

    // brute-force reference: global sort + serpentine
    val ranked = rows.sortBy { case (id, w) => (-w, id) }.zipWithIndex
    val want = ranked.map { case ((id, w), idx) =>
      val pos = idx % ns
      (id, w,
        (if ((idx / ns) % 2 == 0) pos else ns - 1 - pos).toLong)
    }.sortBy(_._1)
    assert(got.toSeq == want)

    // balance: serpentine on descending weights keeps shard totals
    // within one max weight of each other on this fixture
    val totals = got.groupBy(_._3).map { case (_, xs) =>
      xs.map(_._2).sum }
    assert(totals.size == ns)
    assert(totals.max - totals.min <= rows.map(_._2).max,
      s"imbalance ${totals.max - totals.min}")
  }

  test("balancedShards: constant weights (the packed-chunk shape) " +
      "stay correct AND parallel — the adversarial skew fixture") {
    // every row shares ONE weight value: a within-weight-only window
    // would rank all 5000 rows in a single task. The two-level rank
    // must (a) still equal the brute-force global order and (b) show
    // the id-bucket in its ranking window's partition spec.
    val n = 5000
    val ns = 8
    val df = (1L to n.toLong).map(i => (i, 2048L)).toDF("id", "w")
      .repartition(13)
    val got = Packing.balancedShards(df, "id", $"w", ns)
    val plan = got.queryExecution.optimizedPlan.toString
    assert(plan.contains("windowspecdefinition(__w"),
      "ranking window must exist")
    assert(plan.contains("__b"),
      "ranking window must partition by the id-bucket, not weight " +
        "alone — constant weights would serialize the corpus " +
        "through one task")
    val rows = got.select($"id", $"shard").as[(Long, Long)]
      .collect().sortBy(_._1)
    // constant weight ⇒ rank order is plain id order
    val want = (1L to n.toLong).map { id =>
      val idx = id - 1
      val pos = idx % ns
      (id, if ((idx / ns) % 2 == 0) pos else ns - 1 - pos)
    }
    assert(rows.toSeq == want)
    // bucket really split the weight class: >1 distinct group ran
    val nGroups = Packing.balancedShards(df, "id", $"w", ns, idBuckets = 16)
      .select($"id").count()
    assert(nGroups == n)
  }

  test("balancedShards: string ids bucket by prefix and preserve " +
      "lexicographic rank; explicit idBuckets respected") {
    val df = Seq("d09", "d10", "d02", "e01", "a77")
      .map(id => (id, 7L)).toDF("id", "w")
    val got = Packing.balancedShards(df, "id", $"w", 2, idBuckets = 4)
      .select($"id", $"shard").as[(String, Long)].collect().toMap
    // rank order (w constant): a77, d02, d09, d10, e01
    // serpentine ns=2: idx 0→0, 1→1, 2(block1 rev)→1, 3→0, 4→0
    assert(got == Map("a77" -> 0L, "d02" -> 1L, "d09" -> 1L,
      "d10" -> 0L, "e01" -> 0L))
  }

  test("balancedShards: null or negative weight raises instead of " +
      "silently dropping the row") {
    val bad = Seq((1L, java.lang.Long.valueOf(3L)),
      (2L, null.asInstanceOf[java.lang.Long])).toDF("id", "w")
    val e = intercept[Exception] {
      Packing.balancedShards(bad, "id", $"w", 2).collect()
    }
    assert(e.getMessage != null)
    val neg = Seq((1L, 3L), (2L, -1L)).toDF("id", "w")
    intercept[Exception] {
      Packing.balancedShards(neg, "id", $"w", 2).collect()
    }
  }

  test("balancedShards: duplicate weights rank by id; shard dtype " +
      "long; numShards=1 degenerates to all-zero") {
    val df = Seq((3L, 10L), (1L, 10L), (2L, 10L), (4L, 5L))
      .toDF("id", "w")
    val got = Packing.balancedShards(df, "id", $"w", 3)
      .select($"id", $"shard").as[(Long, Long)].collect().toMap
    // rank order: ids 1,2,3 (w=10, id asc), then 4 (w=5).
    // serpentine: block 0 → 0,1,2; block 1 reversed → 2
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 2L))
    val one = Packing.balancedShards(df, "id", $"w", 1)
      .select($"shard").as[Long].collect()
    assert(one.toSeq == Seq.fill(4)(0L))
    intercept[IllegalArgumentException] {
      Packing.balancedShards(df, "id", $"w", 0)
    }
  }

  test("chunkByTokens rejects degenerate windows") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Packing.chunkByTokens(docs, "text", maxTokens = 0)
    }
    intercept[IllegalArgumentException] {
      Packing.chunkByTokens(docs, "text", maxTokens = 4, overlap = 4)
    }
  }
}
