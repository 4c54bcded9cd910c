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
}
