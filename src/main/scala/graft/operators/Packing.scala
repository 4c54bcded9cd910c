package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sequence packing for training-data pipelines:
  * GPT-style concatenate-then-chunk. Documents are laid end-to-end in
  * a deterministic order and the resulting token stream is cut into
  * fixed-capacity chunks; a document knows which chunk its first token
  * lands in and at what offset (documents may straddle chunk
  * boundaries — that is the concat-and-chunk contract, which wastes
  * zero tokens on padding).
  *
  * Scale design: a single global concatenation order would serialize a
  * 100TB corpus through one sorted partition, so the stream is SHARDED
  * by a deterministic md5 prefix of the id — each shard's layout is an
  * independent window over its own rows (one shuffle, #shards-way
  * parallel), and adding shards never changes a document's placement
  * within its shard. All arithmetic is integer (exact in any engine),
  * and the shard key is a hex prefix string, so an external system or
  * the DuckDB oracle reproduces the identical layout.
  */
object Packing {

  /** Default salt domain for shard keys — distinct from every
    * Sampling salt, so packing after sampling/splitting fills ALL
    * shards (an un-salted shard key would be a PREFIX of the sampling
    * draw: `hashSample(0.2)` would populate only shards 0–3 of 16).
    */
  val ShardSalt = "shard"

  /** Deterministic shard key: first `chars` hex chars of
    * md5(id || 'NUL' || salt) — 16^chars shards as plain strings
    * (no hex→int conversion, which not every engine spells the same
    * way). The NUL delimiter keeps the (id, salt) encoding injective,
    * same as [[Sampling.hashBucket]]; the same migration rule applies:
    * layouts persisted under an older (un-salted or un-delimited) draw
    * must be regenerated wholesale, never mixed.
    */
  def shardKey(idCol: Column, chars: Int = 1,
               salt: String = ShardSalt): Column =
    substring(md5(concat(idCol.cast("string"), lit("\u0000"), lit(salt))),
      1, chars)

  /** JVM-side mirror of [[shardKey]] (same NUL-delimited UTF-8 md5
    * draw) for driver-side planning and tests.
    */
  def shardKeyValue(id: String, chars: Int = 1,
                    salt: String = ShardSalt): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest((id + "\u0000" + salt).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, chars)

  /** Chunk layout for each document: within its shard (documents
    * ordered by id), `start` = first-token position in the shard's
    * concatenated stream, `chunk` = index of the capacity-sized chunk
    * holding that token, `offset` = position inside that chunk, and
    * `chunks_spanned` = how many chunks the document touches.
    *
    * SIZING `shardChars`: layout parallelism is exactly 16^shardChars
    * (the window prefix-sum runs one task per shard) and each shard's
    * stream holds ~totalTokens/16^shardChars tokens. Pick the smallest
    * value giving (a) shard count ≥ 2–4× total cluster cores and
    * (b) per-shard rows that sort inside one task's memory budget.
    * The default 1 (16 shards) suits LOCAL/TEST scales ONLY — a 100 TB
    * corpus on a 1000-executor cluster wants 4–5 (65k–1M shards).
    * Changing shardChars is a RE-LAYOUT: shard keys refine by prefix
    * (a doc's 2-char shard string extends its 1-char one) and
    * within-shard id order is preserved, but start/chunk positions are
    * relative to the shard universe — regenerate persisted layouts
    * wholesale when changing it, never mix (the same migration rule as
    * the salted-draw changes, [[Sampling.hashBucket]]).
    *
    * CONTRACT: `idCol` must be unique (it is the layout's sort key).
    * With duplicate ids the prefix-sum positions of the tied rows are
    * tie-broken arbitrarily, so two runs — or Spark vs an external
    * reader of the layout — may assign the duplicates' `start` values
    * to each other: the tiling stays valid and gap-free, but the
    * reproducible-layout guarantee no longer holds row-for-row.
    * Dedup first (graft.operators.Dedup) or pack a synthetic unique
    * key.
    *
    * Output: input columns ++ (shard, start, chunk, offset,
    * chunks_spanned).
    */
  /** Context-window chunking: split each document's whitespace-token
    * stream into windows of `maxTokens` tokens advancing by
    * `maxTokens - overlap` (the last `overlap` tokens of a chunk
    * reappear as the head of the next — the standard sliding-context
    * shape for long-document training/eval sets). Complements
    * [[packChunks]]: that lays WHOLE documents end-to-end into shards;
    * this SPLITS a long document into model-window pieces first.
    *
    * Chunk rule, exactly: token starts are 0, stride, 2·stride, … while
    * < nTokens, and a non-first chunk is kept only when it has MORE
    * than `overlap` tokens — a shorter tail is a pure suffix of the
    * previous chunk (its tokens are all repeats) and is dropped, so
    * chunk indexes stay contiguous and no chunk duplicates another.
    * Documents whose text is empty/whitespace-only yield no chunks.
    * Tokenization is [[TextAnalysis.tokenize]] (explicit Java-\s class;
    * the oracle splits with the RE2 spelling of the same class), and
    * `chunk_text` rejoins tokens with single spaces — runs of
    * whitespace do not round-trip, by design.
    *
    * Scale: stateless per-row explode — no shuffle, no state; streams
    * as-is (the fluent bridge accepts streaming frames). Fan-out is
    * ~nTokens/stride rows per document; at 100 TB keep `overlap` well
    * under `maxTokens` so the token-duplication factor
    * maxTokens/stride stays near 1.
    *
    * Output: input columns ++ (chunk_index, chunk_tokens, chunk_text),
    * both counters BIGINT for cross-engine layout parity.
    */
  def chunkByTokens(df: DataFrame, textCol: String, maxTokens: Int,
                    overlap: Int = 0): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    require(overlap >= 0 && overlap < maxTokens,
      "overlap must be in [0, maxTokens)")
    val stride = maxTokens - overlap
    df.filter(trim(col(textCol), TextAnalysis.WsChars) =!= "")
      .withColumn("__tk", TextAnalysis.tokenize(col(textCol)))
      .withColumn("__n", size(col("__tk")).cast("long"))
      .select(col("*"),
        posexplode(sequence(lit(0L), col("__n") - 1, lit(stride.toLong)))
          .as(Seq("chunk_index", "__start")))
      .withColumn("chunk_index", col("chunk_index").cast("long"))
      .withColumn("chunk_tokens",
        least(col("__start") + maxTokens, col("__n")) - col("__start"))
      // only the final start can fall at or under `overlap` tokens —
      // every earlier chunk is full — so this filter never creates
      // gaps in chunk_index
      .filter(col("__start") === 0 || col("chunk_tokens") > overlap)
      .withColumn("chunk_text",
        concat_ws(" ", slice(col("__tk"),
          (col("__start") + 1).cast("int"), lit(maxTokens))))
      .drop("__tk", "__n", "__start")
  }

  /** Token-balanced assignment of documents to a fixed number of
    * training shards — the "cut the curated corpus into N equal-work
    * output files" step that follows curation and precedes writing.
    * Hash sharding ([[shardKey]]) balances COUNTS; this balances the
    * shard token TOTALS, which is what makes data-parallel epochs
    * finish together when shards map to workers.
    *
    * Rule (closed-form, engine-replayable): rank documents by
    * (weight desc, id asc), then deal ranks serpentine across shards
    * (block k of `numShards` ranks runs left-to-right when k is even,
    * right-to-left when odd). Serpentine on a descending-weight order
    * is the classic snake seeding: each full block contributes one
    * document per shard with the block's spread partially cancelled
    * by the alternation, so shard totals track the ideal within a
    * few max-weights — near-LPT balance without LPT's sequential
    * "place into currently-lightest" state, which no closed-form SQL
    * replay could express.
    *
    * Scale: the global rank is NOT a global-window sort. A histogram
    * of (weight, id-bucket) groups carries cross-group prefix counts
    * through one tiny window, and data rows take a partitioned
    * within-group `row_number` plus the broadcast base offset — the
    * [[Sampling.selectToTokenBudget]] histogram discipline. The
    * id-bucket is a MONOTONE coarsening of the id (numeric ids:
    * equal-width ranges between the corpus min/max, carried by a
    * broadcast one-row stats frame; string ids: a fixed-length
    * prefix), so ordering by (weight desc, bucket asc, id asc) IS the
    * documented (weight desc, id asc) order — the bucket only splits
    * each weight class into independently-rankable runs. This is what
    * keeps the operator parallel on its PRIMARY production input,
    * packed-chunk corpora where nearly every row's weight equals the
    * token cap: a within-weight-only window would rank the whole
    * corpus in ONE task. Histogram size is bounded by
    * distinct(weight) × idBuckets (and by the row count); with
    * token-count weights that stays a broadcastable side even at
    * thousands of buckets.
    *
    * CONTRACT: ids unique and non-null (the rank tie-break), weights
    * non-negative longs — a null or negative weight (including a
    * failed cast) raises rather than silently dropping the row.
    * Output: input columns ++ (`shard` BIGINT in [0, numShards)).
    *
    * @param idBuckets within-weight parallelism; 0 (default) = the
    *   session's shuffle parallelism. At cluster scale set it to a
    *   few × total cores (same sizing rule as [[packChunks]]'s
    *   shardChars) — it changes only the execution layout, never the
    *   assignment.
    */
  def balancedShards(df: DataFrame, idCol: String, weightCol: Column,
                     numShards: Int, idBuckets: Int = 0): DataFrame = {
    require(numShards >= 1, "numShards must be >= 1")
    require(idBuckets >= 0, "idBuckets must be >= 0")
    val nb = if (idBuckets > 0) idBuckets
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val idc = col(idCol)
    // the guard's condition captures null ITSELF (isNull || <0):
    // `__w < 0` alone is null-valued on null input and `when` treats
    // that as false, which would wave the bad row through to the
    // null-key join below — the silent-data-loss path this guard
    // exists to close
    val wv = df.withColumn("__w",
      when(weightCol.cast("long").isNull || weightCol.cast("long") < 0,
        raise_error(concat(
          lit("balancedShards: weight must be a non-negative long, " +
            "got "),
          coalesce(weightCol.cast("string"), lit("null")))))
        .otherwise(weightCol.cast("long")))
    // monotone id-bucket: any expression b(id) with id1 < id2 ⇒
    // b(id1) <= b(id2) under the column's native ordering keeps the
    // two-level rank equal to the single-level one
    val bucketed = df.schema(idCol).dataType match {
      case _: org.apache.spark.sql.types.NumericType =>
        // double arithmetic is fine HERE (unlike packChunks' token
        // positions): floor((id-lo)/width) only needs monotonicity,
        // which IEEE rounding preserves, not exactness
        val stats = df.agg(min(idc).cast("double").as("__lo"),
          max(idc).cast("double").as("__hi"))
        wv.crossJoin(broadcast(stats))
          .withColumn("__b", least(lit(nb - 1L), greatest(lit(0L),
            floor((idc.cast("double") - col("__lo"))
              / ((col("__hi") - col("__lo") + 1.0) / nb)))))
          .drop("__lo", "__hi")
      case _: org.apache.spark.sql.types.StringType =>
        // codepoint prefix is monotone under UTF8 binary order; 6
        // chars of a real-world id (uuid/url/hash) spread far past
        // any practical bucket target
        wv.withColumn("__b", substring(idc, 1, 6))
      case _ =>
        // no generic monotone coarsening — single bucket degrades to
        // the within-weight-only rank (fine for high-cardinality
        // weights, the only shape such exotic-id corpora have shown)
        wv.withColumn("__b", lit(0L))
    }
    val histW = Window.orderBy(col("__w").desc, col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col("__w"), col("__b"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__base", coalesce(sum(col("__c")).over(histW),
        lit(0L)))
      .drop("__c")
    val within = Window.partitionBy(col("__w"), col("__b"))
      .orderBy(idc.asc)
    bucketed.join(broadcast(offsets), Seq("__w", "__b"))
      .withColumn("__idx",
        col("__base") + row_number().over(within).cast("long") - 1)
      .withColumn("shard",
        when(expr(s"(__idx div $numShards) % 2") === 0,
          col("__idx") % numShards)
          .otherwise(lit(numShards - 1L) - col("__idx") % numShards))
      .drop("__w", "__b", "__base", "__idx")
  }

  def packChunks(df: DataFrame, idCol: String, tokenCol: String,
                 capacity: Long, shardChars: Int = 1,
                 salt: String = ShardSalt): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    require(shardChars >= 1 && shardChars <= 8,
      "shardChars must be in [1, 8]")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // integer `div`, not floor(x / c): double division silently loses
    // exactness past 2^53 total tokens — a range a 100TB stream reaches
    df.withColumn("shard", shardKey(col(idCol), shardChars, salt))
      .withColumn("start",
        sum(col(tokenCol)).over(w) - col(tokenCol))
      .withColumn("chunk", expr(s"start div $capacity"))
      .withColumn("offset", col("start") % capacity)
      // a zero-token document occupies no chunk — defined explicitly,
      // because the general formula's dividend goes NEGATIVE for
      // tok=0 at start=0 and `div` (truncating) vs `//` (flooring)
      // then disagree across engines
      .withColumn("chunks_spanned",
        when(col(tokenCol) <= 0, lit(0L))
          .otherwise(expr(s"(start + $tokenCol - 1) div $capacity")
            - col("chunk") + 1))
  }
}
