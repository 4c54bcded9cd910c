package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for 100TB-scale corpora.
  *
  * Scale design notes:
  *  - exact dedup = one hash-shuffle on a 16-byte digest (never on the
  *    full text) — the shuffle payload is (digest, id), not documents;
  *  - MinHash LSH: candidate generation is an equi-join on
  *    (band_index, band_hash) — a plain shuffled hash join Catalyst
  *    can plan, with AQE skew-splitting absorbing hot buckets; the
  *    quadratic blow-up is confined to within-bucket pairs;
  *  - SimHash: 64-bit signature, banded into 4×16-bit keys —
  *    pigeonhole guarantees hamming≤3 pairs collide on ≥1 band;
  *  - verification (exact Jaccard / hamming) runs only on candidate
  *    pairs, after `dropDuplicates` on the pair key.
  */
object Dedup {

  import TextAnalysis.tokenize

  /** Distinct word n-gram shingles; a document shorter than n tokens
    * contributes its whole text as one shingle.
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = tokenize(text)
    when(size(toks) < n, array(array_join(toks, " ")))
      .otherwise(array_distinct(
        transform(sequence(lit(0), size(toks) - n),
          i => array_join(slice(toks, i + 1, lit(n)), " "))))
  }

  /** Exact Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Exact-duplicate groups by content hash: one row per distinct
    * content, with the surviving (minimum) id and group size.
    */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_dups"))

  /** Keep-first exact dedup: rows whose id is the keeper of its
    * content-hash group. Implemented as a min-by aggregation (single
    * shuffle on the digest), not a window, so partial aggregation
    * applies map-side.
    */
  def dropExactDuplicates(df: DataFrame, textCol: String,
                          idCol: String): DataFrame = {
    val keepers = exactGroups(df, textCol, idCol)
      .select(col("keeper_id").as(idCol))
    df.join(keepers, idCol)
  }

  /** MinHash signature: k minimums of seeded xxhash64 over shingles.
    * Pure codegen (transform + array_min), no UDF.
    */
  def minhashSignature(shingleCol: Column, k: Int = 16): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shingleCol, s => xxhash64(s, i))))

  /** LSH band keys from a MinHash signature: `bands` hashes, each over
    * a contiguous `k/bands`-row slice of the signature. Two docs with
    * Jaccard j collide on ≥1 band with p = 1-(1-j^r)^b.
    */
  def lshBandKeys(sigCol: Column, bands: Int = 4, rows: Int = 4): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(slice(sigCol, b * rows + lit(1), lit(rows)), b))

  /** MinHash-LSH near-duplicate pairs, verified with exact Jaccard.
    *
    * @return (idCol_1, idCol_2, jaccard) for candidate pairs whose
    *         exact n-gram Jaccard ≥ threshold, idCol_1 < idCol_2.
    */
  def minhashNearDupPairs(df: DataFrame, textCol: String, idCol: String,
                          shingleN: Int = 3, numHashes: Int = 16,
                          bands: Int = 8, threshold: Double = 0.5)
      : DataFrame = {
    val rows = numHashes / bands
    val withSig = df
      .select(col(idCol), shingles(col(textCol), shingleN).as("__sh"))
      .withColumn("__bands",
        lshBandKeys(minhashSignature(col("__sh"), numHashes), bands, rows))
    val exploded = withSig.select(col(idCol), col("__sh"),
      posexplode(col("__bands")).as(Seq("__band_idx", "__band_hash")))
    val l = exploded.select(col(idCol).as("id1"), col("__sh").as("sh1"),
      col("__band_idx"), col("__band_hash"))
    val r = exploded.select(col(idCol).as("id2"), col("__sh").as("sh2"),
      col("__band_idx"), col("__band_hash"))
    l.join(r, Seq("__band_idx", "__band_hash"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), col("sh1"), col("sh2"))
      .dropDuplicates("id1", "id2")
      .withColumn("jaccard", jaccard(col("sh1"), col("sh2")))
      .filter(col("jaccard") >= threshold)
      .select(col("id1").as(s"${idCol}_1"), col("id2").as(s"${idCol}_2"),
        col("jaccard"))
  }

  /** Exact all-pairs n-gram Jaccard within a blocking column — the
    * oracle-checkable (and skew-prone: block sizes must stay modest)
    * variant of near-dup detection.
    */
  def jaccardPairsWithinBlock(df: DataFrame, textCol: String, idCol: String,
                              blockCol: String, shingleN: Int = 3,
                              threshold: Double = 0.4): DataFrame = {
    val base = df.select(col(blockCol), col(idCol),
      shingles(col(textCol), shingleN).as("__sh"))
    val l = base.select(col(blockCol), col(idCol).as("id1"),
      col("__sh").as("sh1"))
    val r = base.select(col(blockCol), col(idCol).as("id2"),
      col("__sh").as("sh2"))
    l.join(r, Seq(blockCol))
      .filter(col("id1") < col("id2"))
      .withColumn("jaccard", jaccard(col("sh1"), col("sh2")))
      .filter(col("jaccard") >= threshold)
      .select(col("id1").as(s"${idCol}_1"), col("id2").as(s"${idCol}_2"),
        col("jaccard"))
  }

  /** SimHash near-dup pairs: 64-bit signatures banded into 4×16-bit
    * keys (hamming≤3 ⇒ ≥1 band equal), verified with bit_count(xor).
    */
  def simhashNearDupPairs(df: DataFrame, textCol: String, idCol: String,
                          maxHamming: Int = 3): DataFrame = {
    val sig = graft.functions.simhash64(tokenize(col(textCol)))
    val withBands = df.select(col(idCol), sig.as("__sig"))
      .withColumn("__bands", array((0 until 4).map(b =>
        shiftrightunsigned(col("__sig"), b * 16)
          .bitwiseAND(lit(0xFFFFL))): _*))
    val exploded = withBands.select(col(idCol), col("__sig"),
      posexplode(col("__bands")).as(Seq("__band_idx", "__band_key")))
    val l = exploded.select(col(idCol).as("id1"), col("__sig").as("sig1"),
      col("__band_idx"), col("__band_key"))
    val r = exploded.select(col(idCol).as("id2"), col("__sig").as("sig2"),
      col("__band_idx"), col("__band_key"))
    l.join(r, Seq("__band_idx", "__band_key"))
      .filter(col("id1") < col("id2"))
      .dropDuplicates("id1", "id2")
      .withColumn("hamming", bit_count(col("sig1").bitwiseXOR(col("sig2"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id1").as(s"${idCol}_1"), col("id2").as(s"${idCol}_2"),
        col("hamming"))
  }

  /** Embedding-cosine near-dup pairs within a blocking column (e.g. a
    * cluster/label/LSH bucket — at 100TB you never do global all-pairs).
    * Cosine computed in double (graft.functions.cosine_similarity).
    */
  def embeddingNearDupPairs(df: DataFrame, embCol: String, idCol: String,
                            blockCol: String, threshold: Double = 0.9)
      : DataFrame = {
    val base = df.select(col(blockCol), col(idCol), col(embCol))
    val l = base.select(col(blockCol), col(idCol).as("id1"),
      col(embCol).as("e1"))
    val r = base.select(col(blockCol), col(idCol).as("id2"),
      col(embCol).as("e2"))
    l.join(r, Seq(blockCol))
      .filter(col("id1") < col("id2"))
      .withColumn("cos",
        round(graft.functions.cosine_similarity(col("e1"), col("e2")), 6))
      .filter(col("cos") >= threshold)
      .select(col("id1").as(s"${idCol}_1"), col("id2").as(s"${idCol}_2"),
        col("cos"))
  }
}
