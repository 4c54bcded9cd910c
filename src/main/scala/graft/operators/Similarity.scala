package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Scale design:
  *  - brute force = broadcast the (small) query set, score every
  *    corpus row, per-query top-k via window rank — one shuffle on
  *    query_id, corpus scan stays embarrassingly parallel;
  *  - LSH path = sign-random-projection bucket both sides, equi-join
  *    on bucket (multi-probe: the query also probes all 1-bit-flip
  *    neighbors of its bucket), exact re-rank within candidates. At
  *    100TB the bucket join replaces the full cross product; recall
  *    is tunable via nPlanes/probes.
  */
object Similarity {

  /** Per-query top-k with TWO-LEVEL ranking — the per-key-rank skew
    * discipline: a plain `Window.partitionBy(query_id)` puts every
    * scored row for a query in ONE task, so few queries over a big
    * corpus serialize the sort. Level 1 ranks within (query,
    * hash-bucket of neighbor) — shuffle-parallelism× more tasks —
    * and the global top-k is provably a subset of the union of
    * per-bucket top-ks; level 2 ranks only B·k rows per query.
    * Ties break by neighbor_id at both levels; output is identical
    * to the single-window spelling.
    */
  private def rankPerQuery(scored: DataFrame, order: Seq[Column],
                           k: Int): DataFrame = {
    val nB = scored.sparkSession.sessionState.conf.numShufflePartitions
    val bw = Window.partitionBy(col("query_id"),
        pmod(xxhash64(col("neighbor_id")), lit(nB)))
      .orderBy(order: _*)
    val w = Window.partitionBy(col("query_id")).orderBy(order: _*)
    scored.withColumn("__br", row_number().over(bw))
      .filter(col("__br") <= k)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .drop("__br")
  }

  /** Cosine in double; ties broken by id for determinism. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     embCol: String, idCol: String, k: Int,
                     roundTo: Int = 6): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      col(embCol).as("__qe"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(embCol).as("__ce"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos",
        round(graft.functions.cosine_similarity(col("__qe"), col("__ce")),
          roundTo))
    rankPerQuery(scored, Seq(col("cos").desc, col("neighbor_id")), k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** LSH-bucketed ANN: multi-table sign-random-projection. The corpus
    * is indexed into `nTables` independent bucket spaces (nPlanes bits
    * each, distinct seeds); queries probe every bucket within
    * `probeHamming` bit-flips of theirs in every table; candidates are
    * exact-cosine re-ranked.
    * Recall ≈ 1-(1-p)^nTables where p = P(hamming(sig_q,sig_c) ≤
    * probeHamming). Probing widens only the QUERY explosion (e.g.
    * 22 probes/table at nPlanes=6, probeHamming=2) — the corpus index
    * stays nTables× the corpus keys, so recall is bought on the small
    * side of the join, never by rescanning the corpus.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              embCol: String, idCol: String, k: Int,
              nPlanes: Int = 6, dim: Int = 64, nTables: Int = 8,
              probeHamming: Int = 2, seed: Long = 42L): DataFrame = {
    def bucket(t: Int) = graft.functions.hyperplane_lsh_bucket(
      col(embCol), nPlanes, dim, seed + t * 7919L)
    val c = corpus
      .select(col(idCol).as("neighbor_id"), col(embCol).as("__ce"),
        posexplode(array((0 until nTables).map(bucket): _*))
          .as(Seq("__table", "__bucket")))
    // all flip masks with ≤ probeHamming bits over nPlanes bit positions
    val masks = (0 until (1 << nPlanes))
      .filter(m => java.lang.Integer.bitCount(m) <= probeHamming)
    val q = queries
      .select(col(idCol).as("query_id"), col(embCol).as("__qe"),
        posexplode(array((0 until nTables).map(bucket): _*))
          .as(Seq("__table", "__qb")))
      .withColumn("__bucket", explode(array(
        masks.map(m => col("__qb").bitwiseXOR(lit(m))): _*)))
      .drop("__qb")
    val scored = c.join(broadcast(q), Seq("__table", "__bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cos",
        round(graft.functions.cosine_similarity(col("__qe"), col("__ce")), 6))
    rankPerQuery(scored, Seq(col("cos").desc, col("neighbor_id")), k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Thresholded kNN SELF-join — every row gets its up-to-`k` nearest
    * neighbors with cosine ≥ `minCos` — the primitive behind SemDeDup-
    * style semantic dedup, kNN-graph clustering, and
    * retrieval-neighbor augmentation, where the query set IS the
    * corpus and [[bruteForceTopK]]'s broadcast-the-queries shape
    * cannot apply.
    *
    * Built on [[Dedup.embeddingNearDupPairsLsh]]'s banded candidate
    * machinery (multi-table SRP buckets, canonical-table single
    * emission, id-only shuffle — embeddings re-join by id for the
    * exact-cosine verify), then symmetrized (each qualifying pair
    * feeds BOTH endpoints' neighbor lists) and window-ranked per
    * query. Rows with no ≥ `minCos` neighbor are absent from the
    * output, mirroring SQL-join semantics.
    *
    * Scale: one banded self-join + one window on query_id — never a
    * cross product. Recall follows the SRP collision curve (scaladoc
    * on [[Dedup.embeddingNearDupPairsLsh]]); `minCos` is what makes
    * the operator bucketable — an UNthresholded exact kNN join has no
    * sublinear exact algorithm, so the honest exact fallback for
    * small corpora is [[bruteForceTopK]] with queries = corpus.
    */
  def knnJoinLsh(corpus: DataFrame, embCol: String, idCol: String,
                 k: Int, minCos: Double = 0.9, nPlanes: Int = 8,
                 dim: Int = 64, nTables: Int = 4,
                 seed: Long = 42L): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    val pairs = Dedup.embeddingNearDupPairsLsh(corpus, embCol, idCol,
      minCos, nPlanes, dim, nTables, seed)
    val id1 = col(s"${idCol}_1")
    val id2 = col(s"${idCol}_2")
    val sym = pairs
      .select(id1.as("query_id"), id2.as("neighbor_id"), col("cos"))
      .unionByName(pairs
        .select(id2.as("query_id"), id1.as("neighbor_id"), col("cos")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    sym.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("cos"))
  }

  /** Pairwise cosine scoring helper (double accumulation). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.cosine_similarity(a, b)

  /** Symmetric int8 quantization of an embedding: q_i =
    * floor(v_i·127/max|v| + 0.5) ∈ [-127, 127] — 4× smaller storage
    * for ANN candidate stages at 100TB (re-rank on the fp originals).
    * `floor(x + 0.5)` instead of round(): engines disagree on round()'s
    * tie behavior (HALF_UP vs away-from-zero vs banker's), floor is
    * bit-identical everywhere, so the quantized vectors — and the
    * DuckDB oracle — match exactly. All-zero vectors quantize to zeros.
    */
  def quantizeInt8(embCol: Column): Column =
    // let-binding via a 1-element array: the outer transform evaluates
    // vectorMaxAbs ONCE and exposes it as a lambda variable, so the
    // inner per-element lambda reads a bound scalar — O(dim), where
    // referencing the scan expression directly would be O(dim²)
    element_at(transform(array(vectorMaxAbs(embCol)),
      m => quantizeInt8With(embCol, m)), 1)

  /** max|v| of a vector — materialize it ONCE (e.g. `withColumn`)
    * and pass to [[quantizeInt8With]]: referencing it inside the
    * per-element lambda instead re-evaluates the array scan per
    * element (higher-order-function lambdas get no subexpression
    * elimination), turning an O(dim) projection into O(dim²).
    */
  def vectorMaxAbs(embCol: Column): Column =
    array_max(transform(embCol, v => abs(v.cast("double"))))

  /** [[quantizeInt8]] with the row's precomputed max|v| column. */
  def quantizeInt8With(embCol: Column, maxAbsCol: Column): Column =
    transform(embCol, v =>
      when(maxAbsCol === 0.0, lit(0))
        .otherwise(floor(v.cast("double") * 127.0 / maxAbsCol + 0.5))
        .cast("int"))

  /** The per-vector scale that [[quantizeInt8]] divides out:
    * max|v|/127; dequantize ≈ q·scale.
    */
  def quantScale(embCol: Column): Column = vectorMaxAbs(embCol) / 127.0

  /** Embedding sanity/QA projection — the validation gate an
    * embedding corpus must pass BEFORE any ANN/near-dup stage builds
    * on it: per vector, the dimension, the L2 norm, the count of
    * unusable coordinates (null/NaN/±Inf — one bad coordinate
    * poisons every downstream cosine into NaN and silently empties
    * similarity joins), and a zero-norm flag (cosine against a zero
    * vector is undefined; LSH buckets it arbitrarily). Pure codegen
    * projection, zero shuffle — runs as a scan filter at any corpus
    * size; compose with `.filter(!col("is_zero") && col("n_bad") ===
    * 0 && col("dim") === lit(expected))` to quarantine bad rows.
    */
  def embeddingStats(df: DataFrame, embCol: String,
                     idCol: String): DataFrame = {
    val v = col(embCol)
    val d = v.cast("array<double>")
    val bad = (x: Column) => x.isNull || isnan(x) ||
      x === Double.PositiveInfinity || x === Double.NegativeInfinity
    val nBad = aggregate(d, lit(0L),
      (acc, x) => acc + when(bad(x), 1L).otherwise(0L))
    // norm over the USABLE coordinates, so one NaN doesn't erase the
    // whole diagnostic row
    val norm = sqrt(aggregate(d, lit(0.0),
      (acc, x) => acc + when(bad(x), 0.0).otherwise(x * x)))
    df.select(col(idCol), size(v).cast("long").as("dim"),
      round(norm, 6).as("l2_norm"), nBad.as("n_bad"),
      (norm < 1e-12).as("is_zero"))
  }

  /** IVF ANN: k-means-partitioned index. Fit assigns every corpus
    * vector to one of `nCentroids` cells; a query probes its `nProbe`
    * nearest cells and exact-cosine re-ranks only those vectors.
    *
    * Scale notes: the KMeans fit is the only non-streaming-parallel
    * step — at 100TB set `fitSampleFraction` so the iterative fit runs
    * over a sample (MLlib KMeans distributes each pass, but every
    * iteration re-scans its input; centroid QUALITY needs only a
    * representative sample). Assignment always runs over the FULL
    * corpus, so no vector can drop out of the index. The probe join is
    * an equi-join on centroid id, candidates ≈ corpus·nProbe/nCentroids
    * per query.
    *
    * @param fitSampleFraction fraction of the corpus the KMeans fit
    *        sees (1.0 = full corpus). Affects centroid placement (cell
    *        balance) only — with full probing the result set is
    *        invariant to it, and partial-probe recall degrades
    *        gracefully (PipelineSpec covers a 0.5 sampled fit).
    */
  /** The fit half of [[ivfTopK]] as a standalone step: KMeans cells
    * over the corpus → (centroid table, per-row cell assignments).
    * This IS the persistable ANN index ([[DedupIndex.writeIvf]]):
    * at 100 TB the corpus embedding table changes far less often
    * than queries arrive, so the cluster fit — the only iterative,
    * full-corpus pass — should run once per corpus drop, with every
    * query batch paying just the broadcast-probe join. Persisting
    * also FREEZES the fit: query results stop depending on KMeans'
    * run-to-run partitioning sensitivity.
    *
    * @return (centroids: (__cell, __centroid), indexed:
    *         (neighbor_id, __ce, __cell))
    */
  def fitIvfIndex(corpus: DataFrame, embCol: String, idCol: String,
                  nCentroids: Int = 16, seed: Long = 42L,
                  maxIter: Int = 20, fitSampleFraction: Double = 1.0,
                  maxFitRows: Int = 16384): (DataFrame, DataFrame) = {
    require(fitSampleFraction > 0.0 && fitSampleFraction <= 1.0,
      "fitSampleFraction must be in (0, 1]")
    require(maxFitRows >= nCentroids, "need maxFitRows >= nCentroids")
    val spark = corpus.sparkSession
    import spark.implicits._

    // Round 16: the MLlib KMeans fit was replaced by the house
    // deterministic Lloyd's over a bounded hash-smallest sample (the
    // fitOpqRotation discipline). MLlib's k-means|| init alone ran
    // ~10 scheduler round-trips and its centroids depended on the
    // input PARTITIONING (per-partition seeded sampling); this fit is
    // ONE bounded TakeOrdered job + driver-side d×k work, and the
    // centroids depend only on the data and the seed. Centroid
    // placement affects cell balance / partial-probe recall only —
    // full-probe results are invariant (spec-pinned), and the
    // partial-probe recall floor spec re-passes. Init = nCentroids
    // hash-smallest distinct sample vectors; empty cells keep their
    // previous centroid; ≤ maxIter passes with an assignments-stable
    // early stop.
    val sampleBase = graft.Graft.spread(corpus)
      .select(col(embCol).cast("array<double>").as("__cv"))
    // secondary sort key = the vector itself: two distinct vectors
    // colliding in xxhash64 at the window boundary would otherwise
    // make the sample partition-order-dependent (round 17; ~2^-64
    // per pair, but determinism should not carry an asterisk)
    val sampled = (if (fitSampleFraction >= 1.0) sampleBase
                   else sampleBase.sample(withReplacement = false,
                     fitSampleFraction, seed))
      .orderBy(xxhash64(col("__cv"), lit(seed)), col("__cv"))
      .limit(maxFitRows)
      .collect() // bounded artifact: ≤ maxFitRows × dim doubles
      .map(_.getSeq[Double](0).toArray)
    // duplicate-heavy corpora (the dedup-workload norm) can fill the
    // hash-smallest window with copies of a few vectors, leaving
    // fewer than nCentroids DISTINCT seeds where the full corpus has
    // plenty — fall back to a distinct-vector window (one extra
    // bounded job, degenerate inputs only; round 17, preserving the
    // pre-sampling fit's full-corpus distinctness semantics)
    val sample = {
      val distinctCount = sampled.map(_.toSeq).distinct.length
      if (sampled.nonEmpty && distinctCount < nCentroids)
        sampleBase.distinct()
          .orderBy(xxhash64(col("__cv"), lit(seed)), col("__cv"))
          .limit(maxFitRows)
          .collect()
          .map(_.getSeq[Double](0).toArray)
      else sampled
    }
    require(sample.nonEmpty, "fitIvfIndex: empty corpus")
    val dim = sample.head.length
    require(sample.forall(_.length == dim),
      "fitIvfIndex: ragged embedding dimensions")
    val distinct = sample.map(_.toSeq).distinct.map(_.toArray)
    require(distinct.length >= nCentroids,
      s"fitIvfIndex: ${distinct.length} distinct sample vectors < " +
        s"nCentroids=$nCentroids — lower nCentroids")
    // the sample is already in ascending hash order (the TakeOrdered
    // key), so the first nCentroids distinct rows ARE the
    // hash-smallest distinct seeds
    val cents = Array.tabulate(nCentroids)(c => distinct(c).clone())
    var it = 0
    var stable = false
    var prevAssign: Array[Int] = null
    while (it < maxIter && !stable) {
      val assign = sample.map { v =>
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < nCentroids) {
          val cent = cents(c)
          var d = 0.0
          var i = 0
          while (i < dim) { val t = v(i) - cent(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        best
      }
      if (prevAssign != null &&
        java.util.Arrays.equals(assign, prevAssign)) stable = true
      else {
        prevAssign = assign
        val sums = Array.ofDim[Double](nCentroids, dim)
        val counts = new Array[Long](nCentroids)
        var i = 0
        while (i < sample.length) {
          val c = assign(i)
          counts(c) += 1
          var j = 0
          while (j < dim) { sums(c)(j) += sample(i)(j); j += 1 }
          i += 1
        }
        var c = 0
        while (c < nCentroids) {
          if (counts(c) > 0)
            cents(c) = Array.tabulate(dim)(j => sums(c)(j) / counts(c))
          c += 1
        }
        it += 1
      }
    }
    // assignment always runs over the FULL corpus (no vector can drop
    // out of the index): one nearest-centroid argmin per row via the
    // native pq_assign with the whole vector as the single subspace
    val cb = Array(cents.map(_.clone()))
    val indexed = corpus.select(col(idCol).as("neighbor_id"),
        col(embCol).as("__ce"))
      .withColumn("__cell", element_at(graft.functions.pq_assign(
        col("__ce"), cb, normalize = false), 1))
    val centroids = cents.zipWithIndex
      .map { case (v, i) => (i, v.toSeq) }.toSeq
      .toDF("__cell", "__centroid")
    (centroids, indexed)
  }

  /** The query half of [[ivfTopK]] against a prebuilt (or persisted)
    * index: probe the nProbe L2-nearest cells per query, exact
    * cosine within the probed cells.
    *
    * Query-batch regimes (the [[pqTopKFromIndex]] discipline): the
    * broadcast spelling ships |Q|·nProbe probe rows — each carrying
    * the full query embedding — through the driver, which a
    * million-query batch would blow. Above `broadcastMaxQueries`
    * (one column-pruned count decides) the probe join switches to a
    * SALTED shuffle join: a plain shuffled join on `__cell` would
    * land the whole corpus in ≤ nCentroids tasks (the join key has
    * only nCentroids distinct values — textbook key-cardinality
    * skew), so the corpus side salts on hash(neighbor_id) mod S and
    * the probe side replicates each (query_id, __cell) row across
    * all S salts — nCentroids·S-way parallelism, with only 2-long
    * probe rows replicated (the query embeddings join back by
    * query_id on the already-shuffled candidate set, never through
    * the driver). Output is identical in both regimes (spec-pinned).
    * The salt factor is min(shufflePartitions, [[MaxSaltFactor]]):
    * probe-side replication is ×S, and parallelism saturates around
    * nCentroids·64 long before a production cluster's S=2000+ —
    * uncapped, a big cluster would pay |Q|·nProbe·2000 replicated
    * probe rows for no additional win.
    *
    * `knownQueryCount`: the regime decision needs |Q|; by default it
    * runs one column-pruned count() — an EAGER action at plan-
    * construction time that re-executes the query frame's lineage
    * (an expensive upstream query pipeline runs twice: once for the
    * count, once in the probe join). Callers who know |Q| pass it
    * here and skip the action; callers with an expensive DERIVED
    * query frame above the threshold should cache it either way.
    */
  def ivfTopKFromIndex(centroids: DataFrame, indexed: DataFrame,
                       queries: DataFrame, embCol: String,
                       idCol: String, k: Int,
                       nProbe: Int = 4,
                       broadcastMaxQueries: Int = 50000,
                       knownQueryCount: Option[Long] = None): DataFrame = {
    // centroid table is tiny → broadcast; assignment metric is L2,
    // matching KMeans' own cell assignment
    val l2 = (a: Column, b: Column) =>
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__dist"), col("__cell"))
    val probed = queries
      .select(col(idCol).as("query_id"), col(embCol).as("__qe"))
      .crossJoin(broadcast(centroids))
      .withColumn("__dist", l2(col("__qe").cast("array<double>"),
        col("__centroid")))
      .withColumn("__pr", row_number().over(w))
      .filter(col("__pr") <= nProbe)
      .select(col("query_id"), col("__qe"), col("__cell"))

    // column-pruned count (skipped when the caller supplied |Q|):
    // only the id column reaches the scan
    val nQ = knownQueryCount.getOrElse(
      queries.select(col(idCol)).count())
    val matched =
      if (nQ <= broadcastMaxQueries)
        indexed.join(broadcast(probed), Seq("__cell"))
      else {
        val s = math.min(indexed.sparkSession.sessionState.conf
          .numShufflePartitions, MaxSaltFactor)
        val salted = indexed.withColumn("__salt",
          pmod(xxhash64(col("neighbor_id")), lit(s)).cast("int"))
        val probeIds = probed.select(col("query_id"), col("__cell"))
          .withColumn("__salt",
            explode(sequence(lit(0), lit(s - 1))))
        val qe = queries.select(col(idCol).as("query_id"),
          col(embCol).as("__qe"))
        salted.join(probeIds, Seq("__cell", "__salt"))
          .join(qe, Seq("query_id"))
      }
    val scored = matched
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos",
        round(graft.functions.cosine_similarity(col("__qe"), col("__ce")), 6))
    rankPerQuery(scored, Seq(col("cos").desc, col("neighbor_id")), k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              embCol: String, idCol: String, k: Int,
              nCentroids: Int = 16, nProbe: Int = 4,
              seed: Long = 42L, maxIter: Int = 20,
              fitSampleFraction: Double = 1.0,
              broadcastMaxQueries: Int = 50000,
              knownQueryCount: Option[Long] = None): DataFrame = {
    val (centroids, indexed) = fitIvfIndex(corpus, embCol, idCol,
      nCentroids, seed, maxIter, fitSampleFraction)
    ivfTopKFromIndex(centroids, indexed, queries, embCol, idCol, k,
      nProbe, broadcastMaxQueries, knownQueryCount)
  }

  /** Cap on the IVF salted-join salt factor: replication cost on the
    * probe side is ×S while the parallelism win saturates around
    * nCentroids·64 — on a cluster tuned to thousands of shuffle
    * partitions the uncapped spelling would inflate the probe side
    * |Q|·nProbe·S-fold for nothing. 64 × a production nCentroids
    * (≥ 256) ≥ 16k-way parallelism, past any single join's useful
    * task count.
    */
  val MaxSaltFactor: Int = 64

  /** Label-cohesion QA over a LABELED embedding corpus — the
    * training-data question "are my labels consistent in embedding
    * space, and which pairs blur": one row per label with the mean
    * cosine of its members to their OWN label centroid, the mean
    * cosine to each member's best RIVAL centroid, the margin between
    * the two (margin ≤ 0 ⇒ the label's members sit closer to another
    * label than to their own — mislabeled or unlearnable), and the
    * most-frequent nearest-rival label (the confusion direction).
    *
    * Definitions: centroids are per-label SUM vectors (cosine is
    * scale-invariant; one [[graft.expressions.VecSumAgg]] pass) and
    * INCLUDE the member itself (no leave-one-out — exact replay
    * beats estimator subtleties for a QA report; the oracle applies
    * the same definition). Per-row rival = the non-own label whose
    * centroid scores highest (cosine desc, label asc on ties).
    *
    * Scale design: the centroid table is |labels| rows → broadcast;
    * the scored set is |rows|·|labels| — right for the classifier-
    * label shape (tens to thousands of labels); the per-row rival
    * rank partitions by row id (parallelism = |rows|). Rows with a
    * null label or null embedding are excluded (they can't be
    * scored); zero-norm vectors yield null cosines, which the means
    * skip. A corpus with a single label reports null rival/margin
    * columns rather than failing.
    */
  def labelCohesionReport(corpus: DataFrame, embCol: String,
                          idCol: String, labelCol: String): DataFrame = {
    val rows = corpus
      .filter(col(embCol).isNotNull && col(labelCol).isNotNull)
      .select(col(idCol).as("__id"), col(labelCol).as("__rl"),
        col(embCol).as("__e"))
    val cents = rows.groupBy(col("__rl").as("__l"))
      .agg(graft.functions.vec_sum(col("__e")).as("__c"))
    val scored = rows.crossJoin(broadcast(cents))
      .withColumn("__cos",
        graft.functions.cosine_similarity(col("__e"), col("__c")))
    val own = scored.filter(col("__rl") === col("__l"))
      .select(col("__id"), col("__rl"), col("__cos").as("__own"))
    val w = Window.partitionBy(col("__id"))
      .orderBy(col("__cos").desc, col("__l"))
    val bestRival = scored.filter(col("__rl") =!= col("__l"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col("__id"), col("__l").as("__riv"),
        col("__cos").as("__rivcos"))
    val perRow = own.join(bestRival, Seq("__id"), "left")
    val stats = perRow.groupBy(col("__rl").as("label"))
      .agg(count(lit(1)).as("n_rows"),
        round(avg(col("__own")), 6).as("mean_own_cos"),
        round(avg(col("__rivcos")), 6).as("mean_rival_cos"),
        round(avg(col("__own")) - avg(col("__rivcos")), 6)
          .as("margin"))
    // confusion direction: the modal nearest-rival per label, ties
    // (count desc, rival asc); a second tiny aggregation over
    // |labels|² rows at most
    val cw = Window.partitionBy(col("label"))
      .orderBy(col("__n").desc, col("__riv"))
    val topRival = perRow.filter(col("__riv").isNotNull)
      .groupBy(col("__rl").as("label"), col("__riv"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__rk", row_number().over(cw))
      .filter(col("__rk") === 1)
      .select(col("label"), col("__riv").as("top_rival"))
    stats.join(topRival, Seq("label"), "left")
  }

  // ───────────────────────── Product quantization ─────────────────────────
  //
  // PQ (Jégou et al. 2011) is the COMPRESSION-first ANN scale path:
  // split each (L2-normalized) vector into `m` subvectors, k-means
  // each subspace into `nCodes` codewords, store each corpus vector
  // as `m` small ints. A 64-dim float32 embedding (256 B) becomes
  // m=8 bytes — 32× smaller — so the candidate-scoring scan reads 3%
  // of the bytes, which at 100 TB of embeddings is the difference
  // between an IO-bound crawl and a CPU-bound scan. Queries score
  // candidates by ADC: precompute, PER QUERY, an m × nCodes table of
  // subspace distances, then each corpus row costs m table lookups.
  // The top-`nCandidates` by approximate distance are re-ranked with
  // exact cosine on the original vectors, so precision of the final
  // top-k is exact; PQ only affects recall (which candidates get
  // re-ranked). L2-on-normalized-vectors ranks identically to cosine,
  // which is what makes the ADC table a valid cosine surrogate.

  /** L2-normalize for the PQ path: the native [[graft.functions
    * .l2_normalize]] expression, with its zero-vector null mapped
    * back to zeros — a zero vector then lands in an arbitrary PQ
    * cell exactly as it would an arbitrary LSH bucket instead of
    * null-poisoning the code/score pipeline ([[embeddingStats]] is
    * the upstream quarantine for such rows).
    */
  def l2Normalize(embCol: Column): Column =
    coalesce(graft.functions.l2_normalize(embCol),
      transform(embCol, _ => lit(0.0)))

  /** Fit the `m` per-subspace codebooks: driver-synchronized Lloyd's
    * over the exploded (__sub, subvector) frame, ALL subspaces
    * jointly — one distributed pass per iteration (assign via
    * literal-codebook argmin, per-(sub, cell) coordinate sums via a
    * map-side-combined groupBy of m·nCodes groups, new centroids
    * rebuilt from the tiny collected sums), instead of m sequential
    * MLlib fits each paying its own init + per-iteration jobs.
    * At most maxIter + 1 passes total — with an assignments-stable
    * early stop (successive per-cell sums identical → fixed point →
    * remaining passes are no-ops, skipped; result bit-identical
    * either way) — each sampleable via
    * `fitSampleFraction` exactly like [[fitIvfIndex]] — codeword
    * QUALITY needs only a representative sample, and every corpus
    * vector still gets encoded in the one full [[pqEncode]] pass.
    *
    * Init: per subspace, the `nCodes` distinct subvectors with the
    * smallest content hash — hash order is a deterministic stand-in
    * for a random draw, giving spread starting points without an
    * extra shuffle-heavy k-means|| phase (codebook quality feeds
    * only recall; the exact re-rank keeps precision regardless).
    * Empty cells keep their previous centroid.
    *
    * @return codebook frame (__sub, __code, __centroid) —
    *         m · nCodes rows, the persistable artifact
    *         ([[DedupIndex.writePq]]).
    */
  /** Shared driver-side per-subspace Lloyd's ([[fitPqCodebooks]] and
    * [[fitOpqRotation]]): init = the nCodes hash-order-smallest
    * distinct subvectors per subspace (Arrays.hashCode, string
    * tiebreak evaluated lazily on collisions only), then <= iters
    * assignment/update rounds with an assignments-stable early stop.
    * Subspaces are independent (disjoint output slots, disjoint input
    * slices) and run in PARALLEL — bit-identical under any thread
    * schedule.
    */
  private def fitBooksLocal(xr: Array[Array[Double]], m: Int,
      nCodes: Int, sd: Int,
      iters: Int,
      fallbackSeeds: Int => Option[Array[Array[Double]]] = _ => None)
      : Array[Array[Array[Double]]] = {
      val cb = Array.ofDim[Array[Double]](m, nCodes)
      java.util.stream.IntStream.range(0, m).parallel().forEach { s =>
        val subs = xr.map(x =>
          java.util.Arrays.copyOfRange(x, s * sd, (s + 1) * sd))
        val sampleDistinct = subs.map(_.toSeq).distinct.map(_.toArray)
        // a duplicate-heavy corpus can fill the hash-smallest sample
        // window with copies while the full corpus has ≥ nCodes
        // distinct subvectors — callers with a corpus at hand supply
        // fallbackSeeds (a bounded distinct-subvector query, run only
        // on this degenerate path; round 17)
        val distinct =
          if (sampleDistinct.size >= nCodes) sampleDistinct
          else fallbackSeeds(s).getOrElse(sampleDistinct)
        require(distinct.size >= nCodes,
          s"subspace $s has ${distinct.size} < nCodes=$nCodes " +
            "distinct subvectors — lower nCodes")
        // same order as sortBy((hashCode, mkString)): the string
        // tiebreak only evaluates on hash collisions (round 16 — the
        // eager spelling built a Double-formatted string per distinct
        // subvector, the fit loop's single hottest allocation)
        val hs = distinct.map(a => java.util.Arrays.hashCode(a))
        val strs = new Array[String](distinct.length)
        def str(i: Int): String = {
          if (strs(i) == null) strs(i) = distinct(i).mkString(",")
          strs(i)
        }
        val seeds = distinct.indices.toArray.sortWith { (a, bI) =>
          if (hs(a) != hs(bI)) hs(a) < hs(bI) else str(a) < str(bI)
        }.take(nCodes).map(i => distinct(i))
        (0 until nCodes).foreach(c => cb(s)(c) = seeds(c).clone())
        var it = 0
        var stable = false
        var prevAssign: Array[Int] = null
        while (it < iters && !stable) {
          val assign = subs.map { v =>
            var best = 0
            var bestD = Double.MaxValue
            var c = 0
            while (c < nCodes) {
              val cent = cb(s)(c)
              var d = 0.0
              var i = 0
              while (i < sd) {
                val t = v(i) - cent(i); d += t * t; i += 1
              }
              if (d < bestD) { bestD = d; best = c }
              c += 1
            }
            best
          }
          if (prevAssign != null && java.util.Arrays.equals(assign,
              prevAssign)) stable = true
          else {
            prevAssign = assign
            val sums = Array.ofDim[Double](nCodes, sd)
            val counts = new Array[Long](nCodes)
            var i = 0
            while (i < subs.length) {
              val c = assign(i)
              counts(c) += 1
              var j = 0
              while (j < sd) { sums(c)(j) += subs(i)(j); j += 1 }
              i += 1
            }
            var c = 0
            while (c < nCodes) {
              if (counts(c) > 0)
                cb(s)(c) = Array.tabulate(sd)(j => sums(c)(j) / counts(c))
              c += 1
            }
            it += 1
          }
        }
      }
      cb
    }

  def fitPqCodebooks(corpus: DataFrame, embCol: String, dim: Int,
                     m: Int = 8, nCodes: Int = 16, seed: Long = 42L,
                     maxIter: Int = 20,
                     fitSampleFraction: Double = 1.0,
                     normalize: Boolean = true,
                     maxFitRows: Int = 16384): DataFrame = {
    require(dim % m == 0, s"dim=$dim must be divisible by m=$m")
    require(fitSampleFraction > 0.0 && fitSampleFraction <= 1.0,
      "fitSampleFraction must be in (0, 1]")
    require(maxFitRows >= nCodes, "need maxFitRows >= nCodes")
    val spark = corpus.sparkSession
    import spark.implicits._
    val sd = dim / m
    // Round 16: the distributed per-pass Lloyd's (an init window job
    // plus one full-corpus assign/aggregate job per pass) became the
    // house bounded-sample driver fit shared with [[fitOpqRotation]]:
    // ONE hash-smallest TakeOrdered collect (<= maxFitRows vectors,
    // xxhash64 over the vector value), then d*k driver work with the
    // same init rule (per subspace, the nCodes hash-order-smallest
    // distinct subvectors) and the same Lloyd arithmetic. Codeword
    // QUALITY needs only a representative sample — the established
    // fitSampleFraction contract — every corpus vector still gets
    // encoded in the one full [[pqEncode]] pass, and full-candidate-
    // budget results are codebook-invariant (the exact re-rank;
    // spec-pinned, and every index-lifecycle gate shares a
    // brute-force oracle). Spread BEFORE the normalize work: a
    // single-file corpus arrives in one split (no-op on an
    // already-parallel production scan). normalize = false is the
    // RESIDUAL mode (fitIvfPq): residuals are differences on the
    // unit sphere, already in model space.
    val base = graft.Graft.spread(corpus)
      .select((if (normalize) l2Normalize(col(embCol))
               else col(embCol).cast("array<double>")).as("__ne"))
    val sample = (if (fitSampleFraction >= 1.0) base
      else base.sample(withReplacement = false, fitSampleFraction,
        seed))
      // vector-value tiebreak: hash collisions at the window boundary
      // must not make the sample partition-order-dependent (round 17)
      .orderBy(xxhash64(col("__ne"), lit(seed)), col("__ne"))
      .limit(maxFitRows)
      .collect() // bounded artifact: <= maxFitRows x dim doubles
      .map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "fitPqCodebooks: empty corpus")
    require(sample.forall(_.length == dim),
      s"fitPqCodebooks: vectors are not $dim-dimensional")
    // fallback seeds for duplicate-heavy corpora: when a subspace's
    // SAMPLE carries < nCodes distinct subvectors, seed from the
    // corpus's distinct subvectors directly (bounded query, run only
    // on that degenerate path) — the pre-sampling fit's full-corpus
    // distinctness semantics, preserved
    val cb = fitBooksLocal(sample, m, nCodes, sd, maxIter, s =>
      Some(base
        .select(slice(col("__ne"), s * sd + 1, sd).as("__s"))
        .distinct()
        .orderBy(xxhash64(col("__s"), lit(seed)), col("__s"))
        .limit(nCodes)
        .collect()
        .map(_.getSeq[Double](0).toArray)))
    (for (s <- 0 until m; c <- 0 until nCodes)
      yield (s, c, cb(s)(c).toSeq)).toDF("__sub", "__code",
      "__centroid")
  }

  /** Collect a codebook frame into the driver-side
    * [m][nCodes][subdim] array the literal-expression encode/ADC
    * builders need — m·nCodes·subdim doubles (e.g. 8·16·8 = 1 KiB at
    * the defaults), the canonical "ship the bounded artifact" shape.
    */
  def collectCodebooks(codebooks: DataFrame, m: Int,
                       nCodes: Int): Array[Array[Array[Double]]] = {
    val cb = Array.ofDim[Array[Double]](m, nCodes)
    codebooks.select(col("__sub"), col("__code"), col("__centroid"))
      .collect().foreach { r =>
        cb(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray }
    (0 until m).foreach { s => (0 until nCodes).foreach { c =>
      require(cb(s)(c) != null,
        s"codebook frame is missing (__sub=$s, __code=$c) — not a " +
          "complete PQ codebook") } }
    cb
  }

  /** Encode every corpus vector as its `m` nearest-codeword ids —
    * a pure scan projection (zero shuffle; the codebooks ride along
    * as literals), emitting CODES ONLY: (neighbor_id, __codes
    * array<int>). This is what makes the index actually compressed —
    * persisting (or scanning) the float vectors alongside the codes
    * would defeat the 32× IO win the candidate pass exists for; the
    * exact re-rank joins the few surviving candidate ids back to the
    * corpus instead ([[pqTopKFromIndex]]). Ties in codeword distance
    * break to the lowest code id (struct min ordering) for
    * determinism.
    */
  def pqEncode(corpus: DataFrame, embCol: String, idCol: String,
               cb: Array[Array[Array[Double]]], dim: Int,
               rotation: Option[Array[Array[Double]]] = None)
      : DataFrame = {
    require(cb.nonEmpty && cb(0)(0).length == dim / cb.length,
      s"codebook subdim ${cb(0)(0).length} does not match " +
        s"dim=$dim / m=${cb.length}")
    // one native expression per row: normalize + all m argmins in
    // tight primitive loops ([[graft.expressions.PqAssign]]); spread
    // first so a single-split source doesn't serialize the encode.
    // With an OPQ rotation the vector rotates first (opqRotate
    // normalizes) and the argmin runs unnormalized in rotated space
    // — the codebooks MUST have been fitted there.
    graft.Graft.spread(corpus)
      .select(col(idCol).as("neighbor_id"),
        rotation.fold(graft.functions.pq_assign(col(embCol), cb))(r =>
          graft.functions.pq_assign(opqRotate(col(embCol), r), cb,
            normalize = false)).as("__codes"))
  }

  /** ADC query against an encoded corpus: per query, an m × nCodes
    * literal-codebook distance table; per corpus row, `m` array
    * lookups summed over the CODES-ONLY scan — the float vectors are
    * touched only for the ≤ nCandidates·|queries| surviving ids,
    * which join back against `corpus` (broadcast of the tiny
    * candidate set, so the corpus never reshuffles) for the exact
    * cosine re-rank. With nCandidates ≥ corpus size the candidate
    * set is everything and the output EQUALS exact brute-force top-k
    * (the driver-gate regime); at partial nCandidates recall follows
    * PQ's quantization error while precision stays exact.
    *
    * Query-batch regimes: the broadcast spelling is right for the
    * few-queries-over-a-big-corpus shape (each query ships one
    * m × nCodes table; the corpus never moves), but it carries
    * |Q| · (m·nCodes·8 B) dist tables and later |Q| · nCandidates
    * candidate ids through the DRIVER — a million-query batch would
    * blow both broadcasts. Above `broadcastMaxQueries` (one cheap
    * count on the query ids decides) the operator switches to the
    * partitioned spelling: the dist-table projection materializes
    * behind one exchange (computed once, re-read per pairing), the
    * ADC scan becomes a shuffle-replicate cartesian over
    * corpus-partitions × query-partitions, and the re-rank joins
    * shuffle on their keys instead of broadcasting per-query state —
    * nothing query-batch-sized ever sits on the driver. Output is
    * identical in both regimes (spec-pinned); AQE may still
    * broadcast a runtime-small join side, which is the size-gated
    * decision the static spelling cannot make.
    *
    * `knownQueryCount`: same contract as
    * [[ivfTopKFromIndex]] — pass |Q| to skip the eager plan-time
    * count() (which re-executes the query frame's lineage); cache an
    * expensive derived query frame above the threshold either way.
    */
  def pqTopKFromIndex(encoded: DataFrame,
                      cb: Array[Array[Array[Double]]],
                      corpus: DataFrame, queries: DataFrame,
                      embCol: String, idCol: String, k: Int, dim: Int,
                      nCandidates: Int = 100,
                      broadcastMaxQueries: Int = 50000,
                      knownQueryCount: Option[Long] = None,
                      rotation: Option[Array[Array[Double]]] = None)
      : DataFrame = {
    // with an OPQ rotation, the dist table lives in the ROTATED
    // space (matching codes encoded from rotated vectors) while the
    // exact re-rank below stays on the original vectors — rotation
    // is orthogonal, so cosine ranks are unaffected
    val dtab = rotation.fold(
      graft.functions.pq_dist_table(col(embCol), cb))(rot =>
      graft.functions.pq_dist_table(opqRotate(col(embCol), rot), cb,
        normalize = false))
    val q = queries.select(col(idCol).as("query_id"),
        col(embCol).as("__qe"), dtab.as("__dtab"))
    // column-pruned count (skipped when the caller supplied |Q|):
    // only the id column reaches the scan
    val nQ = knownQueryCount.getOrElse(
      queries.select(col(idCol)).count())
    val small = nQ <= broadcastMaxQueries
    val qd = q.drop("__qe")
    val scoredJoin =
      if (small) encoded.crossJoin(broadcast(qd))
      else {
        // ~broadcastMaxQueries queries per partition; the exchange
        // materializes the dist-table projection once (the cartesian
        // re-reads shuffle blocks per pairing, never recomputes)
        val nShuffle = encoded.sparkSession.sessionState.conf
          .numShufflePartitions
        val qParts = math.min(nShuffle.toLong,
          (nQ - 1) / broadcastMaxQueries + 1).toInt
        encoded.crossJoin(
          qd.repartition(qParts).hint("shuffle_replicate_nl"))
      }
    val scored = scoredJoin
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("__approx",
        graft.functions.pq_adc(col("__codes"), col("__dtab")))
    // two-level top-C (the per-key-rank skew discipline): a plain
    // Window.partitionBy(query_id) puts EVERY corpus row for a query
    // in one task — with few queries over a big corpus that's a
    // single-task sort of the whole scan. Level 1 ranks within
    // (query, hash-bucket) — B× the parallelism — and the global
    // top-C is provably a subset of the union of per-bucket top-Cs,
    // so level 2 ranks only B·C rows per query. Output identical.
    val nBuckets = encoded.sparkSession.sessionState.conf
      .numShufflePartitions
    val bucketW = Window
      .partitionBy(col("query_id"),
        pmod(xxhash64(col("neighbor_id")), lit(nBuckets)))
      .orderBy(col("__approx"), col("neighbor_id"))
    val candW = Window.partitionBy(col("query_id"))
      .orderBy(col("__approx"), col("neighbor_id"))
    val candIds = scored
      .withColumn("__br", row_number().over(bucketW))
      .filter(col("__br") <= nCandidates)
      .withColumn("__cr", row_number().over(candW))
      .filter(col("__cr") <= nCandidates)
      .select(col("query_id"), col("neighbor_id"))
    // exact re-rank: only the candidates' vectors are read — in the
    // small regime the candidate set broadcasts so the corpus side
    // stays a scan; in the large regime |Q|·nCandidates ids would
    // blow the broadcast, so both joins shuffle on their keys
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(embCol).as("__ce"))
    val qe = q.select(col("query_id"), col("__qe"))
    val cands = (if (small)
        c.join(broadcast(candIds), Seq("neighbor_id"))
          .join(broadcast(qe), Seq("query_id"))
      else
        c.join(candIds, Seq("neighbor_id")).join(qe, Seq("query_id")))
      .withColumn("cos",
        round(graft.functions.cosine_similarity(col("__qe"),
          col("__ce")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("cos"))
  }

  /** Fit an IVF-PQ index (Jégou et al. 2011 §IV; the FAISS `IVFPQ`
    * default at billion scale) — the composition of the two scale
    * paths this library already has: IVF partitions the corpus so a
    * query scans only nProbe cells (the SELECTIVITY win), and PQ
    * compresses what those cells store to m ints per vector (the
    * BANDWIDTH win — the candidate scan reads ~3% of the bytes).
    * The PQ operates on RESIDUALS x̂ − c(cell): residuals
    * concentrate near the origin once the coarse quantizer has
    * absorbed the corpus's macro-structure, so the same nCodes
    * codebook spends its precision on local detail — the reason
    * FAISS encodes residuals rather than raw vectors.
    *
    * All geometry lives on the unit sphere: corpus and query vectors
    * are L2-normalized first (cosine rank ≡ L2 rank there — the s1
    * contract), the coarse KMeans runs on normalized vectors, and
    * residuals/codebooks stay UNNORMALIZED from then on (they are
    * differences, not directions — `normalize = false` through the
    * PQ machinery).
    *
    * Fit cost: one KMeans over (a sample of) the corpus + one
    * residual join against the broadcast centroid table + the
    * driver-synchronized Lloyd's of [[fitPqCodebooks]]; encode is
    * one scan. Returns (centroids, codebooks, encoded) where
    * encoded = (neighbor_id, __cell, __codes) — the persistable
    * artifact set.
    */
  def fitIvfPq(corpus: DataFrame, embCol: String, idCol: String,
               dim: Int, nCentroids: Int = 16, m: Int = 8,
               nCodes: Int = 16, seed: Long = 42L, maxIter: Int = 20,
               fitSampleFraction: Double = 1.0,
               rotation: Option[Array[Array[Double]]] = None)
      : (DataFrame, DataFrame, DataFrame) = {
    // with an OPQ rotation the WHOLE model space rotates — coarse
    // centroids, residuals, codebooks — while queries rotate at
    // probe time and the exact re-rank stays on original vectors
    val normed = corpus.select(col(idCol),
      rotation.fold(l2Normalize(col(embCol)))(r =>
        opqRotate(col(embCol), r)).as("__nv"))
    val (centroids, indexed) =
      fitIvfIndex(normed, "__nv", idCol, nCentroids, seed, maxIter,
        fitSampleFraction)
    // residuals: one broadcast join against the nCentroids-row table
    val resid = indexed.join(broadcast(centroids), Seq("__cell"))
      .select(col("neighbor_id"), col("__cell"),
        zip_with(col("__ce").cast("array<double>"), col("__centroid"),
          (x, c) => x - c).as("__res"))
    val codebooks = fitPqCodebooks(resid, "__res", dim, m, nCodes,
      seed, maxIter, fitSampleFraction, normalize = false)
    val cb = collectCodebooks(codebooks, m, nCodes)
    val encoded = resid.select(col("neighbor_id"), col("__cell"),
      graft.functions.pq_assign(col("__res"), cb, normalize = false)
        .as("__codes"))
    (centroids, codebooks, encoded)
  }

  /** Query an IVF-PQ index: probe the nProbe nearest cells per
    * query, ADC-scan ONLY those cells' compressed codes with a
    * per-(query, cell) residual distance table (the table depends on
    * the cell — the query residual q̂ − c(cell) differs per probed
    * cell, the defining twist of residual IVF-PQ), keep the
    * two-level top-nCandidates by approximate distance, exact-cosine
    * re-rank just those ids against the full vectors. With nProbe =
    * nCentroids AND nCandidates ≥ corpus size the output EQUALS
    * exact brute-force top-k (the driver-gate regime — selectivity
    * and compression both touch only recall, never precision).
    *
    * Query-batch regimes (the [[ivfTopKFromIndex]] discipline): the
    * broadcast spelling ships |Q|·nProbe probe rows, each carrying
    * its m × nCodes dist table; above `broadcastMaxQueries` the cell
    * join switches to the SALTED shuffle join on 2-long
    * (query_id, __cell) rows — the dist tables do NOT replicate
    * across salts; they join back by (query_id, __cell) on the
    * already-matched candidate set, exactly like the query
    * embeddings in the IVF large regime.
    */
  def ivfPqTopKFromIndex(centroids: DataFrame,
                         cb: Array[Array[Array[Double]]],
                         encoded: DataFrame, corpus: DataFrame,
                         queries: DataFrame, embCol: String,
                         idCol: String, k: Int, dim: Int,
                         nProbe: Int = 4, nCandidates: Int = 100,
                         broadcastMaxQueries: Int = 50000,
                         knownQueryCount: Option[Long] = None,
                         rotation: Option[Array[Array[Double]]] = None)
      : DataFrame = {
    val l2 = (a: Column, b: Column) =>
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__dist"), col("__cell"))
    // per (query, probed cell): the residual dist table
    val probed = queries
      .select(col(idCol).as("query_id"),
        rotation.fold(l2Normalize(col(embCol)))(r =>
          opqRotate(col(embCol), r)).as("__qn"))
      .crossJoin(broadcast(centroids))
      .withColumn("__dist", l2(col("__qn"), col("__centroid")))
      .withColumn("__pr", row_number().over(w))
      .filter(col("__pr") <= nProbe)
      .select(col("query_id"), col("__cell"),
        graft.functions.pq_dist_table(
          zip_with(col("__qn"), col("__centroid"), (x, c) => x - c),
          cb, normalize = false).as("__dtab"))

    val nQ = knownQueryCount.getOrElse(
      queries.select(col(idCol)).count())
    val matched =
      if (nQ <= broadcastMaxQueries)
        encoded.join(broadcast(probed), Seq("__cell"))
      else {
        // few-distinct-join-keys skew: salt like ivfTopKFromIndex;
        // only 2-long (query_id, __cell) rows replicate ×S — the
        // m·nCodes dist tables join back on the matched set
        val s = math.min(encoded.sparkSession.sessionState.conf
          .numShufflePartitions, MaxSaltFactor)
        val salted = encoded.withColumn("__salt",
          pmod(xxhash64(col("neighbor_id")), lit(s)).cast("int"))
        val probeIds = probed.select(col("query_id"), col("__cell"))
          .withColumn("__salt",
            explode(sequence(lit(0), lit(s - 1))))
        salted.join(probeIds, Seq("__cell", "__salt"))
          .join(probed, Seq("query_id", "__cell"))
      }
    val scored = matched
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("__approx",
        graft.functions.pq_adc(col("__codes"), col("__dtab")))
    // two-level top-nCandidates (the pqTopKFromIndex discipline),
    // then the exact re-rank over only the surviving ids
    val nBuckets = encoded.sparkSession.sessionState.conf
      .numShufflePartitions
    val bucketW = Window
      .partitionBy(col("query_id"),
        pmod(xxhash64(col("neighbor_id")), lit(nBuckets)))
      .orderBy(col("__approx"), col("neighbor_id"))
    val candW = Window.partitionBy(col("query_id"))
      .orderBy(col("__approx"), col("neighbor_id"))
    val candIds = scored
      .withColumn("__br", row_number().over(bucketW))
      .filter(col("__br") <= nCandidates)
      .withColumn("__cr", row_number().over(candW))
      .filter(col("__cr") <= nCandidates)
      .select(col("query_id"), col("neighbor_id"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(embCol).as("__ce"))
    val qe = queries.select(col(idCol).as("query_id"),
      col(embCol).as("__qe"))
    val small = nQ <= broadcastMaxQueries
    val cands = (if (small)
        c.join(broadcast(candIds), Seq("neighbor_id"))
          .join(broadcast(qe), Seq("query_id"))
      else
        c.join(candIds, Seq("neighbor_id")).join(qe, Seq("query_id")))
      .withColumn("cos",
        round(graft.functions.cosine_similarity(col("__qe"),
          col("__ce")), 6))
    val rw = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cands.withColumn("rank", row_number().over(rw))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("cos"))
  }

  /** One-call IVF-PQ ANN: fit + encode + probe + ADC + re-rank. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, embCol: String,
                idCol: String, k: Int, dim: Int, nCentroids: Int = 16,
                m: Int = 8, nCodes: Int = 16, nProbe: Int = 4,
                nCandidates: Int = 100, seed: Long = 42L,
                maxIter: Int = 20, fitSampleFraction: Double = 1.0,
                broadcastMaxQueries: Int = 50000,
                knownQueryCount: Option[Long] = None,
                rotation: Option[Array[Array[Double]]] = None)
      : DataFrame = {
    val (centroids, codebooks, encoded) = fitIvfPq(corpus, embCol,
      idCol, dim, nCentroids, m, nCodes, seed, maxIter,
      fitSampleFraction, rotation)
    val cb = collectCodebooks(codebooks, m, nCodes)
    ivfPqTopKFromIndex(centroids, cb, encoded, corpus, queries,
      embCol, idCol, k, dim, nProbe, nCandidates,
      broadcastMaxQueries, knownQueryCount, rotation)
  }

  /** ANN recall measurement — the monitoring loop every approximate
    * index's re-fit policy points at ("schedule a re-fit when recall
    * dips"): per query, |approx top-k ∩ exact top-k| / k against a
    * brute-force run over a PROBE SAMPLE of queries, plus one
    * summary row (query_id null) carrying the mean. Run it on a few
    * hundred sampled queries after each append — the brute-force
    * side costs |probe|·|corpus| scoring, which is exactly why the
    * probe set is a sample and not the query log. Ties at the k-th
    * cosine are counted by ID AGREEMENT (the same deterministic
    * (cos desc, neighbor_id) order both sides rank by), so a
    * perfectly-tied alternative neighbor counts as a miss only if
    * the two sides actually disagree — consistent with every gate's
    * exactness contract.
    *
    * `approx` and `exact` must both be (query_id, rank,
    * neighbor_id, …) frames as every topK in this family emits;
    * recall is computed at min(k, exact rows) per query so a query
    * with fewer than k real neighbors is not penalized.
    */
  def recallReport(approx: DataFrame, exact: DataFrame): DataFrame = {
    Seq("query_id", "neighbor_id").foreach { c =>
      require(approx.columns.contains(c) && exact.columns.contains(c),
        s"recallReport: both frames need a '$c' column")
    }
    val a = approx.select(col("query_id"), col("neighbor_id"))
    val e = exact.select(col("query_id"), col("neighbor_id"))
    val hits = e.join(a, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("__hits"))
    val per = e.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"), col("n_exact"),
        coalesce(col("__hits"), lit(0L)).as("n_hit"),
        round(coalesce(col("__hits"), lit(0L)).cast("double") /
          col("n_exact"), 6).as("recall"))
    val summary = per.agg(
      lit(null).cast(per.schema("query_id").dataType).as("query_id"),
      sum(col("n_exact")).as("n_exact"), sum(col("n_hit")).as("n_hit"),
      round(sum(col("n_hit")).cast("double") / sum(col("n_exact")), 6)
        .as("recall"))
    per.unionByName(summary)
  }

  /** One-call PQ ANN: fit + encode + ADC query. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, embCol: String,
             idCol: String, k: Int, dim: Int, m: Int = 8,
             nCodes: Int = 16, nCandidates: Int = 100,
             seed: Long = 42L, maxIter: Int = 20,
             fitSampleFraction: Double = 1.0,
             broadcastMaxQueries: Int = 50000,
             knownQueryCount: Option[Long] = None): DataFrame = {
    val cb = collectCodebooks(
      fitPqCodebooks(corpus, embCol, dim, m, nCodes, seed, maxIter,
        fitSampleFraction), m, nCodes)
    pqTopKFromIndex(pqEncode(corpus, embCol, idCol, cb, dim), cb,
      corpus, queries, embCol, idCol, k, dim, nCandidates,
      broadcastMaxQueries, knownQueryCount)
  }

  // --- OPQ: learned rotation in front of PQ (Ge et al. 2013) --------

  /** The OPQ projection as a column: L2-normalize, then rotate by
    * the learned orthogonal matrix (`out = R·x̂`, one [[graft
    * .functions.mat_vec]] primitive loop). Rotation preserves norms,
    * so the result stays on the unit sphere and feeds the PQ
    * machinery in `normalize = false` (already-in-model-space) mode.
    */
  def opqRotate(embCol: Column, rotation: Array[Array[Double]]): Column =
    graft.functions.mat_vec(l2Normalize(embCol), rotation)

  /** Learn an OPQ ROTATION (Ge et al. 2013, "Optimized Product
    * Quantization", the non-parametric alternation): an orthogonal
    * d×d matrix R minimizing PQ quantization error ‖R·x̂ − q(R·x̂)‖²,
    * so the m independent subspaces the product quantizer imposes
    * line up with the data's actual correlation structure —
    * dimensions that co-vary across a subspace boundary get rotated
    * into the same subspace, which is where plain PQ wastes its
    * code budget. Alternation per round: (1) fix R, Lloyd's per
    * subspace on the rotated sample; (2) fix the codebooks, solve
    * the orthogonal Procrustes problem R = U·Vᵀ from
    * svd(Σ y_i·x_iᵀ) (y = reconstruction, x = input) — the paper's
    * closed-form update, via Breeze (Spark's own linalg dependency).
    *
    * Scale/determinism discipline (the [[fitPqCodebooks]] contract):
    * rotation QUALITY needs only a representative sample, so the fit
    * collects the `maxFitRows` hash-smallest normalized vectors (a
    * deterministic stand-in for a uniform draw — one TakeOrdered, no
    * full sort) and runs the alternation driver-side — d×d work,
    * independent of corpus size; every corpus vector still gets
    * encoded in the one distributed encode pass. Apply with
    * [[opqRotate]] in front of assign/encode/dist-table and keep the
    * exact re-rank on the ORIGINAL vectors (rotation is orthogonal —
    * cosine ranks are unaffected, so full-candidate-budget results
    * stay bit-identical to the unrotated operator; spec-pinned).
    * Persist with [[DedupIndex.writeRotation]].
    *
    * @return the rotation as d rows × d cols, `R(i)(j)`;
    *         `R·Rᵀ = I` up to float roundoff (spec-asserted)
    */
  def fitOpqRotation(corpus: DataFrame, embCol: String, dim: Int,
                     m: Int = 8, nCodes: Int = 16, iters: Int = 10,
                     lloydIters: Int = 10, seed: Long = 42L,
                     maxFitRows: Int = 16384): Array[Array[Double]] = {
    require(dim % m == 0, s"dim=$dim must be divisible by m=$m")
    require(iters >= 1 && lloydIters >= 1 && maxFitRows >= nCodes,
      "need iters >= 1, lloydIters >= 1, maxFitRows >= nCodes")
    val sd = dim / m
    // the hash key runs over the normalized vector's VALUE directly
    // (xxhash64 hashes array elements natively, 8 bytes per double)
    // — round 16: the previous cast-to-string key spent ~90% of the
    // sample job on Double.toString formatting; same deterministic
    // hash-smallest semantics, engine- and partitioning-independent
    val sample = graft.Graft.spread(corpus)
      .select(l2Normalize(col(embCol)).as("__ne"))
      // vector-value tiebreak: see fitPqCodebooks (round 17)
      .orderBy(xxhash64(col("__ne"), lit(seed)), col("__ne"))
      .limit(maxFitRows)
      .collect() // bounded artifact: ≤ maxFitRows × dim doubles
      .map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "fitOpqRotation: empty corpus")
    require(sample.forall(_.length == dim),
      s"fitOpqRotation: vectors are not $dim-dimensional")
    val n = sample.length

    var r = Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
    def rotated(x: Array[Double]): Array[Double] = {
      val out = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        val row = r(i)
        var acc = 0.0
        var j = 0
        while (j < dim) { acc += row(j) * x(j); j += 1 }
        out(i) = acc
        i += 1
      }
      out
    }
    // deterministic per-subspace Lloyd's over the rotated sample;
    // init = nCodes hash-smallest distinct subvectors (stable
    // content hash), the driver spelling of fitPqCodebooks' rule
    def fitBooks(xr: Array[Array[Double]]): Array[Array[Array[Double]]] =
      fitBooksLocal(xr, m, nCodes, sd, lloydIters)
    def reconstruct(xr: Array[Double],
                    cb: Array[Array[Array[Double]]]): Array[Double] = {
      val y = new Array[Double](dim)
      var s = 0
      while (s < m) {
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < nCodes) {
          val cent = cb(s)(c)
          var d = 0.0
          var i = 0
          while (i < sd) {
            val t = xr(s * sd + i) - cent(i); d += t * t; i += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        System.arraycopy(cb(s)(best), 0, y, s * sd, sd)
        s += 1
      }
      y
    }

    var round = 0
    while (round < iters) {
      val xr = sample.map(rotated)
      val cb = fitBooks(xr)
      // Procrustes update: M = Σ y_i x_iᵀ, svd M = U S Vᵀ, R = U Vᵀ
      val mMat = breeze.linalg.DenseMatrix.zeros[Double](dim, dim)
      var idx = 0
      while (idx < n) {
        val x = sample(idx)
        val y = reconstruct(xr(idx), cb)
        var i = 0
        while (i < dim) {
          val yi = y(i)
          if (yi != 0.0) {
            var j = 0
            while (j < dim) { mMat(i, j) += yi * x(j); j += 1 }
          }
          i += 1
        }
        idx += 1
      }
      val decomp = breeze.linalg.svd(mMat)
      val rNew = decomp.U * decomp.Vt
      r = Array.tabulate(dim, dim)((i, j) => rNew(i, j))
      round += 1
    }
    r
  }

  /** One-call OPQ-PQ ANN: rotate (learned R) → fit codebooks in the
    * rotated space → encode → ADC with rotated-query dist tables →
    * exact re-rank on the ORIGINAL vectors. At full candidate budget
    * (`nCandidates` ≥ corpus) the output is bit-identical to
    * [[pqTopK]]'s full-budget output (and the s1 brute-force
    * oracle): the candidate set is everything and the re-rank never
    * sees the rotation. At partial budget the rotation buys recall
    * on subspace-misaligned data (spec-pinned via [[recallReport]]).
    */
  def opqPqTopK(corpus: DataFrame, queries: DataFrame, embCol: String,
                idCol: String, k: Int, dim: Int,
                rotation: Array[Array[Double]], m: Int = 8,
                nCodes: Int = 16, nCandidates: Int = 100,
                seed: Long = 42L, maxIter: Int = 20,
                fitSampleFraction: Double = 1.0,
                broadcastMaxQueries: Int = 50000,
                knownQueryCount: Option[Long] = None): DataFrame = {
    require(rotation.length == dim &&
      rotation.forall(_.length == dim),
      s"rotation must be $dim×$dim")
    val rotCorpus = corpus.select(col(idCol),
      opqRotate(col(embCol), rotation).as("__re"))
    val cb = collectCodebooks(
      fitPqCodebooks(rotCorpus, "__re", dim, m, nCodes, seed, maxIter,
        fitSampleFraction, normalize = false), m, nCodes)
    val encoded = pqEncode(corpus, embCol, idCol, cb, dim,
      Some(rotation))
    pqTopKFromIndex(encoded, cb, corpus, queries, embCol, idCol, k,
      dim, nCandidates, broadcastMaxQueries, knownQueryCount,
      rotation = Some(rotation))
  }
}
