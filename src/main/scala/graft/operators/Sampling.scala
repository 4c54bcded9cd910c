package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and splitting for dataset curation at 100TB.
  *
  * Every primitive here is a pure FILTER (or one windowed shuffle) over
  * a content hash — no RNG state, no driver coordination, no
  * `sample()` nondeterminism across retries/speculation. The draw for
  * a row is the first 8 hex chars of `md5(id || chr(0) || salt)`
  * interpreted as
  * a uniform value in [0, 16^8): reproducible across runs, clusters,
  * and ENGINES (lowercase hex compares bytewise identically everywhere,
  * so an external system — or the DuckDB oracle gate — selects the
  * exact same rows). Filters are scan-adjacent: no shuffle, no join,
  * codegen end-to-end; a resample with a larger fraction is a SUPERSET
  * of the smaller one (thresholds nest), which is what incremental
  * curation runs want.
  *
  * DOMAIN SEPARATION: each operator draws from its own salt domain
  * (defaults below), so composed pipelines stay independent —
  * `hashSample(0.2)` then `splitByHash(.8/.1/.1)` splits the sample
  * ≈.8/.1/.1 instead of putting 100% in `train` (which is what a
  * shared un-salted draw degenerates to: both operators would compare
  * the SAME value against nested thresholds). Pass the same explicit
  * salt to two operators only when you WANT them to share the draw
  * (e.g. a split whose train band must equal an earlier sample).
  *
  * The reference has no sampling surface (SURVEY §2.5 scalar/agg
  * library only); these exceed it alongside the dedup/ANN suite.
  *
  * STREAMING: [[hashSample]], [[stratifiedHashSample]] and
  * [[splitByHash]] are stateless filters/projections and run on
  * streaming frames unchanged with identical draws (SamplingSpec pins
  * it). [[topNPerKey]] is inherently retrospective (a rank over the
  * whole key) — for streams use the bounded-state counterpart
  * `hashSample` at n/expected-group-size, or window first.
  */
object Sampling {

  /** Default salt domains — one per operator, so cross-operator
    * compositions use independent draws unless the caller opts into
    * sharing by passing identical salts.
    */
  val SampleSalt = "sample"
  val StrataSalt = "strata"
  val SplitSalt = "split"
  val ReservoirSalt = "reservoir"
  val BudgetSalt = "budget"
  val WeightSalt = "weight"
  val ShuffleSalt = "shuffle"
  val MixSalt = "mix"
  val EpochSalt = "epoch"

  /** First 8 hex chars of md5(id || 'NUL' || salt): the row's
    * uniform draw in the given salt domain. The NUL delimiter makes
    * the (id, salt) encoding injective — with bare concatenation a
    * caller-chosen salt could alias another domain for string ids
    * (id "7s" + salt "ample" = id "7" + salt "sample"); NUL cannot
    * appear in either side's meaningful values. External systems and
    * the DuckDB oracles reproduce it as `md5(id || chr(0) || salt)`.
    *
    * MIGRATION: draws changed twice relative to earlier releases —
    * first from un-salted md5(id) to salted domains, then to the
    * NUL-delimited encoding. Any persisted sample/split/reservoir/
    * shard layout generated under an older draw must be REGENERATED
    * WHOLESALE when moving to this version: re-drawing only part of a
    * corpus silently mixes old 'test' rows into new 'train'
    * (cross-version leakage). Never mix draws across versions.
    */
  def hashBucket(idCol: Column, salt: String): Column =
    substring(md5(concat(idCol.cast("string"), lit("\u0000"), lit(salt))),
      1, 8)

  /** Threshold hex string for a fraction: rows with
    * `hashBucket < threshold` are an (expected) `fraction` of ids.
    */
  private[graft] def hexThreshold(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"fraction must be in [0, 1], got $fraction")
    f"${math.min(math.floor(fraction * 4294967296.0).toLong, 0xFFFFFFFFL)}%08x"
  }

  /** The keep predicate behind [[hashSample]] as a bare Column —
    * also the SQL surface's `hash_sample(id, fraction[, salt])`.
    */
  def sampleKeep(idCol: Column, fraction: Double,
                 salt: String = SampleSalt): Column =
    draw(idCol, fraction, salt)

  private def draw(idCol: Column, fraction: Double, salt: String): Column =
    if (fraction >= 1.0) lit(true)
    else hashBucket(idCol, salt) < lit(hexThreshold(fraction))

  /** Deterministic uniform sample: keeps an expected `fraction` of
    * distinct ids. Pure filter — duplicate ids travel together (all
    * copies kept or dropped), and fractions NEST within a salt domain:
    * hashSample(0.1) ⊆ hashSample(0.2) over the same data and salt.
    */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
                 salt: String = SampleSalt): DataFrame =
    df.filter(draw(col(idCol), fraction, salt))

  /** Per-row keep predicate behind [[weightedHashSample]]: true with
    * probability `weight` (values ≥1 always keep, ≤0 always drop) by
    * comparing the id's salted draw against the per-row hex threshold
    * `floor(weight · 16^8)`. The threshold comparison stays in hex
    * strings like every other draw here, so external systems and the
    * DuckDB oracle reproduce the exact kept set (`weight · 16^8` is a
    * power-of-two scaling — exact in IEEE doubles, no cross-engine
    * rounding seam; the only requirement is that both engines see the
    * same `weight` doubles).
    */
  def weightedKeep(idCol: Column, weight: Column,
                   salt: String = WeightSalt): Column = {
    val thr = lpad(lower(hex(floor(weight * lit(4294967296.0)))), 8, "0")
    (weight >= 1.0) ||
      (weight > 0.0 && hashBucket(idCol, salt) < thr)
  }

  /** Weighted deterministic sample: keeps each row with probability
    * equal to its `weight` column (clamped to [0, 1] by the ≥1 / ≤0
    * branches) — the "soft filter" of quality-weighted curation: keep
    * high-quality documents with high probability instead of a hard
    * quality cutoff, preserving tail diversity while shrinking the
    * corpus toward a token target. Same contract as [[hashSample]]:
    * pure scan-adjacent filter (no shuffle, codegen end-to-end,
    * streaming-safe), reproducible across runs/retries/engines, and
    * MONOTONE in the weight — scaling every weight up only ADDS rows
    * (thresholds nest per row), so tightening a quality curve between
    * runs never flips a kept row for an unrelated one. Duplicate ids
    * with equal weights travel together; if weights differ between
    * copies, each copy draws once against its own weight (same draw,
    * different thresholds — the higher-weight copy survives whenever
    * the lower does).
    */
  def weightedHashSample(df: DataFrame, idCol: String, weight: Column,
                         salt: String = WeightSalt): DataFrame =
    df.filter(weightedKeep(col(idCol), weight, salt))

  /** Deterministic fractional UPSAMPLING — the weight-above-1 half of
    * mixture application ([[weightedHashSample]] is the ≤1 half):
    * each row emits `floor(weight)` copies plus one more iff its
    * salted draw falls below `frac(weight)`, so a domain weighted 3.4
    * contributes ≈3.4 epochs of itself — the "N.M epochs of
    * Wikipedia" step of published data-mixing recipes — with no RNG
    * state and bit-reproducible copy counts (the fractional draw is
    * the same hex machinery as every sampler here; `frac·2³²` is an
    * exact IEEE scaling, so engines agree on the threshold). Output
    * rows gain a 0-based `epoch` column keeping downstream identity
    * unique — chunk/pack on (id, epoch) — and epoch indexes are
    * stable across runs, so epoch 0 is always the same first-pass
    * subset and raising a weight only APPENDS epochs (counts nest per
    * row, the [[weightedHashSample]] monotonicity carried above 1).
    * Weights in [0, 1) degenerate to 0-or-1 copies; weights < 0
    * produce no rows.
    *
    * Scale: pure projection + explode — no shuffle; output volume is
    * exactly the requested blow-up (mind weights: the expansion IS
    * the data you asked for). All epochs of a row land in one task —
    * follow with [[shuffleByHash]] on (id, epoch) when training order
    * must interleave epochs.
    */
  def upsampleByWeight(df: DataFrame, idCol: String, weight: Column,
                       salt: String = EpochSalt): DataFrame = {
    val w = weight.cast("double")
    val frac = w - floor(w)
    val thr = lpad(lower(hex(floor(frac * lit(4294967296.0)))), 8, "0")
    val n = floor(w).cast("long") +
      when(frac > 0.0 && hashBucket(col(idCol), salt) < thr, 1L)
        .otherwise(0L)
    df.withColumn("epoch",
      explode(when(n > 0, sequence(lit(0L), n - 1))
        .otherwise(array().cast("array<bigint>"))))
  }

  /** Temperature-based domain mixing: downsample each domain so the
    * SELECTED corpus's domain mixture is proportional to `n_d^tau`
    * (domain d's row count raised to temperature `tau`) — the
    * standard training-mixture flattening: `tau = 1` keeps the
    * natural mixture (no-op rates of 1), `tau → 0` approaches a
    * uniform mixture, and intermediate values up-weight small
    * domains relative to their natural share. Retention is maximal
    * for the target mixture: the smallest domain keeps everything
    * (rate 1) and domain d keeps `(n_min / n_d)^(1-tau)` of its rows
    * via [[weightedHashSample]] in the `mix` salt domain, so draws
    * compose independently with the rest of the suite and re-runs
    * are reproducible row-for-row.
    *
    * Scale shape: one tiny aggregate (a row per domain) cross-joined
    * with its own 1-row minimum and broadcast back onto the scan —
    * the corpus itself never shuffles; the filter is scan-adjacent
    * like every other draw here. Rates are planned, not collected:
    * no driver round-trip, so the operator composes into a single
    * lazily-planned job at any corpus size.
    *
    * Cross-engine determinism: for the canonical `tau = 0.5` the
    * rate is computed with `sqrt` — correctly rounded in IEEE 754,
    * so every engine (and the p10 DuckDB oracle) sees bit-identical
    * rates and thresholds. Other `tau` use `pow`, which engines only
    * guarantee to ~1 ulp; a last-ulp rate difference can flip a row
    * whose draw lands exactly on the threshold (odds ~2⁻³², flagged
    * here rather than hidden).
    */
  def temperatureMixSample(df: DataFrame, idCol: String,
                           domainCol: String, tau: Double = 0.5,
                           salt: String = MixSalt): DataFrame =
    temperatureMixWithRates(df, domainMixRates(df, domainCol, tau),
      idCol, domainCol, salt)

  /** The per-domain keep rates behind [[temperatureMixSample]] as a
    * tiny frame `(domainCol, mix_rate)` — one row per domain,
    * `mix_rate = (n_min / n_d)^(1-tau)`. Materialize it in a batch
    * pass (it is the only corpus-wide aggregate in the operator) and
    * feed an ingest stream through
    * [[temperatureMixWithRates]] / `DataStream.temperatureMixWith`:
    * the application side is a stream-static broadcast join plus the
    * stateless weighted filter, so mixing runs continuously against
    * the last compaction's counts.
    */
  def domainMixRates(df: DataFrame, domainCol: String,
                     tau: Double = 0.5): DataFrame = {
    require(tau > 0.0 && tau <= 1.0,
      s"tau must be in (0, 1], got $tau (tau = 1 is the natural " +
        "mixture; tau = 0 would zero every rate)")
    val ratio = col("__nmin").cast("double") / col("__n")
    val rate =
      if (1.0 - tau == 0.5) sqrt(ratio) else pow(ratio, lit(1.0 - tau))
    // one counts frame feeds both the per-domain rows and the global
    // min (identical subtree → one corpus aggregation, exchange
    // reused regardless of plan-stats mood)
    val counts = df.groupBy(col(domainCol)).agg(count(lit(1)).as("__n"))
    counts
      .crossJoin(counts.agg(min(col("__n")).as("__nmin")))
      .select(col(domainCol), rate.as("mix_rate"))
  }

  /** Apply precomputed [[domainMixRates]] (any `(domainCol,
    * mix_rate)` frame — also the injection point for hand-tuned
    * mixture rates) to `df`: join the rates on the domain and keep
    * each row with probability `mix_rate` in the `mix` salt domain.
    * Domains absent from `rates` are DROPPED (inner join) — rates
    * computed on a corpus snapshot drop rows of domains born after
    * the snapshot rather than silently keeping them whole. Works on
    * batch and STREAMING `df` (stream-static join + stateless
    * filter).
    */
  def temperatureMixWithRates(df: DataFrame, rates: DataFrame,
                              idCol: String, domainCol: String,
                              salt: String = MixSalt): DataFrame =
    weightedHashSample(df.join(rates, Seq(domainCol)), idCol,
        col("mix_rate"), salt)
      .select(df.columns.map(col).toIndexedSeq: _*)

  /** WATER-FILLING mixture allocation — turn "target mixture weights
    * + total token budget" into per-source sampling FRACTIONS when
    * some sources are too small for their share (the standing
    * problem of every real mixture: "30% code" is an aspiration, the
    * code source holds what it holds): each round gives every active
    * source its weight-proportional share of the remaining budget;
    * sources whose share meets-or-exceeds their availability
    * SATURATE at fraction 1.0 (take everything) and their unfilled
    * share redistributes over the rest in proportion to the
    * remaining weights — the classic water-filling fixpoint,
    * ≤ |sources| rounds, pure driver arithmetic on a ≤ |sources| map
    * (no data scanned; compute `available` with one token-count
    * aggregation and APPLY the result with
    * [[stratifiedHashSample]]). Exact: token counts are longs
    * (< 2⁵³, double-exact), each fraction one division. The expected
    * sampled token total equals the budget; unsaturated sources keep
    * the target ratios among themselves.
    *
    * Refuses a budget above the total available (an allocation that
    * silently under-delivers is how a 500 B-token plan ships 400 B),
    * mismatched source sets, and non-positive weights.
    */
  def allocateMix(available: Map[String, Long],
                  weights: Map[String, Double],
                  budgetTokens: Long): Map[String, Double] = {
    require(available.nonEmpty, "allocateMix: no sources")
    require(weights.keySet == available.keySet,
      s"allocateMix: weights and available must cover the same " +
        s"sources (weights-only: ${weights.keySet -- available.keySet
        }, available-only: ${available.keySet -- weights.keySet})")
    require(weights.values.forall(_ > 0),
      "allocateMix: weights must be positive")
    require(available.values.forall(_ >= 0),
      "allocateMix: negative availability")
    require(budgetTokens >= 0, "allocateMix: negative budget")
    val total = available.values.sum
    require(budgetTokens <= total,
      s"allocateMix: budget $budgetTokens exceeds the " +
        s"$total tokens available — no allocation can deliver it")
    var active = available.keySet
    var frac = Map.empty[String, Double]
    var remaining = budgetTokens.toDouble
    var settled = false
    while (!settled && active.nonEmpty) {
      val wsum = active.iterator.map(weights).sum
      val sat = active.filter(s =>
        remaining * weights(s) / wsum >= available(s))
      if (sat.isEmpty) settled = true
      else {
        sat.foreach { s =>
          frac += s -> 1.0
          remaining -= available(s)
        }
        active --= sat
      }
    }
    if (active.nonEmpty) {
      val wsum = active.iterator.map(weights).sum
      active.foreach { s =>
        frac += s -> remaining * weights(s) / wsum / available(s)
      }
    }
    frac
  }

  /** Stratified deterministic sample: per-stratum fractions with a
    * default for unlisted strata. Same nesting/reproducibility as
    * [[hashSample]]; still a pure filter (one CASE over the strata
    * map), so strata cardinality costs nothing at scan time.
    */
  def stratifiedHashSample(df: DataFrame, idCol: String, strataCol: String,
                           fractions: Map[String, Double],
                           defaultFraction: Double = 0.0,
                           salt: String = StrataSalt): DataFrame = {
    val cond = fractions.foldLeft(lit(null).cast("boolean")) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, draw(col(idCol), f, salt))
          .otherwise(acc)
    }
    df.filter(coalesce(cond, draw(col(idCol), defaultFraction, salt)))
  }

  /** Deterministic train/val/test (or any) split: adds a `split`
    * column assigning every row to exactly one named band by hash
    * range. Weights must sum to 1 (±1e-9); the last band absorbs the
    * hex tail so rows can never fall between bands. Rows with equal
    * ids always land in the same band — the leakage-safe property a
    * random split per-row does NOT have.
    */
  def splitByHash(df: DataFrame, idCol: String,
                  weights: Seq[(String, Double)],
                  salt: String = SplitSalt): DataFrame =
    df.withColumn("split", splitLabel(col(idCol), weights, salt))

  /** The band label behind [[splitByHash]] as a bare Column — also the
    * SQL surface's `split_by_hash(id, name, weight, ... [, salt])`.
    */
  def splitLabel(idCol: Column, weights: Seq[(String, Double)],
                 salt: String = SplitSalt): Column = {
    require(weights.nonEmpty, "need at least one split")
    require(weights.forall(_._2 > 0), "weights must be positive")
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      s"weights must sum to 1, got ${weights.map(_._2).sum}")
    val bounds = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w }
    val b = hashBucket(idCol, salt)
    // WHEN chain over the upper bounds; the final band is the ELSE so
    // floating-point boundary error can't orphan the last hex values
    val split = weights.init.zip(bounds.tail.init)
      .foldLeft(lit(null).cast("string")) { case (acc, ((name, _), hi)) =>
        when(acc.isNull && b < lit(hexThreshold(hi)), lit(name))
          .otherwise(acc)
      }
    coalesce(split, lit(weights.last._1))
  }

  /** Leakage-safe split in the presence of NEAR-duplicates: assigns
    * every member of a near-dup CLUSTER to the same band by hashing
    * the cluster's [[Dedup.connectedComponents]] label (the minimum
    * reachable id) instead of the row's own id. [[splitByHash]] keeps
    * EXACT copies together (equal ids, equal draws) but sends two
    * near-identical documents with different ids to independent draws
    * — at 0.8/0.1/0.1 about 1 in 3 near-dup pairs straddles
    * train/eval, which is precisely the train→test contamination a
    * held-out set exists to prevent. Here `pairs` is any near-dup
    * pair frame (d3–d7: MinHash, SimHash, Jaccard, embedding LSH);
    * rows that appear in no pair are singleton clusters and draw on
    * their own id, so over the un-paired remainder this degenerates
    * to exactly [[splitByHash]] (same salt domain, same draws —
    * spec-pinned).
    *
    * Scale: one CC run over the pair frame (pairs are orders of
    * magnitude smaller than the corpus) + one broadcast-or-shuffle
    * left join of the label frame onto the corpus; the split itself
    * stays a pure projection. Cluster fault tolerance for the CC
    * rounds via `reliableCheckpointDir`, as in
    * [[Dedup.connectedComponents]].
    */
  def splitByHashComponents(df: DataFrame, idCol: String,
                            pairs: DataFrame, aCol: String, bCol: String,
                            weights: Seq[(String, Double)],
                            salt: String = SplitSalt,
                            maxIter: Int = 30,
                            reliableCheckpointDir: Option[String] = None)
      : DataFrame = {
    val labels = Dedup
      .connectedComponents(pairs, aCol, bCol, maxIter,
        reliableCheckpointDir)
      .select(col("id").as("__cc_id"), col("comp").as("__cc_comp"))
    df.join(labels, df(idCol) === col("__cc_id"), "left")
      .withColumn("split",
        splitLabel(coalesce(col("__cc_comp"), df(idCol)), weights, salt))
      .drop("__cc_id", "__cc_comp")
  }

  /** Deterministic global shuffle for training-order randomization:
    * orders the corpus by each row's salted draw (ties broken by id).
    * Same reproducibility story as every draw here — identical order
    * across runs, retries, engines; a different `salt` gives an
    * independent permutation (fresh data order per epoch without
    * materializing anything). Spark executes the ORDER BY as a range
    * exchange on the draw + per-partition sort; the draw is uniform
    * by construction, so range boundaries stay balanced at any scale
    * — no skew, no single-reducer sort. Write the result with
    * maxRecordsPerFile (or feed [[Packing.packChunks]]) to get
    * reproducibly-shuffled training shards.
    */
  def shuffleByHash(df: DataFrame, idCol: String,
                    salt: String = ShuffleSalt): DataFrame =
    df.orderBy(hashBucket(col(idCol), salt), col(idCol))

  /** Deterministic per-key "reservoir": the `n` rows of each key with
    * the smallest hash draw (ties broken by id).
    *
    * Scale shape: the rank is TWO-LEVEL — rows first rank inside
    * (key, hash-of-id sub-bucket) and only each sub-bucket's top-n
    * survive into the per-key final rank. A key's true top-n is a
    * subset of every partition-of-the-key's per-part top-n, so the
    * result is identical to the single-window spelling; the
    * difference is that a HOT KEY (keyCol is typically a language /
    * source column — at corpus scale one value can hold most of the
    * rows) ranks B-way parallel in level 1, and level 2 ranks at most
    * B·n survivors per key instead of the key's full row count. The
    * level-2 shuffle ships only survivors.
    */
  def topNPerKey(df: DataFrame, keyCol: String, idCol: String,
                 n: Int, salt: String = ReservoirSalt): DataFrame = {
    require(n > 0, "n must be positive")
    val b = df.sparkSession.sessionState.conf.numShufflePartitions
    val local = Window
      .partitionBy(col(keyCol), pmod(xxhash64(col(idCol), lit(salt),
        lit("topn_bucket")), lit(b.toLong)))
      .orderBy(hashBucket(col(idCol), salt), col(idCol))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(hashBucket(col(idCol), salt), col(idCol))
    df.withColumn("__lrn", row_number().over(local))
      .filter(col("__lrn") <= n)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__lrn", "__rn")
  }

  /** Per-key quality-quantile filter: keep each key's best
    * `ceil(q · n_key)` rows by `scoreCol` (descending; ties broken by
    * id ascending, so the kept set is deterministic under duplicate
    * scores) — the "keep the top 30% of each source by quality score"
    * curation step, the hard-cutoff complement of
    * [[weightedHashSample]]'s soft filter. The count is `ceil`, so
    * every non-empty key keeps at least one row and tiny domains are
    * never emptied. `q · n` is evaluated in IEEE doubles on both
    * sides of the oracle — identical ceil everywhere.
    *
    * Scale: the per-key rank is the [[Packing.balancedShards]]
    * two-level histogram discipline, not a per-key window — keyCol is
    * a language/source-style column where ONE value can hold most of
    * a 100 TB corpus, and a `Window.partitionBy(key)` would rank that
    * key's rows in a single task. Rows take a monotone SCORE-RANGE
    * bucket (grid from a per-key min/max stats row; a key whose
    * scores are all equal — the adversarial shape — falls back to a
    * monotone ID-range bucket, where the order is pure id anyway),
    * rank within (key, bucket), and add broadcast per-(key, bucket)
    * offsets: the same total (score desc, id asc) rank, bucket-count×
    * the parallelism. Stats and offset sides are histogram-sized —
    * keyCol must be a bounded-cardinality column for the broadcasts
    * (the curation shapes this models always are).
    */
  def topQuantilePerKey(df: DataFrame, keyCol: String, idCol: String,
                        scoreCol: Column, q: Double): DataFrame = {
    require(q > 0 && q <= 1, s"q must be in (0, 1] (got $q)")
    val b = df.sparkSession.sessionState.conf.numShufflePartitions
    val sc = scoreCol.cast("double")
    val idType = df.schema(idCol).dataType
    val isNumId = idType.isInstanceOf[org.apache.spark.sql.types.NumericType]
    val isStrId = idType.isInstanceOf[org.apache.spark.sql.types.StringType]
    val aggs = Seq(count(lit(1)).as("__n"), min(sc).as("__smin"),
      max(sc).as("__smax")) ++
      (if (isNumId) Seq(min(col(idCol).cast("double")).as("__imin"),
        max(col(idCol).cast("double")).as("__imax"))
       else Seq.empty)
    val stats = df.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
    // null scores sort last under scoreCol.desc; bucketing them as
    // -infinity lands them in the last bucket with the smallest real
    // scores, which the within-bucket (scoreCol.desc, id) sort then
    // orders correctly — monotonicity holds with no null special-case
    // in the histogram
    val scForBucket = coalesce(sc, lit(Double.NegativeInfinity))
    val scoreBucket = least(lit(b - 1L), greatest(lit(0L),
      floor((col("__smax") - scForBucket)
        / ((col("__smax") - col("__smin")) / b))))
    val idBucket: Column =
      if (isNumId) least(lit(b - 1L), greatest(lit(0L),
        floor((col(idCol).cast("double") - col("__imin"))
          / ((col("__imax") - col("__imin") + 1.0) / b))))
      else lit(0L)
    val sb: Column =
      if (isStrId)
        // string sb: zero-padded digits for score buckets, a codepoint
        // prefix for the degenerate branch — never mixed within a key,
        // and each is monotone under the key's own order
        when(col("__smax") > col("__smin"),
          lpad(scoreBucket.cast("string"), 6, "0"))
          .otherwise(substring(col(idCol), 1, 6))
      else when(col("__smax") > col("__smin"), scoreBucket)
        .otherwise(idBucket)
    val withSb = df.join(broadcast(stats), Seq(keyCol))
      .withColumn("__sb", sb)
    val histW = Window.partitionBy(col(keyCol)).orderBy(col("__sb").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withSb.groupBy(col(keyCol), col("__sb"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__base", coalesce(sum(col("__c")).over(histW),
        lit(0L)))
      .drop("__c")
    // the explicit repartition is load-bearing: after a non-broadcast
    // stats join the frame is hash(key)-partitioned, which SATISFIES
    // the window's ClusteredDistribution(key, sb) — Spark would skip
    // the exchange and the hot key would serialize after all
    val within = Window.partitionBy(col(keyCol), col("__sb"))
      .orderBy(scoreCol.desc, col(idCol))
    withSb.join(broadcast(offsets), Seq(keyCol, "__sb"))
      .repartition(col(keyCol), col("__sb"))
      .withColumn("__rn",
        col("__base") + row_number().over(within).cast("long"))
      .filter(col("__rn") <= ceil(col("__n") * lit(q)))
      .drop("__sb", "__n", "__smin", "__smax", "__imin", "__imax",
        "__base", "__rn")
  }

  /** Deterministic token-budget selection: keep rows, in [[hashBucket]]
    * draw order (then id), while the running `tokens` total stays
    * within `budget` — per stratum when `strataCol` is set. This is the
    * mixture-weights step of corpus assembly ("2B tokens of code, 500M
    * of math"): token budgets, unlike row fractions, are what training
    * recipes are written in. The hash order makes the kept set a
    * uniform pseudo-random prefix — reproducible across runs/engines,
    * and a bigger budget keeps a SUPERSET of a smaller one (same
    * nesting property as [[hashSample]]). `tokens` must be
    * non-negative (the running total must be monotone for the prefix
    * to be well-defined); ids should be unique, or the boundary row
    * among equal-id copies is arbitrary.
    *
    * Scale shape: NO global sort. A 16-bit hash-prefix histogram
    * (≤65k rows per stratum) carries cross-bucket prefix sums via a
    * tiny window; data rows then need only a WITHIN-bucket running sum
    * (window partitioned by (stratum, bucket) — ~N/65k rows each), and
    * the joined bucket prefix lifts it to the global running total.
    * Buckets starting at or past the budget drop at the (broadcast)
    * join without ever being ranked. Bit-identical to the
    * single-sort definition — the oracle gate (p6) checks it against
    * DuckDB's global-window spelling, and SamplingSpec against a
    * single-window Spark spelling.
    */
  def selectToTokenBudget(df: DataFrame, idCol: String, tokens: Column,
                          budget: Long,
                          strataCol: Option[String] = None,
                          salt: String = BudgetSalt): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val strat = strataCol.map(col).getOrElse(lit(""))
    val draw = hashBucket(col(idCol), salt)
    val bucket = substring(draw, 1, 4)
    val hist = df.groupBy(strat.as("__s"), bucket.as("__b"))
      .agg(sum(tokens.cast("long")).as("__bt"))
    val pre = hist
      .withColumn("__pre", coalesce(
        sum(col("__bt")).over(Window.partitionBy(col("__s"))
          .orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      // <= not <: a zero-token row whose bucket starts exactly at the
      // budget still satisfies cum <= budget under the single-sort
      // definition and must survive here too
      .filter(col("__pre") <= budget)
      .select(col("__s"), col("__b"), col("__pre"))
    val w = Window.partitionBy(col("__s"), col("__b"))
      .orderBy(col("__draw"), col(idCol))
    df.withColumn("__s", strat)
      .withColumn("__b", bucket)
      .withColumn("__draw", draw)
      .withColumn("__tok", tokens.cast("long"))
      .join(broadcast(pre), Seq("__s", "__b"))
      .withColumn("__cum", col("__pre") + sum(col("__tok")).over(w))
      .filter(col("__cum") <= budget)
      .drop("__s", "__b", "__draw", "__tok", "__pre", "__cum")
  }
}
