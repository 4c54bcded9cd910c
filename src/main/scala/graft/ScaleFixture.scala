package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic fixture scale-up: replicates a testdata sf directory
  * `factor`× with consistent key offsets, producing a larger sf for
  * scale benchmarks (`runMain graft.ScaleFixture <src> <out> <factor>`).
  * The driver's generator is not available in-repo, so sf1 for
  * BENCH-at-scale evidence is derived from sf0.1 by replication, with
  * two content transforms that keep the WORKLOAD SHAPE honest at the
  * larger size:
  *
  *  - `documents.text`: every token in copy i>0 gets a `_c<i>` suffix.
  *    Without it each copy is an exact duplicate of 9 others and every
  *    near-dup bucket holds 10× mutually-matching entries — pair
  *    queries would scale ~100× (candidate pairs grow quadratically
  *    within buckets) instead of the ~10× a genuinely larger corpus
  *    costs. Suffixed tokens decorrelate copies (distinct shingles,
  *    distinct SimHash signatures) while keeping every within-copy
  *    relationship identical.
  *  - `embeddings.embedding`: copy i is circularly shifted by i
  *    positions. A per-copy PERMUTATION preserves all within-copy
  *    cosine structure exactly (both sides of any pair permute the
  *    same way) while cross-copy cosine drops to the vector's
  *    autocorrelation at lag i (≈0 for these near-random vectors) —
  *    again linear, not quadratic, near-dup growth.
  *
  * Foreign keys offset consistently (customer/orders, orders/lineitem,
  * part, supplier, events.user_id), so join selectivities and per-key
  * densities match the source sf. `region`/`nation` are fixed
  * dimensions and copy unchanged. Each table lands as a single
  * `<name>.parquet` FILE (not a directory), matching the driver
  * fixture layout that `Bench`'s `pathGlobFilter` streaming source
  * expects.
  */
object ScaleFixture {

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "target/sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    // optional 4th arg: comma-separated table subset (an sf10 rung
    // for the headline operators needs only documents/embeddings/
    // events — no point writing a 60M-row lineitem nobody benches)
    val onlyTables = if (args.length > 3)
      Some(args(3).split(",").map(_.trim).filter(_.nonEmpty).toSet)
    else None
    require(factor >= 1, "factor must be >= 1")
    val spark = Graft.session(appName = "graft-scale-fixture")
    scale(spark, src, out, factor, onlyTables)
    spark.stop()
  }

  def scale(spark: SparkSession, src: String, out: String,
            factor: Int, onlyTables: Option[Set[String]] = None): Unit = {
    def load(t: String): DataFrame =
      spark.read.parquet(s"$src/$t.parquet")

    // offset base per keyspace = max key + 1, so copies never collide;
    // cast to long so int-typed keys work, and fail with a real
    // message on an empty/all-null key column instead of an NPE
    def span(df: DataFrame, key: String): Long = {
      val row = df.agg(max(col(key)).cast("long")).head
      require(!row.isNullAt(0),
        s"cannot derive a key span for '$key': no non-null values " +
          s"in $src — is the table empty?")
      row.getLong(0) + 1L
    }

    // lazy: a subset run must not touch (or require) unselected tables
    lazy val cu = span(load("customer"), "c_custkey")
    lazy val ok = span(load("orders"), "o_orderkey")
    lazy val pk = span(load("part"), "p_partkey")
    lazy val sk = span(load("supplier"), "s_suppkey")
    lazy val ev = span(load("events"), "event_id")
    lazy val uu = span(load("events"), "user_id")
    lazy val dc = span(load("documents"), "doc_id")
    lazy val ve = span(load("embeddings"), "vec_id")

    /** Union `factor` copies, applying per-copy column transforms. */
    def rep(df: DataFrame, f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(i => f(df, i)).reduce(_ unionByName _)

    def off(df: DataFrame, i: Int, cols: (String, Long)*): DataFrame =
      cols.foldLeft(df) { case (d, (c, base)) =>
        d.withColumn(c, col(c) + lit(base * i))
      }

    // thunked so a subset run never loads (or spans) unselected tables
    val tables: Seq[(String, () => DataFrame)] = Seq(
      "region" -> (() => load("region")),
      "nation" -> (() => load("nation")),
      "customer" -> (() =>
        rep(load("customer"), off(_, _, "c_custkey" -> cu))),
      "supplier" -> (() =>
        rep(load("supplier"), off(_, _, "s_suppkey" -> sk))),
      "part" -> (() => rep(load("part"), off(_, _, "p_partkey" -> pk))),
      "orders" -> (() => rep(load("orders"),
        off(_, _, "o_orderkey" -> ok, "o_custkey" -> cu))),
      "lineitem" -> (() => rep(load("lineitem"),
        off(_, _, "l_orderkey" -> ok, "l_partkey" -> pk,
          "l_suppkey" -> sk))),
      "events" -> (() => rep(load("events"),
        off(_, _, "event_id" -> ev, "user_id" -> uu))),
      "documents" -> (() => rep(load("documents"), (df, i) => {
        val shifted = off(df, i, "doc_id" -> dc)
        if (i == 0) shifted
        else shifted.withColumn("text",
          regexp_replace(col("text"), "(\\S+)", "$1_c" + i))
      })),
      "embeddings" -> (() => rep(load("embeddings"), (df, i) => {
        val shifted = off(df, i, "vec_id" -> ve)
        if (i == 0) shifted
        else {
          // copy i: circular shift by i mod 64 THEN negate the
          // coordinates where (31k + 17i) ≡ 0 (mod 13). Both are
          // isometries (a permutation and a ±1 diagonal), so every
          // within-copy cosine is preserved exactly; the per-copy
          // sign mask makes COMPOSED transforms distinct — without
          // it, building sf10 as (sf0.1 →×10 sf1 →×10 sf10) gives
          // copy (i, j) the additive shift i+j, so pairs with equal
          // totals were bit-identical vectors and the true near-dup
          // pair set grew quadratically inside those families (the
          // d11 12.1× sf10 reading, audited in BENCH_sf10.json).
          // Masks keyed by the copy index break the additivity:
          // equal composites now need equal shift AND equal mask
          // chains, which distinct copy indices never produce.
          val sh = i % 64
          val rolled =
            if (sh == 0) col("embedding")
            else concat(slice(col("embedding"), lit(sh + 1),
                size(col("embedding")) - sh),
              slice(col("embedding"), lit(1), lit(sh)))
          shifted.withColumn("embedding",
            zip_with(rolled,
              sequence(lit(0), size(col("embedding")) - 1),
              (v, k) => when((k * 31 + lit(i) * 17) % 13 === 0, -v)
                .otherwise(v)))
        }
      })))

    val outDir = java.nio.file.Paths.get(out)
    java.nio.file.Files.createDirectories(outDir)
    tables.filter(t => onlyTables.forall(_.contains(t._1)))
      .foreach { case (name, mkDf) =>
        val df = mkDf()
        val tmp = s"$out/__tmp_$name"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        java.nio.file.Files.move(part.toPath,
          outDir.resolve(s"$name.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        org.apache.commons.io.FileUtils.deleteDirectory(
          new java.io.File(tmp))
        println(s"[scale] $name -> $out/$name.parquet")
      }
  }
}
