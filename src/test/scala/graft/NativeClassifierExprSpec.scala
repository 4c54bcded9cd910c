package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-16 optimization pins: the native classifier expressions
  * (hashed_buckets / bucket_dot / bucket_hist) must be bit-identical
  * to the Column spellings they replaced (md5→hex→conv chains inside
  * higher-order lambdas, explode → groupBy(bucket) for the gradient)
  * — the operators' oracle contracts replay the OLD arithmetic in
  * DuckDB, so any drift here is a correctness bug, not a perf one.
  */
class NativeClassifierExprSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def h32old(s: org.apache.spark.sql.Column) =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  private val docs = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a dup marker document with unicode éü中文 tokens",
    "one",
    "",
    "x y",
    "repeated repeated repeated words words"
  ).toDF("text").withColumn("toks",
    operators.TextAnalysis.tokenize(col("text")))

  test("hashed_buckets ≡ the old transform/zip_with md5 spelling, " +
      "unigram and bigram, including empty and 1-token docs") {
    for (dim <- Seq(7, 64); ngrams <- Seq(1, 2)) {
      val uni = transform(col("toks"),
        t => pmod(h32old(t), lit(dim)).cast("int"))
      val oldBks =
        if (ngrams == 1) uni
        else {
          val bi = when(size(col("toks")) >= 2,
            zip_with(slice(col("toks"), lit(1), size(col("toks")) - 1),
              slice(col("toks"), lit(2), size(col("toks")) - 1),
              (a, b) => pmod(h32old(concat(a, lit(" "), b)),
                lit(dim)).cast("int")))
            .otherwise(array().cast("array<int>"))
          concat(uni, bi)
        }
      val rows = docs.select(
        graft.functions.hashed_buckets(col("toks"), dim, ngrams)
          .as("neo"),
        oldBks.as("old")).collect()
      rows.foreach { r =>
        assert(r.getSeq[Int](0) == r.getSeq[Int](1),
          s"dim=$dim ngrams=$ngrams: ${r.getSeq[Int](0)} vs " +
            s"${r.getSeq[Int](1)}")
      }
    }
  }

  test("hashed_buckets null semantics match the Column spelling") {
    val withNulls = Seq(
      (1L, Seq("a", null, "b")),
      (2L, null)
    ).toDF("id", "toks")
    val got = withNulls.select(col("id"),
      graft.functions.hashed_buckets(col("toks"), 16, 2).as("b"))
      .orderBy(col("id")).collect()
    // null token → null element for its unigram and both adjacent
    // pairs (concat-with-null is null); null array → null
    assert(!got(0).isNullAt(1))
    val arr = got(0).getSeq[Integer](1)
    assert(arr.length == 5 && arr(1) == null && arr(3) == null &&
      arr(4) == null && arr(0) != null && arr(2) != null)
    assert(got(1).isNullAt(1))
  }

  test("bucket_dot ≡ aggregate-fold element_at over the weight " +
      "table; bucket_hist ≡ explode → groupBy(bucket) → sum") {
    val dim = 32
    val w = Array.tabulate(dim)(b => (b * 37L - 500L) * 1000L)
    val wLit = typedLit(w.toSeq)
    val base = docs.filter(size(col("toks")) > 0)
      .select(graft.functions.hashed_buckets(col("toks"), dim, 2)
        .as("bks"))
      .withColumn("c", (size(col("bks")) * 13 - 7).cast("long"))
    val dots = base.select(
      graft.functions.bucket_dot(col("bks"), w.toSeq).as("neo"),
      aggregate(col("bks"), lit(0L),
        (acc, b) => acc + element_at(wLit, b + 1)).as("old")).collect()
    dots.foreach(r => assert(r.getLong(0) == r.getLong(1)))

    val hist = base
      .agg(graft.functions.bucket_hist(col("bks"), col("c"), dim))
      .head().getSeq[Long](0)
    val old = base.select(col("c"), explode(col("bks")).as("b"))
      .groupBy(col("b")).agg(sum(col("c")).as("g"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    (0 until dim).foreach { b =>
      assert(hist(b) == old.getOrElse(b, 0L),
        s"bucket $b: ${hist(b)} vs ${old.getOrElse(b, 0L)}")
    }
  }

  test("hashedLinearScore pseudo-weight table matches the old " +
      "two-md5-per-token chain") {
    val dim = 64
    val wOf = (tok: org.apache.spark.sql.Column) =>
      pmod(h32old(concat(lit("w"), pmod(h32old(tok), lit(dim)))),
        lit(2001L)) - lit(1000L)
    val oldScore = aggregate(col("toks"), lit(0L),
      (acc, t) => acc + wOf(t))
    val neo = operators.TextAnalysis.hashedLinearScore(
      docs.withColumn("doc_id", monotonically_increasing_id()),
      "doc_id", "text", dim = dim)
    val old = docs.select(oldScore.as("sm")).collect().map(_.getLong(0))
    val got = neo.select(col("score_milli")).collect().map(_.getLong(0))
    assert(got.toSeq == old.toSeq)
  }
}
