package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation, Deequ-style (Schelter et al.,
  * VLDB 2018 "Automating Large-Scale Data Quality Verification" — the
  * public design this follows): a suite of checks compiles into ONE
  * aggregation pass over the corpus and comes back as a report frame
  * with one row per check (`check_name`, `column_name`, `requirement`,
  * `value`, `passed`) — the "gate the drop before publishing it"
  * stage of a training-data pipeline. (The reference engine stops at
  * windowed aggregation — crates/core/src/physical_plan/continuous/
  * streaming_window.rs; validation is part of this library's
  * pipeline surface, like the dedup and monitor families.)
  *
  * Scale design: every check is expressed as bounded, map-side-
  * combinable aggregates — conditional COUNTs, min/max, exact SUMs,
  * and one ≤ k-long KMV sketch buffer for uniqueness
  * ([[Sketches.kmvSketch]] — the distinct question WITHOUT a distinct
  * shuffle) — so an N-check suite over 100 TB costs exactly one scan
  * and one tiny exchange, not N queries. The same aggregates are
  * streaming-legal (plain counts where COUNT(DISTINCT) is rejected),
  * so [[graft.api.DataStream.validationMonitor]] runs the identical
  * suite per event-time window with constant state.
  *
  * Null/empty semantics (pinned by ValidateSpec): an empty frame (or
  * group/window) still emits every check row with `value` and
  * `passed` NULL — "unknown", not a silent pass or fail; fraction-of-
  * non-null checks over an all-null column are likewise unknown. A
  * pipeline that wants empty-is-failure asserts on `n >= 1` via
  * [[Validate.SizeAtLeast]] explicitly.
  */
object Validate {

  /** One declarative check: a unique display name, the column it
    * watches, a human-readable requirement string, the aggregate
    * columns it needs (tagged to avoid collisions inside the shared
    * single pass), and the (value, passed) pair derived from them.
    * `passed` is evaluated on the UNROUNDED metric; `value` is
    * rounded to 6 for report/gate stability.
    */
  sealed trait Check {
    def name: String
    def columnName: String
    def requirement: String
    private[graft] def aggs(tag: String): Seq[Column]
    private[graft] def result(tag: String, n: Column): (Column, Column)
    /** Null-guard: both value and passed are null when `cond`. */
    private[graft] def unknownWhen(cond: Column, v: Column,
                                   p: Column): (Column, Column) =
      (when(cond, lit(null).cast("double")).otherwise(v),
        when(cond, lit(null).cast("boolean")).otherwise(p))
  }

  /** Fraction of rows with a NON-NULL `column` ≥ `minFrac` — the
    * classic completeness constraint.
    */
  final case class Completeness(column: String, minFrac: Double)
      extends Check {
    val name = s"completeness($column)"
    val columnName = column
    val requirement = s">= $minFrac"
    private[graft] def aggs(tag: String): Seq[Column] =
      Seq(count(col(column)).as(s"__c$tag"))
    private[graft] def result(tag: String, n: Column) = {
      val frac = col(s"__c$tag").cast("double") / n
      unknownWhen(n === 0, frac, frac >= lit(minFrac))
    }
  }

  /** Distinct fraction of `column`'s non-null values ≥ `minFrac`
    * (1.0 = a true unique key). Distinctness rides a KMV bottom-k
    * sketch ([[Sketches.kmvSketch]]) — ≤ k longs of state, no
    * distinct shuffle, EXACT while the true distinct count ≤ k (the
    * gate regime) and ~1/√(k−2) relative error beyond; size k for
    * exactness where the check must be sharp.
    */
  final case class Uniqueness(column: String, minFrac: Double = 1.0,
                              k: Int = 16384) extends Check {
    val name = s"uniqueness($column)"
    val columnName = column
    val requirement = s">= $minFrac"
    private[graft] def aggs(tag: String): Seq[Column] =
      Seq(count(col(column)).as(s"__c$tag"),
        Sketches.kmvSketch(col(column), k).as(s"__sk$tag"))
    private[graft] def result(tag: String, n: Column) = {
      val nn = col(s"__c$tag")
      val frac = Sketches.kmvDistinct(col(s"__sk$tag"), k) / nn
      unknownWhen(nn === 0, frac, frac >= lit(minFrac))
    }
  }

  /** Fraction of `column`'s NON-NULL values inside [lo, hi] ≥
    * `minFrac` (default 1.0 = a hard range constraint).
    */
  final case class FracBetween(column: String, lo: Double, hi: Double,
                               minFrac: Double = 1.0) extends Check {
    require(lo <= hi, s"FracBetween: lo $lo > hi $hi")
    val name = s"between($column)"
    val columnName = column
    val requirement = s"in [$lo, $hi] frac >= $minFrac"
    private[graft] def aggs(tag: String): Seq[Column] =
      Seq(count(col(column)).as(s"__c$tag"),
        count(when(col(column) >= lit(lo) && col(column) <= lit(hi),
          1)).as(s"__in$tag"))
    private[graft] def result(tag: String, n: Column) = {
      val nn = col(s"__c$tag")
      val frac = col(s"__in$tag").cast("double") / nn
      unknownWhen(nn === 0, frac, frac >= lit(minFrac))
    }
  }

  /** Fraction of `column`'s NON-NULL values matching `regex`
    * (Java/RE2-safe syntax — it runs through Spark's `rlike`) ≥
    * `minFrac`.
    */
  final case class Matches(column: String, regex: String,
                           minFrac: Double) extends Check {
    val name = s"matches($column)"
    val columnName = column
    val requirement = s"rlike '$regex' frac >= $minFrac"
    private[graft] def aggs(tag: String): Seq[Column] =
      Seq(count(col(column)).as(s"__c$tag"),
        count(when(col(column).rlike(regex), 1)).as(s"__m$tag"))
    private[graft] def result(tag: String, n: Column) = {
      val nn = col(s"__c$tag")
      val frac = col(s"__m$tag").cast("double") / nn
      unknownWhen(nn === 0, frac, frac >= lit(minFrac))
    }
  }

  /** Fraction of `column`'s NON-NULL values inside the allowed set ≥
    * `minFrac` — the categorical-domain constraint ("lang is one of
    * the corpus languages").
    */
  final case class InSet(column: String, values: Seq[String],
                         minFrac: Double = 1.0) extends Check {
    require(values.nonEmpty, "InSet: empty allowed set")
    val name = s"in_set($column)"
    val columnName = column
    val requirement = s"in {${values.mkString(",")}} frac >= $minFrac"
    private[graft] def aggs(tag: String): Seq[Column] =
      Seq(count(col(column)).as(s"__c$tag"),
        count(when(col(column).isin(values.map(lit): _*), 1))
          .as(s"__in$tag"))
    private[graft] def result(tag: String, n: Column) = {
      val nn = col(s"__c$tag")
      val frac = col(s"__in$tag").cast("double") / nn
      unknownWhen(nn === 0, frac, frac >= lit(minFrac))
    }
  }

  /** Fraction of ALL rows satisfying an arbitrary boolean SQL
    * predicate ≥ `minFrac` — the escape hatch for cross-column
    * invariants ("n_chars = length(text)"). Rows where the predicate
    * is NULL count as NOT satisfying (the conservative read).
    */
  final case class Satisfies(predicateSql: String, label: String,
                             minFrac: Double = 1.0) extends Check {
    val name = s"satisfies($label)"
    val columnName = "*"
    val requirement = s"'$predicateSql' frac >= $minFrac"
    private[graft] def aggs(tag: String): Seq[Column] =
      Seq(count(when(expr(predicateSql), 1)).as(s"__s$tag"))
    private[graft] def result(tag: String, n: Column) = {
      val frac = col(s"__s$tag").cast("double") / n
      unknownWhen(n === 0, frac, frac >= lit(minFrac))
    }
  }

  /** min(`column`) ≥ `atLeast` over non-null values. */
  final case class MinOf(column: String, atLeast: Double)
      extends Check {
    val name = s"min($column)"
    val columnName = column
    val requirement = s">= $atLeast"
    private[graft] def aggs(tag: String): Seq[Column] =
      Seq(min(col(column)).cast("double").as(s"__mn$tag"))
    private[graft] def result(tag: String, n: Column) = {
      val v = col(s"__mn$tag")
      unknownWhen(v.isNull, v, v >= lit(atLeast))
    }
  }

  /** max(`column`) ≤ `atMost` over non-null values. */
  final case class MaxOf(column: String, atMost: Double)
      extends Check {
    val name = s"max($column)"
    val columnName = column
    val requirement = s"<= $atMost"
    private[graft] def aggs(tag: String): Seq[Column] =
      Seq(max(col(column)).cast("double").as(s"__mx$tag"))
    private[graft] def result(tag: String, n: Column) = {
      val v = col(s"__mx$tag")
      unknownWhen(v.isNull, v, v <= lit(atMost))
    }
  }

  /** mean(`column`) inside [lo, hi]. The mean is SUM/COUNT — one
    * IEEE division; over integer columns the sum is exact, so the
    * metric is bit-identical cross-engine (the hash-gateable
    * spelling; double columns carry the usual last-ulp sum caveat).
    */
  final case class MeanBetween(column: String, lo: Double, hi: Double)
      extends Check {
    require(lo <= hi, s"MeanBetween: lo $lo > hi $hi")
    val name = s"mean($column)"
    val columnName = column
    val requirement = s"in [$lo, $hi]"
    private[graft] def aggs(tag: String): Seq[Column] =
      Seq(sum(col(column)).cast("double").as(s"__s$tag"),
        count(col(column)).as(s"__c$tag"))
    private[graft] def result(tag: String, n: Column) = {
      val nn = col(s"__c$tag")
      val v = col(s"__s$tag") / nn
      unknownWhen(nn === 0, v, v >= lit(lo) && v <= lit(hi))
    }
  }

  /** Row count ≥ `atLeast` — the "an empty drop must not pass"
    * check (every other check reads NULL/unknown on empty input by
    * design; this one reads 0 and FAILS).
    */
  final case class SizeAtLeast(atLeast: Long) extends Check {
    val name = "size()"
    val columnName = "*"
    val requirement = s">= $atLeast"
    private[graft] def aggs(tag: String): Seq[Column] = Seq.empty
    private[graft] def result(tag: String, n: Column) =
      (n.cast("double"), n >= lit(atLeast))
  }

  /** Run the suite: ONE aggregation pass (global, or per `by` group)
    * → one report row per check (per group): `check_name`,
    * `column_name`, `requirement`, `value` (rounded 6), `passed`.
    * Check names must be unique (two checks of the same kind on the
    * same column would be indistinguishable in the report — wrap one
    * in [[Satisfies]] with a label instead).
    */
  def report(df: DataFrame, checks: Seq[Check],
             by: Seq[String] = Seq.empty): DataFrame = {
    require(checks.nonEmpty, "validate: empty check suite")
    val names = checks.map(_.name)
    require(names.distinct.size == names.size,
      s"validate: duplicate check names ${names.diff(names.distinct)}")
    val aggCols = count(lit(1)).as("__n") +:
      checks.zipWithIndex.flatMap { case (c, i) => c.aggs(s"_$i") }
    val agged =
      if (by.isEmpty) df.agg(aggCols.head, aggCols.drop(1): _*)
      else df.groupBy(by.map(col): _*)
        .agg(aggCols.head, aggCols.drop(1): _*)
    agged.select(by.map(col) :+ reportEntries(checks): _*)
      .select(by.map(col) ++ Seq(col("__chk.check_name"),
        col("__chk.column_name"), col("__chk.requirement"),
        col("__chk.value"), col("__chk.passed")): _*)
  }

  /** The exploded per-check struct column over the shared aggregate
    * row — a pure stateless projection, so the streaming twin
    * ([[graft.api.DataStream.validationMonitor]]) chains it after
    * its windowed aggregation identically.
    */
  private[graft] def reportEntries(checks: Seq[Check]): Column = {
    val entries = checks.zipWithIndex.map { case (c, i) =>
      val (v, p) = c.result(s"_$i", col("__n"))
      struct(lit(c.name).as("check_name"),
        lit(c.columnName).as("column_name"),
        lit(c.requirement).as("requirement"),
        round(v, 6).cast("double").as("value"),
        p.as("passed"))
    }
    explode(array(entries: _*)).as("__chk")
  }

  private[graft] def suiteAggs(checks: Seq[Check]): Seq[Column] =
    count(lit(1)).as("__n") +:
      checks.zipWithIndex.flatMap { case (c, i) => c.aggs(s"_$i") }

  /** Gate form: run the suite and THROW (IllegalStateException
    * listing every failed/unknown check with its value) unless all
    * checks pass — `Validate.assertPassed(drop, suite)` before
    * publishing a drop. The report is ≤ |checks| rows (× groups) —
    * a bounded artifact.
    */
  def assertPassed(df: DataFrame, checks: Seq[Check],
                   by: Seq[String] = Seq.empty): Unit = {
    val rep = report(df, checks, by)
    val bad = rep.filter(!col("passed") || col("passed").isNull)
      .collect() // bounded artifact: ≤ |checks| × |groups| rows
    if (bad.nonEmpty) {
      val lines = bad.map { r =>
        val g = by.map(c => s"$c=${r.getAs[Any](c)}").mkString(",")
        val v = r.getAs[Any]("value")
        val p = r.getAs[Any]("passed")
        val status = if (p == null) "unknown" else "FAILED"
        s"  ${if (g.nonEmpty) s"[$g] " else ""}" +
          s"${r.getAs[String]("check_name")} " +
          s"${r.getAs[String]("requirement")}: value=$v ($status)"
      }
      throw new IllegalStateException(
        s"validation failed (${bad.length} of ${checks.size} checks" +
          s"${if (by.nonEmpty) " x groups" else ""}):\n" +
          lines.mkString("\n"))
    }
  }
}
