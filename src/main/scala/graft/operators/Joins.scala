package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators beyond Spark's built-ins (the reference has no
  * as-of/interval surface either — SURVEY §2.3 "Not present"; these
  * exceed it).
  */
object Joins {

  private def hasMap(t: org.apache.spark.sql.types.DataType): Boolean =
    t match {
      case _: org.apache.spark.sql.types.MapType => true
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.exists(f => hasMap(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hasMap(a.elementType)
      case _ => false
    }

  /** Backward as-of join: for every left row, the single latest right
    * row with rightTs <= leftTs (optionally within `tolerance`), per
    * equi-key; unmatched left rows survive with nulls. Right rows with
    * a NULL timestamp never match (same as the rank form's range
    * predicate evaluating NULL → false).
    *
    * Implementation = sort-merge over the UNION of both sides: tag
    * rows, sort (key, ts) once, and carry the running "last right ROW"
    * with `last(..., ignoreNulls)` over an unbounded-preceding frame.
    * Candidate pairs are never materialized — the widest intermediate
    * is |L|+|R| rows — so a hot key costs one sorted partition instead
    * of an N×M fan-out (the failure mode of the rank-based form at
    * 100TB; kept as [[asOfJoinBackwardViaRank]] for cross-checking).
    * Carrying the whole right row (not an id to rejoin) keeps the
    * operator a single pass over `right` — no second evaluation whose
    * row ids could disagree under nondeterministic upstreams.
    *
    * With a fixed-length (day-time) `tolerance` the sort partition is
    * additionally TIME-BUCKETED: every right row replicates into its
    * own floor(ts/tol) bucket and the next one, so any match within
    * [t-tol, t] is guaranteed present in the left row's own
    * (key, bucket) partition — a hot key's history spreads over
    * #buckets tasks instead of one sorted partition (the remaining
    * skew ceiling of the plain merge). Costs 2× the right rows in the
    * shuffle; out-of-range carry-ins are nulled by the tolerance
    * check as before.
    */
  def asOfJoinBackward(left: DataFrame, right: DataFrame,
                       leftKeys: Seq[String], rightKeys: Seq[String],
                       leftTs: String, rightTs: String,
                       tolerance: Option[String] = None): DataFrame =
    asOfMerge(left, right, leftKeys, rightKeys, leftTs, rightTs,
      tolerance, forward = false)

  /** Forward as-of join: for every left row, the single EARLIEST right
    * row with rightTs >= leftTs (optionally within `tolerance`), per
    * equi-key — the time-mirror of [[asOfJoinBackward]] with the same
    * union sort-merge implementation (traversal runs descending, right
    * rows replicate into their own and the PREVIOUS tolerance bucket).
    * Same null/tie semantics: NULL right timestamps never match,
    * equal-timestamp rights tie-break on the min row hash.
    */
  def asOfJoinForward(left: DataFrame, right: DataFrame,
                      leftKeys: Seq[String], rightKeys: Seq[String],
                      leftTs: String, rightTs: String,
                      tolerance: Option[String] = None): DataFrame =
    asOfMerge(left, right, leftKeys, rightKeys, leftTs, rightTs,
      tolerance, forward = true)

  private def asOfMerge(left: DataFrame, right: DataFrame,
                        leftKeys: Seq[String], rightKeys: Seq[String],
                        leftTs: String, rightTs: String,
                        tolerance: Option[String],
                        forward: Boolean): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType,
      DayTimeIntervalType, TimestampType}

    // equal-ts right rows tie-break on a hash of the right row's
    // hashable columns (min hash wins, matching the rank form), never
    // on partition arrival order
    val tieCols = right.schema.fields
      .filterNot(f => hasMap(f.dataType)).map(f => col(f.name))
    val tieBreak = if (tieCols.nonEmpty) xxhash64(tieCols: _*) else lit(0L)

    val keyAliases = leftKeys.indices.map(i => s"__asof_k$i")
    val lrowType = StructType(left.schema.fields)
    val markType = StructType(Seq(
      StructField("ts", right.schema(rightTs).dataType),
      StructField("row", StructType(right.schema.fields))))

    // fixed-length tolerance (day-time interval) + timestamp columns →
    // the partition can be time-bucketed; year-month intervals have no
    // fixed micro length, so they stay on the plain per-key sort.
    // Parse with the Catalyst parser directly: Spark 4's expr() returns
    // a LAZY ColumnNodeExpression (SQL text, parsed at analysis), so
    // matching on Literal through it never fires
    val tolMicros: Option[Long] = tolerance.flatMap { tol =>
      try org.apache.spark.sql.catalyst.parser.CatalystSqlParser
          .parseExpression(s"INTERVAL $tol") match {
        case l: org.apache.spark.sql.catalyst.expressions.Literal
            if l.dataType.isInstanceOf[DayTimeIntervalType] &&
              right.schema(rightTs).dataType == TimestampType &&
              left.schema(leftTs).dataType == TimestampType &&
              l.value.asInstanceOf[Long] > 0L =>
          Some(l.value.asInstanceOf[Long])
        case _ => None
      } catch { case scala.util.control.NonFatal(_) => None }
    }
    def bucketOf(ts: Column): Column = tolMicros match {
      case Some(us) => floor(unix_micros(ts) / lit(us)).cast("long")
      case None => lit(0L)
    }

    val rBase = right
      // a NULL rightTs would sort first and leak into every left row
      // via last(ignoreNulls); the rank form's range predicate drops
      // such rows (NULL comparison → false), so drop them here too
      .filter(col(rightTs).isNotNull)
      .select(
        rightKeys.zip(keyAliases).map { case (k, a) => col(k).as(a) } ++ Seq(
          col(rightTs).as("__t"), lit(0).as("__side"),
          struct(col(rightTs).as("ts"),
            struct(right.columns.map(col): _*).as("row")).as("__mark"),
          tieBreak.as("__ord"),
          lit(null).cast(lrowType).as("__lrow")): _*)
    // replicate each right row into its own bucket and the adjacent
    // one in match direction: every left at time t finds all rights in
    // [t-tol, t] (backward) / [t, t+tol] (forward) inside bucket(t)
    val neighbor = if (forward) lit(-1L) else lit(1L)
    val rBranch = tolMicros match {
      case Some(_) => rBase.withColumn("__bkt",
        explode(array(bucketOf(col("__t")),
          bucketOf(col("__t")) + neighbor)))
      case None => rBase.withColumn("__bkt", lit(0L))
    }
    val lBranch = left.select(
      leftKeys.zip(keyAliases).map { case (k, a) => col(k).as(a) } ++ Seq(
        col(leftTs).as("__t"), lit(1).as("__side"),
        lit(null).cast(markType).as("__mark"), lit(0L).as("__ord"),
        struct(left.columns.map(col): _*).as("__lrow")): _*)
      .withColumn("__bkt", bucketOf(col("__t")))

    // rights sort before lefts at equal ts (side 0 < 1): rightTs ==
    // leftTs counts as a match in BOTH directions; among tied rights
    // the LAST in __ord desc order (= min hash) wins. Forward runs
    // the same carry over a DESCENDING traversal, so the carried right
    // is the earliest at-or-after the left row
    val tsOrder = if (forward) col("__t").desc else col("__t").asc
    val w = Window.partitionBy((keyAliases :+ "__bkt").map(col): _*)
      .orderBy(tsOrder, col("__side").asc, col("__ord").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = rBranch.unionByName(lBranch)
      .withColumn("__m", last(col("__mark"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val inRange = tolerance match {
      case Some(tol) =>
        if (forward) col("__m.ts") <= col("__t") + expr(s"INTERVAL $tol")
        else col("__m.ts") >= col("__t") - expr(s"INTERVAL $tol")
      case None => col("__m.ts").isNotNull
    }
    // null join keys never match (equi-join semantics; the window
    // groups nulls together, an equi-join would not)
    val keysNotNull = keyAliases.map(col(_).isNotNull)
      .reduceOption(_ && _).getOrElse(lit(true))
    val matchRow = when(inRange && keysNotNull, col("__m.row"))
    matched.select(
      left.columns.map(c => col("__lrow").getField(c).as(c)) ++
      right.columns.map(c => matchRow.getField(c).as(c)): _*)
  }

  /** Rank-based spelling of [[asOfJoinBackward]]: range join + per-left
    * rank-1. Identical results; materializes every candidate pair, so
    * only safe with a tight `tolerance` or when right-per-key history
    * is known small. Kept for cross-checking the merge form.
    */
  def asOfJoinBackwardViaRank(left: DataFrame, right: DataFrame,
                              leftKeys: Seq[String], rightKeys: Seq[String],
                              leftTs: String, rightTs: String,
                              tolerance: Option[String] = None): DataFrame = {
    val lid = "__asof_lid"
    val l = left.withColumn(lid, monotonically_increasing_id())
    val keyCond = leftKeys.zip(rightKeys)
      .map { case (a, b) => l(a) === right(b) }.reduce(_ && _)
    val timeCond = tolerance match {
      case Some(tol) => right(rightTs) <= l(leftTs) &&
        right(rightTs) >= l(leftTs) - expr(s"INTERVAL $tol")
      case None => right(rightTs) <= l(leftTs)
    }
    val joined = l.join(right, keyCond && timeCond, "left")
    // deterministic rank-1: equal-timestamp candidates tie-break on a
    // hash of the right row's hashable columns (maps are excluded —
    // hash() rejects MapType), not partition arrival order
    val tieCols = right.schema.fields
      .filterNot(f => hasMap(f.dataType)).map(f => right(f.name))
    val tieBreak = if (tieCols.nonEmpty) xxhash64(tieCols: _*)
                   else lit(0L)
    val w = Window.partitionBy(col(lid))
      .orderBy(right(rightTs).desc_nulls_last, tieBreak.asc_nulls_last)
    joined.withColumn("__asof_rn", row_number().over(w))
      .filter(col("__asof_rn") === 1)
      .drop(lid, "__asof_rn")
  }

  /** Nearest as-of join: per left row, the right row minimizing
    * |rightTs − leftTs| per equi-key, optionally bounded by
    * `tolerance` on BOTH sides; equal distances prefer the backward
    * (at-or-before) match. Implementation: the same union sort-merge
    * as the directional forms, with TWO window passes over one
    * shuffle — an ascending carry (backward candidate) and a
    * descending carry (forward candidate) — then a per-row distance
    * pick; candidate pairs are never materialized. This form has no
    * time-bucket skew spread (the directional forms do): a hot key
    * costs one sorted partition.
    */
  def asOfJoinNearest(left: DataFrame, right: DataFrame,
                      leftKeys: Seq[String], rightKeys: Seq[String],
                      leftTs: String, rightTs: String,
                      tolerance: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val tieCols = right.schema.fields
      .filterNot(f => hasMap(f.dataType)).map(f => col(f.name))
    val tieBreak = if (tieCols.nonEmpty) xxhash64(tieCols: _*) else lit(0L)
    val keyAliases = leftKeys.indices.map(i => s"__asof_k$i")
    val lrowType = StructType(left.schema.fields)
    val markType = StructType(Seq(
      StructField("ts", right.schema(rightTs).dataType),
      StructField("row", StructType(right.schema.fields))))

    val rBranch = right
      .filter(col(rightTs).isNotNull)
      .select(
        rightKeys.zip(keyAliases).map { case (k, a) => col(k).as(a) } ++ Seq(
          col(rightTs).as("__t"), lit(0).as("__side"),
          struct(col(rightTs).as("ts"),
            struct(right.columns.map(col): _*).as("row")).as("__mark"),
          tieBreak.as("__ord"),
          lit(null).cast(lrowType).as("__lrow")): _*)
    val lBranch = left.select(
      leftKeys.zip(keyAliases).map { case (k, a) => col(k).as(a) } ++ Seq(
        col(leftTs).as("__t"), lit(1).as("__side"),
        lit(null).cast(markType).as("__mark"), lit(0L).as("__ord"),
        struct(left.columns.map(col): _*).as("__lrow")): _*)

    val wB = Window.partitionBy(keyAliases.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__ord").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(keyAliases.map(col): _*)
      .orderBy(col("__t").desc, col("__side").asc, col("__ord").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = rBranch.unionByName(lBranch)
      .withColumn("__mb", last(col("__mark"), ignoreNulls = true).over(wB))
      .withColumn("__mf", last(col("__mark"), ignoreNulls = true).over(wF))
      .filter(col("__side") === 1)

    def ok(m: Column, fwd: Boolean): Column = tolerance match {
      case Some(tol) =>
        if (fwd) m.getField("ts") <= col("__t") + expr(s"INTERVAL $tol")
        else m.getField("ts") >= col("__t") - expr(s"INTERVAL $tol")
      case None => m.getField("ts").isNotNull
    }
    // double distance: exact to < 1µs for epoch-range timestamps and
    // exact for integral ts columns well past 2^40
    val t0 = col("__t").cast("double")
    val db = t0 - col("__mb.ts").cast("double")
    val df = col("__mf.ts").cast("double") - t0
    val bOk = col("__mb.ts").isNotNull && ok(col("__mb"), fwd = false)
    val fOk = col("__mf.ts").isNotNull && ok(col("__mf"), fwd = true)
    val keysNotNull = keyAliases.map(col(_).isNotNull)
      .reduceOption(_ && _).getOrElse(lit(true))
    val chosen =
      when(bOk && fOk, when(db <= df, col("__mb.row"))
        .otherwise(col("__mf.row")))
      .when(bOk, col("__mb.row"))
      .when(fOk, col("__mf.row"))
    val matchRow = when(keysNotNull, chosen)
    matched.select(
      left.columns.map(c => col("__lrow").getField(c).as(c)) ++
      right.columns.map(c => matchRow.getField(c).as(c)): _*)
  }

  /** Rank-based spelling of [[asOfJoinForward]] — cross-check twin of
    * [[asOfJoinBackwardViaRank]].
    */
  def asOfJoinForwardViaRank(left: DataFrame, right: DataFrame,
                             leftKeys: Seq[String], rightKeys: Seq[String],
                             leftTs: String, rightTs: String,
                             tolerance: Option[String] = None): DataFrame = {
    val lid = "__asof_lid"
    val l = left.withColumn(lid, monotonically_increasing_id())
    val keyCond = leftKeys.zip(rightKeys)
      .map { case (a, b) => l(a) === right(b) }.reduce(_ && _)
    val timeCond = tolerance match {
      case Some(tol) => right(rightTs) >= l(leftTs) &&
        right(rightTs) <= l(leftTs) + expr(s"INTERVAL $tol")
      case None => right(rightTs) >= l(leftTs)
    }
    val joined = l.join(right, keyCond && timeCond, "left")
    val tieCols = right.schema.fields
      .filterNot(f => hasMap(f.dataType)).map(f => right(f.name))
    val tieBreak = if (tieCols.nonEmpty) xxhash64(tieCols: _*)
                   else lit(0L)
    val w = Window.partitionBy(col(lid))
      .orderBy(right(rightTs).asc_nulls_last, tieBreak.asc_nulls_last)
    joined.withColumn("__asof_rn", row_number().over(w))
      .filter(col("__asof_rn") === 1)
      .drop(lid, "__asof_rn")
  }

  /** Skew-salted broadcast-style join for hot build sides: the right
    * (dimension) side is replicated `saltFactor`× and the left side
    * routes each row to one deterministic salt bucket, so a hot key's
    * rows spread over `saltFactor` tasks instead of one. Result is
    * row-identical to a plain inner equi-join. (AQE skew-join handles
    * most cases at runtime; this is the explicit form for when the
    * skew is in a non-splittable stage.)
    */
  def saltedJoin(left: DataFrame, right: DataFrame,
                 keys: Seq[String], saltFactor: Int = 8): DataFrame = {
    val salt = "__salt"
    val l = left.withColumn(salt,
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor))
        .cast("int"))
    val r = right.withColumn(salt,
      explode(array((0 until saltFactor).map(lit): _*)))
    l.join(r, keys :+ salt).drop(salt)
  }
}
