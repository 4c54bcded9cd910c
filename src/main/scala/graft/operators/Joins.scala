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
    * equi-key; unmatched left rows survive with nulls.
    *
    * Implementation = range join + per-left-row rank-1, which Catalyst
    * plans as a shuffled equi-join on the keys; tolerance keeps the
    * candidate fan-out bounded at scale (without it a hot key pairs
    * every left row with its full right history).
    */
  def asOfJoinBackward(left: DataFrame, right: DataFrame,
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
