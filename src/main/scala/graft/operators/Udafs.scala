package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** User-defined aggregate surface, mirroring the reference's UDAF
  * example (/root/reference/py-denormalized/python/examples/
  * udaf_example.py:30-89): an accumulator with map-typed state
  * (`struct<counts: map<string,int64>>`) usable inside windowed
  * aggregations — here as a typed `Aggregator` whose buffer Spark
  * serializes into the state store automatically (replacing the
  * reference's hand-rolled accumulator serde, SURVEY §2.7).
  */
object Udafs {

  /** Occurrence count per distinct value — the reference example's
    * semantics (counts sensor readings by value).
    */
  class CountByValue extends Aggregator[String, Map[String, Long],
      Map[String, Long]] {
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
      if (a == null) b else b.updated(a, b.getOrElse(a, 0L) + 1L)
    override def merge(x: Map[String, Long],
                       y: Map[String, Long]): Map[String, Long] =
      y.foldLeft(x) { case (acc, (k, v)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + v) }
    override def finish(r: Map[String, Long]): Map[String, Long] = r
    // columnar map encoder (NOT kryo): the state-store buffer stays an
    // introspectable map<string,bigint>, evolvable and faster than an
    // opaque blob. NOTE: this changed the serialized state format —
    // checkpoints written by the earlier kryo-buffer build cannot be
    // resumed across the change (start streaming queries from a fresh
    // checkpoint when upgrading)
    override def bufferEncoder: Encoder[Map[String, Long]] = {
      import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
      ExpressionEncoder[Map[String, Long]]()
    }
    override def outputEncoder: Encoder[Map[String, Long]] = {
      import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
      ExpressionEncoder[Map[String, Long]]()
    }
  }

  /** Column form: count_by_value(col) → map<string,bigint>. */
  def countByValue(c: Column): Column = udaf(new CountByValue).apply(c)

  /** Register SQL names for graft UDAFs on a session. */
  def register(spark: SparkSession): Unit =
    spark.udf.register("count_by_value", udaf(new CountByValue))
}
