package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.unsafe.types.UTF8String

import graft.expressions._

/** SQL-name registration for graft's native expressions, so
  * `spark.sql` queries can use them directly (the reference exposes
  * its function library through SQL-less expressions only; we exceed
  * it with a SQL surface).
  */
object GraftFunctions {

  private def intLit(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _)  => v
    case Literal(v: Long, _) => v.toInt
    case _ => throw new IllegalArgumentException(
      s"$name expects a literal integer, got $e")
  }

  private def longLit(e: Expression, name: String): Long = e match {
    case Literal(v: Int, _)  => v.toLong
    case Literal(v: Long, _) => v
    case _ => throw new IllegalArgumentException(
      s"$name expects a literal long, got $e")
  }

  private def stringLit(e: Expression, name: String): String = e match {
    case Literal(s: UTF8String, _) => s.toString
    case _ => throw new IllegalArgumentException(
      s"$name expects a literal string, got $e")
  }

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("simhash64",
      es => SimHash64(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("simhash64_text",
      es => SimHashText(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("simhash128_md5",
      es => SimHashMd5Wide(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("rolling_hash",
      es => RollingHash(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("dot_product",
      es => DotProduct(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("l2_normalize",
      es => L2Normalize(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("cosine_similarity",
      es => CosineSimilarity(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("shingle_hashes",
      es => ShingleHashes(es(0), intLit(es(1), "shingle_hashes")),
      "scala_udf")
    reg.createOrReplaceTempFunction("minhash_signature",
      es => MinHashSignature(es(0), intLit(es(1), "minhash_signature")),
      "scala_udf")
    reg.createOrReplaceTempFunction("hyperplane_lsh_bucket", es =>
      HyperplaneLshBucket(es(0),
        intLit(es(1), "hyperplane_lsh_bucket"),
        intLit(es(2), "hyperplane_lsh_bucket"),
        if (es.length > 3) longLit(es(3), "hyperplane_lsh_bucket") else 42L),
      "scala_udf")
    reg.createOrReplaceTempFunction("avro_decode", es =>
      graft.formats.AvroDecode(es(0), stringLit(es(1), "avro_decode")),
      "scala_udf")
    graft.operators.Udafs.register(spark)
  }
}
