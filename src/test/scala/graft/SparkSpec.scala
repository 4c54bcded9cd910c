package graft

import org.apache.spark.sql.SparkSession

/** Shared session for all suites (one JVM per sbt test fork). */
trait SparkSpec {
  lazy val spark: SparkSession = Graft.session("4", "graft-test")
  val sf: String = "/root/testdata/sf0.001"
}
