package graft

/** Ad-hoc plan dump: sbt "Test/runMain graft.ExplainTool <query>" */
object ExplainTool {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session(cores = "8", appName = "graft-explain")
    val name = if (args.nonEmpty) args(0) else "q23_asof_join"
    val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
