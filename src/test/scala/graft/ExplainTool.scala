package graft

/** Ad-hoc plan dump: sbt "Test/runMain graft.ExplainTool <query>"
  * prints one query's formatted plan; with `--out <dir> q1 q2 ...`
  * writes <dir>/<query>.txt per query (the round-deliverable
  * before/after plan capture).
  */
object ExplainTool {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session(cores = "8", appName = "graft-explain")
    def fmt(name: String): String =
      SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    if (args.length >= 2 && args(0) == "--out") {
      val dir = java.nio.file.Paths.get(args(1))
      java.nio.file.Files.createDirectories(dir)
      args.drop(2).foreach { name =>
        try java.nio.file.Files.writeString(dir.resolve(s"$name.txt"),
          fmt(name))
        catch { case e: Throwable =>
          System.err.println(s"[explain] $name failed: ${e.getMessage}")
        }
      }
    } else {
      val name = if (args.nonEmpty) args(0) else "q23_asof_join"
      println(fmt(name))
    }
    spark.stop()
  }
}
