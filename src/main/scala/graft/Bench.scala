package graft

/** Per-round benchmark: every SparkEntry query executed to a noop sink
  * (full materialization — count() would let Catalyst elide projected
  * expressions), one warmup query for session/codegen spin-up, one
  * JSON line on stdout.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Graft.session(appName = "graft-bench")

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    run("q1_agg") // warmup (uncounted): session + codegen spin-up
    val names = SparkEntry.queries.keys.toSeq.sorted
    val results = names.map(n => n -> run(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    // a failed query must never make the headline number look better:
    // count it at 10× the slowest successful query
    val ok = results.map(_._2).filter(_ >= 0)
    val penalty = if (ok.nonEmpty) ok.max * 10 else 600.0
    val total = ok.sum + failed.size * penalty
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":${failed.mkString("[", ",", "]")},"sf":"$sfDir"}""")
    spark.stop()
  }
}
