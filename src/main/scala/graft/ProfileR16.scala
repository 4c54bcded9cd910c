package graft

import org.apache.spark.scheduler._
import scala.collection.mutable.ArrayBuffer

/** Round-16 optimization scratch profiler (not part of the driver
  * contract): runs the named gates once each with a listener that
  * records per-job wall-clock, then prints a timeline — job spans vs
  * driver-side gaps — so per-gate cost decomposes into "Spark jobs"
  * and "driver work between jobs" without guessing.
  *
  * Usage: GRAFT_PROFILE_ONLY=t33_hashed_linear_train,s16_ann_opq \
  *        sbt -batch "runMain graft.ProfileR16"
  */
object ProfileR16 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = sys.env.getOrElse("GRAFT_PROFILE_ONLY",
      "t33_hashed_linear_train").split(",").map(_.trim).filter(_.nonEmpty)
    val reps = sys.env.getOrElse("GRAFT_PROFILE_REPS", "2").toInt
    val spark = Graft.session(appName = "graft-profile")

    case class JobRec(id: Int, t0: Long, var t1: Long = -1L,
                      var stages: Int = 0, var tasks: Int = 0,
                      desc: String = "")
    val jobs = ArrayBuffer.empty[JobRec]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized {
          jobs += JobRec(e.jobId, System.nanoTime(),
            stages = e.stageInfos.size,
            tasks = e.stageInfos.map(_.numTasks).sum)
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.find(_.id == e.jobId).foreach(_.t1 = System.nanoTime())
        }
    }
    spark.sparkContext.addSparkListener(listener)

    // warmup
    SparkEntry.queries("q1_agg")(spark, sfDir)
      .write.mode("overwrite").format("noop").save()
    SparkEntry.queries("q1_agg")(spark, sfDir)
      .write.mode("overwrite").format("noop").save()

    names.foreach { name =>
      (1 to reps).foreach { rep =>
        System.gc(); Thread.sleep(300)
        jobs.synchronized(jobs.clear())
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        val total = (System.nanoTime() - t0) / 1e9
        // settle so late listener events land
        Thread.sleep(200)
        val js = jobs.synchronized(jobs.toVector).sortBy(_.t0)
        val jobTime = js.filter(_.t1 > 0).map(j => (j.t1 - j.t0) / 1e9).sum
        println(f"== $name rep$rep: total=$total%.3f s, " +
          f"jobs=${js.size}, sum(job wall)=$jobTime%.3f s, " +
          f"driver/gaps=${total - jobTime}%.3f s")
        var prevEnd = t0
        js.foreach { j =>
          val gap = (j.t0 - prevEnd) / 1e9
          val dur = if (j.t1 > 0) (j.t1 - j.t0) / 1e9 else -1.0
          println(f"   gap=$gap%.3f s | job ${j.id}%3d dur=$dur%.3f s " +
            f"stages=${j.stages} tasks=${j.tasks}")
          if (j.t1 > prevEnd) prevEnd = j.t1
        }
        val tail = (System.nanoTime() - 200L * 1000000L - prevEnd) / 1e9
        println(f"   tail after last job=$tail%.3f s")
      }
    }
    spark.stop()
  }
}
