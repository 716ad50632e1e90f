package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Optimization-round profiler: run ONE named `SparkEntry.queries` entry
  * under the bench's exact session shape and split its wall time into
  * plan-construction (the eager probe/fit jobs some operators run inside
  * the query constructor) vs the timed action, with per-job wall, task
  * counts and shuffle bytes from a listener. The bench times
  * `fn(spark, sfDir)` + action as one number; this names which side owns
  * the seconds, which is the first question every optimization asks.
  *
  * Usage: runMain graft.tools.QueryProfile <sfDir> <name> [passes] [noop]
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QueryProfile <sfDir> <name> [passes] [noop]")
    val sfDir = args(0)
    val name = args(1)
    val passes = args.lift(2).flatMap(_.toIntOption).getOrElse(3)
    val noop = args.contains("noop")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class JobRec(id: Int, desc: String, start: Long,
                            var end: Long = 0L, var tasks: Int = 0,
                            var shufRead: Long = 0L, var shufWrite: Long = 0L,
                            var stages: Int = 0)
    val jobs = mutable.LinkedHashMap[Int, JobRec]()
    val stageToJob = mutable.HashMap[Int, Int]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.synchronized {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs(js.jobId) = JobRec(js.jobId, desc, js.time)
        js.stageIds.foreach(sid => stageToJob(sid) = js.jobId)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(je.jobId).foreach(_.end = je.time)
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          val m = sc.stageInfo.taskMetrics
          stageToJob.get(sc.stageInfo.stageId).flatMap(jobs.get).foreach { j =>
            j.tasks += sc.stageInfo.numTasks
            j.stages += 1
            if (m != null) {
              j.shufRead += m.shuffleReadMetrics.totalBytesRead
              j.shufWrite += m.shuffleWriteMetrics.bytesWritten
            }
          }
        }
    }

    // bench-identical warmup
    spark.range(0, 1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val fn = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'"))

    (1 to passes).foreach { p =>
      spark.sparkContext.addSparkListener(listener)
      jobs.synchronized { jobs.clear(); stageToJob.clear() }
      val t0 = System.nanoTime()
      spark.sparkContext.setJobDescription(s"$name construct")
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      spark.sparkContext.setJobDescription(s"$name action")
      if (noop) df.write.format("noop").mode("overwrite").save() else df.count()
      val t2 = System.nanoTime()
      spark.sparkContext.setJobDescription(null)
      spark.catalog.clearCache()
      val t3 = System.nanoTime()
      // give listener events a beat to drain
      Thread.sleep(200)
      spark.sparkContext.removeSparkListener(listener)
      println(f"## pass $p%d: construct ${(t1 - t0) / 1e9}%.3f s, " +
        f"action ${(t2 - t1) / 1e9}%.3f s, clearCache ${(t3 - t2) / 1e9}%.3f s, " +
        f"total ${(t3 - t0) / 1e9}%.3f s, jobs ${jobs.size}%d")
      if (p == passes) {
        jobs.synchronized {
          jobs.values.foreach { j =>
            val wall = (j.end - j.start) / 1e3
            println(f"  job ${j.id}%3d ${wall}%8.3f s stages=${j.stages}%2d " +
              f"tasks=${j.tasks}%4d shufR=${j.shufRead / 1024}%8d KiB " +
              f"shufW=${j.shufWrite / 1024}%8d KiB  ${j.desc.take(60)}%s")
          }
        }
      }
    }
    spark.stop()
  }
}
