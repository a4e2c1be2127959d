package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Dev profiler: job-level wall breakdown of ONE SparkEntry key.
  * Tiny-data keys are stage-count-bound (each AQE exchange
  * materializes as its own ~60-120ms job), so the first question
  * about a slow key is "how many jobs, and which are real work" —
  * this prints exactly that.
  *
  * {{{ sbt "runMain graft.Prof text_bm25_maxscore /root/testdata/sf0.1" }}}
  */
object Prof {
  def main(args: Array[String]): Unit = {
    // several keys in one JVM: last arg that looks like a path is the
    // SF dir, everything else is a key list
    val (dirs, keys0) = args.partition(_.startsWith("/"))
    val keys = if (keys0.nonEmpty) keys0.toSeq else Seq("text_bm25_maxscore")
    val sfDir = dirs.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    val jobs = new scala.collection.mutable.ArrayBuffer[(Int, Long, Long)]
    val starts = new scala.collection.mutable.HashMap[Int, Long]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = j.time
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobs += ((j.jobId, starts.getOrElse(j.jobId, j.time), j.time))
    })
    SparkEntry.primeSharedCaches(spark, sfDir)
    for (key <- keys) {
      // GRAFT_PROF_WARM=1: run the key once untimed first, so the
      // profiled run matches the bench's shipped min-of-two (lazy
      // store builds and JIT land in the warm pass, not the numbers)
      if (sys.env.get("GRAFT_PROF_WARM").contains("1"))
        SparkEntry.queries(key)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      Thread.sleep(500); jobs.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(key)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      val sum = jobs.map { case (_, s, e) => e - s }.sum / 1e3
      println(f"KEY $key WALL: $wall%.3f s, jobs: ${jobs.size}, job-time sum: $sum%.3f s")
      jobs.sortBy(_._1).foreach { case (id, s, e) =>
        println(f"  job $id%3d ${(e - s) / 1e3}%8.3f s")
      }
    }
    spark.stop()
  }
}
