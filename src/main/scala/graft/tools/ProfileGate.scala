package graft.tools

import org.apache.spark.sql.SparkSession

/** Job-level profile of one `SparkEntry.queries` gate: runs it twice
  * (run 1 warms JVM/codegen and any per-JVM shared fixture; run 2 is
  * measured) and prints, for the measured run, every Spark job's wall
  * clock, the DRIVER GAP since the previous job ended (scheduling +
  * driver-side work — the local-mode tax ~80 ms/job), and its call
  * site. The guide-§1 attribution step: is a 3 s gate 3 s of kernels
  * or 25 jobs × 100 ms of fixed cost?
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.tools.ProfileGate <sfDir> <query>
  */
object ProfileGate {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val fn = graft.SparkEntry.queries(name)

    final case class J(id: Int, start: Long, var end: Long, site: String)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    @volatile var record = false
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (record) jobs.put(j.jobId, J(j.jobId, j.time, -1L,
          Option(j.properties).flatMap(p =>
            Option(p.getProperty("callSite.short"))).getOrElse("?")))
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val r = jobs.get(j.jobId); if (r != null) r.end = j.time
      }
    })

    def once(tag: String, measured: Boolean): Unit = {
      val sess = spark.newSession()
      record = measured
      val t0 = System.nanoTime()
      val n = fn(sess, dir).queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      record = false
      Thread.sleep(300)
      println(f"[profile] $name $tag total=$sec%.2fs rows=$n")
      if (measured) {
        import scala.jdk.CollectionConverters._
        val js = jobs.values.asScala.toSeq.sortBy(_.start)
        var prevEnd = -1L
        var jobSum = 0.0; var gapSum = 0.0
        for (j <- js) {
          val wall = (j.end - j.start) / 1e3
          val gap = if (prevEnd < 0) 0.0 else (j.start - prevEnd) / 1e3
          jobSum += math.max(wall, 0); gapSum += math.max(gap, 0)
          println(f"[profile]   job ${j.id}%-4d wall=$wall%7.3fs gap=$gap%7.3fs  ${j.site}")
          prevEnd = math.max(prevEnd, j.end)
        }
        println(f"[profile] $name jobs=${js.size} jobWall=$jobSum%.2fs driverGaps=$gapSum%.2fs")
      }
    }
    once("warm", measured = false)
    once("measured", measured = true)
    spark.stop()
  }
}
