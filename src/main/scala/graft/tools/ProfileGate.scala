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

    final case class J(id: Int, start: Long, var end: Long, site: String,
      stages: Seq[Int])
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    // stageId → (tasks run, max single-task ms): a job whose heavy
    // stage has 1-2 tasks is parallelism-starved no matter the cores
    val stageTasks = new java.util.concurrent.ConcurrentHashMap[Int, (Int, Long)]()
    val stageNames = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val stageWall = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    @volatile var record = false
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (record) jobs.put(j.jobId, J(j.jobId, j.time, -1L,
          Option(j.properties).flatMap(p =>
              Option(p.getProperty("callSite.short")))
            .orElse(j.stageInfos.lastOption.map(_.name))
            .getOrElse("?").linesIterator.next(),
          j.stageInfos.map(_.stageId)))
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val r = jobs.get(j.jobId); if (r != null) r.end = j.time
      }
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        if (record) {
          stageTasks.merge(s.stageInfo.stageId,
            (s.stageInfo.numTasks, 0L), (a, b) => (b._1, math.max(a._2, b._2)))
          stageNames.put(s.stageInfo.stageId,
            s.stageInfo.name.linesIterator.next())
          for (t0 <- s.stageInfo.submissionTime; t1 <- s.stageInfo.completionTime)
            stageWall.put(s.stageInfo.stageId, t1 - t0)
        }
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (record && t.taskInfo != null)
          stageTasks.merge(t.stageId, (0, t.taskInfo.duration),
            (a, b) => (a._1, math.max(a._2, b._2)))
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
          val st = j.stages.flatMap(s => Option(stageTasks.get(s)))
          val tasks = st.map(_._1).sum
          val maxTask = if (st.isEmpty) 0L else st.map(_._2).max
          println(f"[profile]   job ${j.id}%-4d wall=$wall%7.3fs gap=$gap%7.3fs tasks=$tasks%-4d maxTask=${maxTask / 1e3}%6.2fs  ${j.site}")
          if (wall >= 1.0) for (s <- j.stages.sorted) {
            val (n, mt) = Option(stageTasks.get(s)).getOrElse((0, 0L))
            val sw = Option(stageWall.get(s)).map(_ / 1e3).getOrElse(0.0)
            if (sw >= 0.3)
              println(f"[profile]     stage $s%-4d wall=$sw%7.3fs tasks=$n%-4d maxTask=${mt / 1e3}%6.2fs  ${stageNames.getOrDefault(s, "?")}")
          }
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
