package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run a single SparkEntry query with timing (hang hunting). */
object RunOne {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // STAGES=1: per-stage task metrics (the where-does-the-time-go view —
    // a 1-task stage with high CPU is the single-file-scan / expression-
    // blowup signature that found the dedup_semantic and data_linkage fixes)
    if (sys.env.contains("STAGES"))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val m = si.taskMetrics
          if (m.executorRunTime > 300)
            println(f"[stage ${si.stageId}%3d] tasks=${si.numTasks}%3d run=${m.executorRunTime / 1000.0}%8.1fs " +
              f"cpu=${m.executorCpuTime / 1e9}%8.1fs recs=${m.inputMetrics.recordsRead}%9d " +
              f"sread=${m.shuffleReadMetrics.recordsRead}%9d ${si.name.take(50)}")
        }
      })
    val names = if (args.isEmpty || args(0) == "all") SparkEntry.queries.keys.toSeq.sorted else args(0).split(",").toSeq
    import java.lang.management.ManagementFactory
    import scala.jdk.CollectionConverters._
    def gcMs: Long = ManagementFactory.getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    def jitMs: Long = ManagementFactory.getCompilationMXBean.getTotalCompilationTime
    def cpuMs: Long =
      ManagementFactory.getOperatingSystemMXBean.asInstanceOf[com.sun.management.OperatingSystemMXBean]
        .getProcessCpuTime / 1000000
    names.foreach { name =>
      val (gc0, jit0, cpu0) = (gcMs, jitMs, cpuMs)
      val t0 = System.nanoTime()
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        if (sys.env.contains("EXPLAIN")) {
          println(s"=== $name analysis start")
          df.explain("formatted")
          println(f"=== $name explained in ${(System.nanoTime() - t0) / 1e9}%.1fs")
        }
        if (sys.env.contains("SHUFFLES")) {
          // planned Exchange count with AQE off — the QueryPlanBudgetSpec
          // metric, for picking a pin before writing the spec entry
          spark.conf.set("spark.sql.adaptive.enabled", "false")
          val fresh = SparkEntry.queries(name)(spark, sfDir)
          println(s"[runone] $name shuffles=${graft.operators.BucketOps.countExchanges(fresh)}")
          spark.conf.set("spark.sql.adaptive.enabled", "true")
        } else if (sys.env.contains("NOOP")) {
          df.write.format("noop").mode("overwrite").save()
          println(f"[runone] $name%-24s noop     ${(System.nanoTime() - t0) / 1e9}%.1fs " +
            f"gc=${(gcMs - gc0) / 1000.0}%.1fs jit=${(jitMs - jit0) / 1000.0}%.1fs cpu=${(cpuMs - cpu0) / 1000.0}%.1fs")
        } else {
          val n = df.count()
          println(f"[runone] $name%-24s rows=$n%-8d ${(System.nanoTime() - t0) / 1e9}%.1fs")
          if (sys.env.contains("SHOW")) df.show(50, truncate = false)
        }
      } catch {
        case e: Throwable =>
          println(f"[runone] $name%-24s FAILED ${(System.nanoTime() - t0) / 1e9}%.1fs ${e.getMessage.take(200)}")
      }
    }
    spark.stop()
  }
}
