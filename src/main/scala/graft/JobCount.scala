package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev tool: count Spark JOBS a query launches (driver-sequencing view —
  * guide §1.2: every job is a full scheduling round trip, and an
  * iterative operator that pays a second convergence-scan job per round
  * shows up here even when wall-clock noise hides it).
  *
  * Usage: `sbt "runMain graft.JobCount q1,q2 /root/testdata/sf0.01"`
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = n.incrementAndGet()
    })
    val names = args(0).split(",").toSeq
    names.foreach { name =>
      n.set(0)
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      // listener events are posted async — give the bus a beat to drain
      Thread.sleep(300)
      println(f"[jobcount] $name%-24s jobs=${n.get()}")
    }
    spark.stop()
  }
}
