package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, forcing full materialization through the `noop`
  * sink (no driver collect, no disk write), and prints one JSON line.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}"); return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    // JVM/codegen warmup on a tiny sf so measured numbers reflect steady state
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    // Each query runs twice: the first run carries its one-time plan/
    // codegen/JIT cost ("cold" — the round-1 comparable number), the
    // second is steady-state ("warm" — what a long-lived cluster session
    // pays per query). Headline total stays the cold sum.
    // per-query GC seconds (cold+warm combined): a query whose time is
    // dominated by gc — or a late-run cliff with flat gc — tells apart
    // memory pressure from external contention when a number looks off
    import scala.jdk.CollectionConverters._
    def gcSec: Double =
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum / 1000.0
    val names = SparkEntry.queries.keys.toSeq.sorted
    val results = names.map { n =>
      val g0 = gcSec
      val r = (n, runOnce(n), runOnce(n), 0.0)
      r.copy(_4 = gcSec - g0)
    }
    def jmap(f: ((String, Double, Double, Double)) => Double) =
      results.map(r => "\"" + r._1 + "\":" + f"${f(r)}%.3f").mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val totalWarm = results.map(_._3).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec",""" +
      s""""queries":${jmap(_._2)},"queries_warm":${jmap(_._3)},"queries_gc":${jmap(_._4)},""" +
      s""""total_warm":${f"$totalWarm%.3f"},"sf":"$sfDir"}""")
    spark.stop()
  }
}
