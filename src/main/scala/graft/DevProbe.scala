package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch main: print each named query's exact Exchange count with
  * AQE off (the number QueryPlanBudgetSpec pins) plus the formatted
  * physical plan on request.
  * Usage: DevProbe <query>[,query...] [explain]
  */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val explain = args.length > 1 && args(1) == "explain"
    for (q <- args(0).split(',')) {
      val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      println(s"[exchanges] $q -> ${graft.operators.BucketOps.countExchanges(df)}")
      if (explain) println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
