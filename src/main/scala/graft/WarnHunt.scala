package graft

import org.apache.spark.sql.SparkSession

/** Tail-hygiene scanner: builds (analyzes, without executing) every
  * SparkEntry query and surfaces construction-time WARNs — the class
  * that polluted the bench tail in rounds 8-9 (trivially-true join
  * predicates, deprecated function signatures, re-registration
  * notices). Run `tools/runjava.sh graft.WarnHunt 2>&1 | grep WARN`
  * after adding queries; an empty result is the contract.
  */
object WarnHunt {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
      System.err.println(s"### building $n")
      try fn(spark, d).queryExecution.analyzed
      catch { case e: Throwable =>
        System.err.println(s"### $n failed: ${e.getMessage.take(120)}")
      }
    }
    spark.stop()
  }
}
