package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, only) = args match {
      case Array(s, o)       => (s, o, None)
      case Array(s, o, sel)  => (s, o, Some(sel.split(',').map(_.trim).toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // µs timestamps in output parquet so the DuckDB compare sees the
      // exact values Spark computed (INT96 would round-trip through ns)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // __GRAFT_OUT__ lets an oracle read auxiliary parquet that Verify
    // dumps next to the results (dedup_simhash's signature dump — the
    // DuckDB side can't replay XXH64, but it CAN compute the quadratic
    // hamming truth over the dumped signatures)
    val outAbs = new java.io.File(outDir).getAbsolutePath
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("__GRAFT_OUT__", outAbs))}" }
      .mkString("{", ",", "}")
    // written up-front so a partial run still yields a usable compare set
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // auxiliary dumps referenced by oracles (skipped under a selective
    // run that excludes their query)
    if (only.forall(_.contains("dedup_simhash"))) {
      try {
        graft.operators.DedupOps
          .simhashSignatures(spark.read.parquet(s"$sfDir/documents.parquet"), "text", "doc_id")
          .select(org.apache.spark.sql.functions.col("id"),
            org.apache.spark.sql.functions.col("sig"))
          .coalesce(1).write.mode("overwrite").parquet(s"$outDir/_aux_simhash_sigs")
        System.err.println("[verify] _aux_simhash_sigs dumped")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] _aux_simhash_sigs failed: ${e.getMessage}")
      }
    }
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        System.err.println(f"[verify] $name ok ${(System.nanoTime() - t0) / 1e9}%.1fs")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
