package graft

import graft.operators.DedupOps
import org.apache.spark.sql.SparkSession

/** Dev tool: count MinHash candidate pairs / bucket-size distribution for
  * a parameter combination (candidate-explosion hunting).
  * Usage: Probe <sfDir> <shingleSize> <numBands> <rowsPerBand> */
object Probe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, sh, nb, rpb) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        println(f"[stage ${si.stageId}%3d] tasks=${si.numTasks}%3d run=${m.executorRunTime / 1000.0}%8.1fs " +
          f"cpu=${m.executorCpuTime / 1e9}%8.1fs deser=${m.executorDeserializeTime / 1000.0}%6.1fs " +
          f"${si.name.take(60)}")
      }
    })
    if (sh == "recall" || sh == "recall_ivf") {
      import org.apache.spark.sql.functions._
      val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), graft.functions.VectorFunctions.asDouble(col("embedding")).as("vec"))
      val q = vecs.filter(col("vec_id") < 8)
      val bf = graft.operators.SimilarityOps.bruteForceTopK(vecs, q, "vec_id", "vec", 5).select("query_id", "neighbor_id")
      val approx =
        if (sh == "recall_ivf")
          graft.operators.SimilarityOps.ivfTopK(vecs, q, "vec_id", "vec", 5,
            nCells = nb.toInt, nProbe = rpb.toInt).select("query_id", "neighbor_id")
        else
          graft.operators.SimilarityOps.lshTopK(vecs, q, "vec_id", "vec", 5,
            nBits = nb.toInt, nTables = rpb.toInt).select("query_id", "neighbor_id")
      val hits = bf.join(approx, Seq("query_id", "neighbor_id"), "left_semi").count()
      println(s"recall=${hits.toDouble / 40} hits=$hits")
      spark.stop(); return
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    val t0 = System.nanoTime()
    val cands = DedupOps.minhashCandidates(docs, "text", "doc_id", sh.toInt, nb.toInt, rpb.toInt)
    println(s"candidates=${cands.count()} in ${(System.nanoTime() - t0) / 1e9}s")
    val t1 = System.nanoTime()
    val pairs = DedupOps.minhashDupPairs(docs, "text", "doc_id", 0.7, sh.toInt, nb.toInt, rpb.toInt)
    println(s"verified=${pairs.count()} in ${(System.nanoTime() - t1) / 1e9}s")
    if (sys.env.contains("EXPLAIN")) pairs.explain("formatted")
    import org.apache.spark.sql.functions._
    val sigs = DedupOps.minhashSignatures(docs, "text", "doc_id", sh.toInt, nb.toInt * rpb.toInt)
      .select(col("id"), explode(transform(sequence(lit(0), lit(nb.toInt - 1)),
        b => xxhash64(slice(col("sig"), b * rpb.toInt + 1, lit(rpb.toInt)), b))).as("band_key"))
    val dist = sigs.groupBy("band_key").count()
      .selectExpr("CASE WHEN count >= 64 THEN 64 ELSE count END AS sz")
      .groupBy("sz").count().orderBy(org.apache.spark.sql.functions.desc("sz"))
    dist.show(20, false)
    spark.stop()
  }
}
