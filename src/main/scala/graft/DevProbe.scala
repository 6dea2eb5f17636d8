package graft

import graft.functions.VectorFunctions
import graft.operators.SimilarityOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch main: IVF recall sweep across (nCells, nProbe, iters)
  * sizing rules at each SF (not part of the API). */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val vecs = spark.read.parquet(s"/root/testdata/sf$sf/embeddings.parquet")
        .select(col("vec_id"), VectorFunctions.asDouble(col("embedding")).as("vec"))
      val n = vecs.count()
      val queries = vecs.filter(col("vec_id") < 8)
      val k = 5
      val bf = SimilarityOps.bruteForceTopK(vecs, queries, "vec_id", "vec", k)
        .select("query_id", "neighbor_id").cache()
      bf.count()
      for ((cells, probe, iters) <- Seq(
          (16, 8, 2), // current driver setting
          (math.max(4, math.sqrt(n).toInt), math.max(2, math.sqrt(n).toInt / 2), 2),
          (math.max(4, math.sqrt(n).toInt), math.max(2, math.sqrt(n).toInt / 2), 4),
          (math.max(4, (n / 64).toInt min math.sqrt(n).toInt), math.max(2, ((n / 64).toInt min math.sqrt(n).toInt) / 2), 4))) {
        val ivf = SimilarityOps.ivfTopK(vecs, queries, "vec_id", "vec", k,
          nCells = cells, nProbe = probe, iters = iters)
          .select("query_id", "neighbor_id")
        val hits = bf.join(ivf, Seq("query_id", "neighbor_id"), "left_semi").count()
        println(f"[ivf] sf=$sf n=$n cells=$cells probe=$probe iters=$iters recall=${hits.toDouble / (8 * k)}%.3f")
      }
      bf.unpersist()
    }
    spark.stop()
  }
}
