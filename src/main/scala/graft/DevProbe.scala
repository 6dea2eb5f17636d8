package graft

import graft.operators.DedupOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch main: timing of dedup sub-stages (not part of the API). */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.wholeStage", sys.env.getOrElse("WSCG", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }

    val sigs = DedupOps.simhashSignatures(docs, "text", "doc_id").persist()
    time("simhash signatures")(println("sigs=" + sigs.count()))

    val banded = sigs.select(
      struct(col("id"), col("sig")).as("rec"),
      explode(array((0 until 4).map(j =>
        struct(lit(j).as("chunk_idx"), shiftright(col("sig"), 16 * j).bitwiseAND(0xffffL).as("chunk"))): _*)).as("cx")
    ).persist()
    time("banded")(println("banded=" + banded.count()))

    val buckets = banded
      .groupBy(col("cx.chunk_idx"), col("cx.chunk"))
      .agg(sort_array(collect_list(col("rec"))).as("recs"))
      .filter(size(col("recs")).between(2, 256)).persist()
    time("buckets")(println("buckets=" + buckets.count()))

    val prs = buckets.select(explode(org.apache.spark.sql.functions.flatten(
      transform(
        sequence(lit(1), size(col("recs")) - 1),
        i => transform(slice(col("recs"), i + 1, size(col("recs"))),
          b => struct(element_at(col("recs"), i).as("a"), b.as("b")))
      ))).as("p")).persist()
    time("pairs explode")(println("prs=" + prs.count()))

    val fin = prs.select(col("p.a.id").as("a_id"), col("p.b.id").as("b_id"),
        col("p.a.sig").as("sig_a"), col("p.b.sig").as("sig_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= 3)
    time("final")(println("fin=" + fin.count()))
    spark.stop()
  }
}
