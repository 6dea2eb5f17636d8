package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch main: warm-JVM stage decomposition of text_line_dedup with
  * FRESH plans per measurement (no stage-skip reuse). */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-44s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }

    val d = "/root/testdata/sf0.1"
    // fresh lineage every call — defeats shuffle stage skipping
    def segs() = spark.read.parquet(s"$d/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), TextFunctions.normText(col("text")).as("norm"))
      .select(col("doc_id"), TextFunctions.tokensFromNorm(col("norm")).as("tk"))
      .select(col("doc_id"), TextFunctions.segmentsFromTokens(col("tk"), 3).as("segs"))
    def seg() = segs().select(col("doc_id"), posexplode(col("segs")).as(Seq("__pos", "__seg")))
    def dfT(s: org.apache.spark.sql.DataFrame) =
      s.groupBy(col("doc_id"), col("__seg")).agg(count(lit(1)).as("__c"))
        .groupBy("__seg").agg(count(lit(1)).as("__df"))

    time("warm tfidf")(SparkEntry.queries("text_tfidf")(spark, d).collect().length)
    time("segs project only (fresh)")(segs().select(size(col("segs"))).agg(sum("size(segs)")).collect())
    time("explode count (fresh)")(seg().count())
    time("explode count again (fresh)")(seg().count())
    time("df two-level (fresh)")(dfT(seg()).count())
    val s3 = seg()
    val boiler = dfT(s3).filter(col("__df") > 2).select("__seg")
    time("anti join (fresh, shares seg frame)")(s3.join(boiler, Seq("__seg"), "left_anti").count())
    val s4 = seg()
    val k4 = s4.join(dfT(s4).filter(col("__df") > 2).select("__seg"), Seq("__seg"), "left_anti")
    time("rebuild (fresh)")(
      k4.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("__nk"),
          array_join(transform(array_sort(collect_list(struct(col("__pos").as("p"), col("__seg").as("s")))),
            x => x.getField("s")), " ").as("__txt")).count())
    time("full line_dedup run1 (fresh plan)")(SparkEntry.queries("text_line_dedup")(spark, d).collect().length)
    time("full line_dedup run2 (fresh plan)")(SparkEntry.queries("text_line_dedup")(spark, d).collect().length)
    time("full para_dedup (fresh plan)")(SparkEntry.queries("text_para_dedup")(spark, d).collect().length)
    time("full bm25 (fresh plan)")(SparkEntry.queries("text_bm25")(spark, d).collect().length)
    time("full decontam_ngram (fresh plan)")(SparkEntry.queries("data_decontam_ngram")(spark, d).collect().length)
  }
}
