package graft

import graft.operators.BucketOps
import org.apache.spark.sql.functions._

/** Plan-shape assertions: the properties that make queries survive a
  * 100× scale-up, locked in as CI checks so a refactor can't silently
  * reintroduce a shuffle, lose a pushed filter, or drop a broadcast.
  */
class PlanAuditSpec extends SparkSpec {
  import spark.implicits._

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("bucketed tables join with zero shuffle exchanges") {
    val orders = (0L until 1000L).map(i => (i, i % 97, s"o$i")).toDF("o_id", "cust", "tag")
    val lines = (0L until 5000L).map(i => (i % 1000, i % 97, i * 2.0)).toDF("o_id", "cust", "amt")
    BucketOps.writeBucketed(orders, "b_orders", 8, Seq("o_id"), Seq("o_id"))
    BucketOps.writeBucketed(lines, "b_lines", 8, Seq("o_id"), Seq("o_id"))
    // force the co-located SortMergeJoin path (broadcast would hide it)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = BucketOps.bucketedJoin(spark, "b_orders", "b_lines", Seq("o_id"))
      assert(joined.count() == 5000)
      assert(BucketOps.countExchanges(joined) == 0,
        s"co-bucketed join must not shuffle:\n${executedPlan(joined)}")
      // aggregation on the bucket key also rides the bucketing
      val agg = spark.table("b_lines").groupBy("o_id").agg(sum("amt"))
      agg.collect()
      assert(BucketOps.countExchanges(agg) == 0,
        s"groupBy on bucket key must not shuffle:\n${executedPlan(agg)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lines")
    }
  }

  test("mismatched bucket counts still avoid shuffling the larger side") {
    val a = (0L until 1000L).map(i => (i, s"a$i")).toDF("k", "va")
    val b = (0L until 1000L).map(i => (i, s"b$i")).toDF("k", "vb")
    BucketOps.writeBucketed(a, "b_a8", 8, Seq("k"), Seq("k"))
    BucketOps.writeBucketed(b, "b_b4", 4, Seq("k"), Seq("k"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.bucketing.coalesceBucketsInJoin.enabled", "true")
    try {
      val joined = BucketOps.bucketedJoin(spark, "b_a8", "b_b4", Seq("k"))
      assert(joined.count() == 1000)
      assert(BucketOps.countExchanges(joined) == 0,
        s"coalesced bucket join must not shuffle:\n${executedPlan(joined)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_a8")
      spark.sql("DROP TABLE IF EXISTS b_b4")
    }
  }

  test("filters and column pruning reach the parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("plan-audit").toString
    (0L until 2000L).map(i => (i, i % 50, s"n$i", i * 1.5))
      .toDF("id", "grp", "name", "score")
      .write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("grp") === 7).select("id", "score", "grp")
    q.collect()
    val scan = q.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    val meta = scan.metadata
    assert(meta("PushedFilters").contains("EqualTo(grp,7)"), s"filter not pushed: $meta")
    val readSchema = scan.requiredSchema.fieldNames.toSet
    assert(readSchema == Set("id", "score", "grp"), s"columns not pruned: $readSchema")
  }

  test("broadcast hint survives to the physical join") {
    val big = (0L until 10000L).map(i => (i, i % 100)).toDF("id", "dim_id")
    val dim = (0L until 100L).map(i => (i, s"d$i")).toDF("dim_id", "name")
    val j = big.join(broadcast(dim), "dim_id")
    j.collect()
    val plan = executedPlan(j)
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    assert(BucketOps.countExchanges(j) == 0, s"broadcast join must not shuffle the big side:\n$plan")
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    val dir = java.nio.file.Files.createTempDirectory("bloom-audit").toString
    (0L until 200000L).map(i => (i, i % 1000, i * 1.0)).toDF("id", "k", "v")
      .write.mode("overwrite").parquet(s"$dir/fact")
    (0L until 1000L).map(i => (i, s"d$i")).toDF("k", "name")
      .write.mode("overwrite").parquet(s"$dir/dim")
    // force the SMJ + runtime-filter path at toy scale
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    try {
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter(col("name") === "d7")
      val j = fact.join(dim, "k")
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("bloom"),
        s"expected a runtime bloom filter on the fact scan:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
    }
  }

  test("minhash signature pass is shuffle-free (map-side sketching)") {
    val docs = (0L until 200L).map(i => (i, s"some text body number $i repeated words")).toDF("doc_id", "text")
    val sigs = graft.operators.DedupOps.minhashSignatures(docs, "text", "doc_id", shingleSize = 3, k = 64)
    sigs.collect()
    assert(BucketOps.countExchanges(sigs) == 0,
      s"signature computation must be pure scan->project:\n${executedPlan(sigs)}")
  }
}
