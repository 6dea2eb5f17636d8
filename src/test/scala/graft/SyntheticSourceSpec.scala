package graft

import graft.pipeline.Pipeline
import graft.sources.v2.{SyntheticAggScan, SyntheticScan, SyntheticTable}
import org.apache.spark.sql.functions._

class SyntheticSourceSpec extends SparkSpec {

  private val fmt = "graft.sources.v2.SyntheticTableProvider"
  private def synth(rows: Long, parts: Int) =
    spark.read.format(fmt).option("rows", rows.toString).option("partitions", parts.toString).load()

  test("generates exactly `rows` deterministic rows") {
    val df = synth(10000, 8)
    assert(df.count() == 10000)
    val r = df.filter(col("id") === 4321L).collect().head
    assert(r.getInt(1) == SyntheticTable.bucketOf(4321L))
    assert(r.getDouble(2) == SyntheticTable.valueOf(4321L))
    assert(r.getString(3) == SyntheticTable.tagOf(4321L))
    // stable across reads
    assert(synth(10000, 8).agg(sum("value")).collect().head.getDouble(0) ==
      df.agg(sum("value")).collect().head.getDouble(0))
  }

  test("id-range filters prune input partitions at the source") {
    val df = synth(100000, 100) // 1000 ids per partition
    assert(df.rdd.getNumPartitions == 100)
    val narrow = df.filter(col("id") < 1000)
    assert(narrow.rdd.getNumPartitions == 1,
      s"id<1000 must plan 1 of 100 partitions, got ${narrow.rdd.getNumPartitions}")
    assert(narrow.count() == 1000)
    val mid = df.filter(col("id") >= 50000L && col("id") < 52000L)
    assert(mid.rdd.getNumPartitions == 2)
    assert(mid.count() == 2000)
    // non-id filters stay residual and still evaluate correctly
    val resid = df.filter(col("id") < 3000 && col("bucket") === 7)
    assert(resid.rdd.getNumPartitions == 3)
    assert(resid.count() == 3000 / 32 + (if (7 < 3000 % 32) 1 else 0))
  }

  test("column pruning reaches the generator") {
    val df = synth(5000, 4).select("bucket")
    assert(df.distinct().count() == 32)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("tag"), s"pruned column must not be read:\n$plan")
  }

  test("aggregate pushdown: trillion-row grouped count/min/max answers from closed form") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val trillion = 1000000000000L
    val df = synth(trillion, 64)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min("id").as("min_id"), max("id").as("max_id"))
    // the plan must prove the pushdown BEFORE we dare execute: the scan's
    // schema is the pushed (bucket, partials…) shape, not the row schema
    val scans = df.queryExecution.sparkPlan.collect { case b: BatchScanExec => b }
    assert(scans.nonEmpty, "expected a BatchScanExec")
    assert(scans.head.scan.isInstanceOf[SyntheticAggScan],
      s"aggregation was not pushed: ${scans.head.scan.description()}")
    val rows = df.orderBy("bucket").collect()
    assert(rows.length == 32)
    assert(rows.map(_.getLong(1)).sum == trillion) // counts merge exactly
    rows.foreach { r =>
      val b = r.getInt(0)
      assert(r.getLong(1) == trillion / 32)
      assert(r.getLong(2) == b)                     // min id in bucket b
      assert(r.getLong(3) == trillion - 32 + b)     // max id in bucket b
    }
  }

  test("aggregate pushdown: ungrouped count matches, and unsupported aggs fall back") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val g = synth(1000000000L, 16).agg(count(lit(1)).as("n"))
    val scans = g.queryExecution.sparkPlan.collect { case b: BatchScanExec => b }
    assert(scans.head.scan.isInstanceOf[SyntheticAggScan])
    assert(g.collect().head.getLong(0) == 1000000000L)
    // SUM(value) is not pushable — the source must decline and the row
    // scan still answers correctly
    val f = synth(10000, 4).agg(sum("value").as("s"), count(lit(1)).as("n"))
    val fScans = f.queryExecution.sparkPlan.collect { case b: BatchScanExec => b }
    assert(fScans.head.scan.isInstanceOf[SyntheticScan],
      "mixed unsupported aggregate must fall back to the row scan")
    assert(f.collect().head.getLong(1) == 10000)
    // pushdown composes with id-range filter pushdown
    val fr = synth(100000, 100).filter(col("id") < 1000).groupBy("bucket").agg(count(lit(1)).as("n"))
    val frScans = fr.queryExecution.sparkPlan.collect { case b: BatchScanExec => b }
    assert(frScans.head.scan.isInstanceOf[SyntheticAggScan])
    assert(fr.collect().map(_.getLong(1)).sum == 1000)
  }

  test("aggregate pushdown: ungrouped agg over an EMPTY pushed range is 0/NULL, not no-rows") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    // id < 0 empties the range; the pushed COUNT's final merge is
    // SUM(partial), so the source must emit one zero partial row or the
    // global count comes back NULL (round-7 advisor finding)
    val g = synth(100000, 8).filter(col("id") < 0)
      .agg(count(lit(1)).as("n"), min("id").as("lo"), max("id").as("hi"))
    val scans = g.queryExecution.sparkPlan.collect { case b: BatchScanExec => b }
    assert(scans.head.scan.isInstanceOf[SyntheticAggScan])
    val r = g.collect().head
    assert(!r.isNullAt(0) && r.getLong(0) == 0L, s"empty-range COUNT must be 0, got $r")
    assert(r.isNullAt(1) && r.isNullAt(2), s"empty-range MIN/MAX must be NULL, got $r")
  }

  test("synth:// URI scheme reads through the pipeline") {
    val (p, _) = Pipeline.fromArgs(Seq(
      "--source", "synth:///?rows=500&partitions=4",
      "--transform",
      "sql:///" + java.net.URLEncoder.encode(
        "SELECT bucket, COUNT(*) AS n FROM source GROUP BY bucket ORDER BY bucket", "UTF-8")))
    val out = p.resultView(spark, "sink").collect()
    assert(out.length == 32 && out.map(_.getLong(1)).sum == 500)
  }
}
