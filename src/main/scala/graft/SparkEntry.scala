package graft

import graft.functions.TextFunctions
import graft.functions.VectorFunctions
import graft.operators._
import graft.pipeline.{Pipeline, Uris}
import graft.streaming.StreamOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Conventions that make the DuckDB oracle hash-match exactly:
  *  - money/qty aggregates: cast each term to DECIMAL before SUM (exact,
  *    order-independent), final cast to a fixed DECIMAL type both sides;
  *  - ratios: raw doubles (identical IEEE arithmetic both sides);
  *  - every query ends in an ORDER BY on a unique key;
  *  - every computed column is aliased identically in Spark and SQL.
  */
object SparkEntry {

  private def T(s: SparkSession, dir: String, name: String): DataFrame = {
    // the events table carries TIMESTAMP(NANOS) parquet, which Spark only
    // reads as long when this legacy flag is on; evTs() converts ns → µs
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$dir/$name.parquet")
  }

  /** events.ts (long nanos) → TimestampType at µs precision (truncating,
    * same as DuckDB's CAST(TIMESTAMP_NS AS TIMESTAMP)). */
  private def evTs: Column = timestamp_micros(expr("ts div 1000"))

  /** Compute-heavy scans over the small single-file documents/embeddings
    * tables: repartition to the session's parallelism so hashing/vector
    * work uses every core (one parquet file = one scan task otherwise).
    * At production scale the scan has natural file parallelism and this
    * shuffle of raw rows is unnecessary — it exists for single-file input.
    */
  private def TP(s: SparkSession, dir: String, name: String): DataFrame =
    T(s, dir, name).repartition(s.sparkContext.defaultParallelism)

  /** SUM of a per-row term, decimal-exact internally (cast term →
    * DECIMAL(18,s), sum — order-independent, bit-exact), emitted as DOUBLE:
    * the decimal→double conversion is correctly rounded and deterministic
    * in both Spark (BigDecimal.doubleValue) and DuckDB, so hashes agree,
    * whereas DECIMAL output canonicalizes differently between a Spark
    * parquet dump and a DuckDB result (round-1 driver hash failures). */
  private def dsum(term: Column, scale: Int): Column =
    sum(term.cast(s"decimal(18,$scale)")).cast(s"decimal(38,$scale)").cast("double")

  private def revenueTerm: Column = col("l_extendedprice") * (lit(1) - col("l_discount"))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q3_join_topn")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ----- relational core -----
    "q1_agg" -> ((s, d) => {
      T(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity"), 2).as("sum_qty"),
          dsum(col("l_extendedprice"), 2).as("sum_base_price"),
          dsum(revenueTerm, 6).as("sum_disc_price"),
          round(dsum(col("l_quantity"), 2).cast("double") / count(lit(1)), 4).as("avg_qty"),
          count(lit(1)).as("count_order")
        )
        .orderBy("l_returnflag", "l_linestatus")
    }),
    "q2_pushdown" -> ((s, d) => {
      // filter+project must reach the parquet scan (PushedFilters in explain)
      T(s, d, "lineitem")
        .filter(col("l_quantity") >= 48 && col("l_discount") >= 0.08)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .orderBy("l_orderkey", "l_linenumber")
    }),
    "q3_join_topn" -> ((s, d) => {
      val cust = T(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      T(s, d, "lineitem")
        .join(T(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(dsum(revenueTerm, 6).as("revenue"))
        .select(col("o_orderkey"), col("o_orderdate").cast("date").as("o_orderdate"), col("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),
    "q4_semijoin" -> ((s, d) => {
      val late = T(s, d, "lineitem").select("l_orderkey", "l_shipdate")
      T(s, d, "orders")
        .join(late, col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),
    "q5_multijoin" -> ((s, d) => {
      val dims = broadcast(
        T(s, d, "customer")
          .join(broadcast(T(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(T(s, d, "region").filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select("c_custkey", "n_name"))
      T(s, d, "lineitem")
        .join(T(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(dims, col("o_custkey") === col("c_custkey"))
        .groupBy("n_name")
        .agg(dsum(revenueTerm, 6).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),
    "q6_selective_agg" -> ((s, d) => {
      T(s, d, "lineitem")
        .filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
            col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(
          dsum(col("l_extendedprice") * col("l_discount"), 6).as("revenue"),
          count(lit(1)).as("n"))
    }),
    "q7_window" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      T(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rn")
    }),
    "q8_distinct" -> ((s, d) => {
      T(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),
    "q9_antijoin" -> ((s, d) => {
      // customers with no urgent order (anti join on a filtered build side)
      val urgent = T(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
      T(s, d, "customer")
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("c_nationkey")
    }),
    "q10_topk" -> ((s, d) => {
      T(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    }),
    "q11_having" -> ((s, d) => {
      T(s, d, "lineitem")
        .groupBy("l_partkey")
        .agg(dsum(col("l_quantity"), 2).as("sum_qty"))
        .filter(col("sum_qty") > 900)
        .orderBy("l_partkey")
    }),
    "q12_case_agg" -> ((s, d) => {
      T(s, d, "lineitem")
        .join(T(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)).as("high_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)).as("low_count"))
        .orderBy("l_linestatus")
    }),
    "q13_outerjoin_agg" -> ((s, d) => {
      T(s, d, "customer")
        .join(T(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),
    "q14_union" -> ((s, d) => {
      val e = T(s, d, "events")
      e.filter(col("event_type").isin("click", "purchase"))
        .unionByName(e.filter(col("event_type").isin("signup", "view")))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type")
    }),
    "q15_rollup" -> ((s, d) => {
      T(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"), dsum(col("l_quantity"), 2).as("sum_qty"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),
    "q16_pivot" -> ((s, d) => {
      T(s, d, "events")
        .withColumn("cohort", pmod(col("user_id"), lit(10)))
        .groupBy("cohort")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(dsum(col("value"), 2))
        .orderBy("cohort")
    }),
    "q17_subquery" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("p_brand")
      T(s, d, "part")
        .withColumn("brand_avg",
          sum(col("p_retailprice").cast("decimal(18,2)")).over(w).cast("decimal(38,2)").cast("double")
            / count(lit(1)).over(w))
        .filter(col("p_retailprice") > col("brand_avg"))
        .select("p_partkey", "p_brand", "p_retailprice")
        .orderBy("p_partkey")
    }),
    "q19_percentile" -> ((s, d) => {
      T(s, d, "orders")
        .groupBy("o_orderstatus")
        .agg(
          expr("percentile(o_totalprice, 0.5)").as("p50"),
          expr("percentile(o_totalprice, 0.9)").as("p90"))
        .orderBy("o_orderstatus")
    }),
    "q20_approx" -> ((s, d) => {
      // approx sketch values differ across engines, so the DRIVER-checked
      // output is (exact count distinct, sketch-within-bounds booleans):
      // the exact column is fully SQL-verifiable and the booleans pin the
      // sketches against their own error guarantees (HLL rsd 5% → 15%
      // margin; approx_percentile at default accuracy → p40..p60 window)
      // two separate aggregations joined on the group key: mixing
      // countDistinct with multiple percentile buffers in ONE agg forces
      // the distinct-rewrite Expand through the object-hash aggregate
      // (measured 375s at sf0.1); split, each is a normal 1-2s shape
      val li = T(s, d, "lineitem")
      val counts = li.groupBy("l_returnflag").agg(
        countDistinct(col("l_partkey")).as("n_parts_exact"),
        approx_count_distinct(col("l_partkey")).as("approx_parts"))
      // ONE exact-percentile buffer for both bounds (array percentile):
      // each percentile(...) agg keeps its own per-group value-counts map
      // through the ObjectHashAggregate — two maps doubled the allocation
      // churn for no information gain
      val pcts = li.groupBy("l_returnflag").agg(
        expr("approx_percentile(l_extendedprice, 0.5)").as("approx_p50"),
        expr("percentile(l_extendedprice, array(0.40, 0.60))").as("p4060"))
        .select(col("l_returnflag"), col("approx_p50"),
          col("p4060")(0).as("p40"), col("p4060")(1).as("p60"))
      counts.join(pcts, "l_returnflag")
        .select(
          col("l_returnflag"),
          col("n_parts_exact"),
          (abs(col("approx_parts") - col("n_parts_exact")) <= col("n_parts_exact") * 0.15).as("parts_ok"),
          col("approx_p50").between(col("p40"), col("p60")).as("p50_ok"))
        .orderBy("l_returnflag")
    }),
    "q18_skewjoin" -> ((s, d) => {
      // skew-resilient aggregation: three grouping keys cover the whole
      // fact table (the hot-key shape); SkewOps.saltedAgg splits each key
      // over 32 salt buckets before the per-key re-aggregation, so no
      // single reducer sees a whole hot group. Result must be identical
      // to the plain groupBy — the oracle computes the plain form.
      SkewOps.saltedAgg(
        T(s, d, "lineitem").select("l_returnflag", "l_quantity"),
        Seq("l_returnflag"),
        saltBuckets = 32,
        partialAggs = Seq(
          sum(col("l_quantity").cast("decimal(18,2)")).as("ps"),
          count(lit(1)).as("pn")),
        finalAggs = Seq(
          sum("ps").cast("decimal(38,2)").cast("double").as("sum_qty"),
          sum("pn").as("n")))
        .orderBy("l_returnflag")
    }),
    "q21_cube" -> ((s, d) => {
      // CUBE: all four grouping-set combinations in one pass (Expand +
      // single shuffle), gid disambiguates the null-vs-subtotal rows
      T(s, d, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"), dsum(col("l_quantity"), 2).as("sum_qty"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),
    "q22_setops" -> ((s, d) => {
      // INTERSECT / EXCEPT (distinct set semantics, same as SQL): which
      // customers have BOTH open and finished orders vs open-only. Both
      // ops plan as hash aggregates + one shuffle on the compared column.
      val o = T(s, d, "orders")
      val open = o.filter(col("o_orderstatus") === "O").select("o_custkey")
      val fin = o.filter(col("o_orderstatus") === "F").select("o_custkey")
      open.intersect(fin).withColumn("op", lit("both"))
        .unionByName(open.except(fin).withColumn("op", lit("open_only")))
        .orderBy("op", "o_custkey")
    }),
    "q23_histogram" -> ((s, d) => {
      // fixed-width histogram: one narrow projection + tiny groupBy —
      // the profiling primitive for choosing bucket/partition bounds
      T(s, d, "lineitem")
        .select(floor(col("l_extendedprice") / lit(5000d)).cast("long").as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("n"))
        .withColumn("lo", (col("bin") * 5000).cast("double"))
        .orderBy("bin")
    }),
    "q24_stats" -> ((s, d) => {
      // deterministic corr/stddev: decimal-exact moment sums (order-
      // independent), closed-form combine in a FIXED double expression
      // the oracle mirrors token-for-token. Spark's native corr/stddev
      // accumulate doubles in partition order → not oracle-able.
      StatsOps.exactStats(T(s, d, "lineitem"), Seq("l_returnflag"),
          col("l_quantity"), col("l_extendedprice"), scale = 2)
        .orderBy("l_returnflag")
    }),
    "events_resample" -> ((s, d) => {
      // per-user hourly resample with forward fill (pandas asfreq/ffill,
      // time_bucket_gapfill): grid generated from per-key bounds — never
      // a calendar cross-join against the fact table
      val ev = T(s, d, "events").filter(col("user_id") % 10 === 0)
      ResampleOps.resampleFfill(ev, "user_id",
          expr("ts div 1000 div 3600000000"),
          Seq("sum_value" -> dsum(col("value"), 2)))
        .select("user_id", "bucket", "n", "sum_value", "gap")
        .orderBy("user_id", "bucket")
    }),
    "q25_ntile" -> ((s, d) => {
      // equi-height bucketing via NTILE — deterministic because the
      // window order is total (acctbal desc, custkey tie-break)
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      T(s, d, "customer")
        .withColumn("quartile", ntile(4).over(w))
        .groupBy("c_mktsegment", "quartile")
        .agg(count(lit(1)).as("n"), min("c_acctbal").as("min_bal"), max("c_acctbal").as("max_bal"))
        .orderBy("c_mktsegment", "quartile")
    }),
    "q26_fuzzy" -> ((s, d) => {
      // fuzzy string matching via deletion-neighborhood blocking
      // (FastSS/SymSpell): complete for edit distance ≤ 1, linear in
      // total string length — the block-join-with-levenshtein-condition
      // alternative measured 50s at sf0.1 (distance evaluated per
      // in-block pair); this runs in under a second and needs no
      // metadata block key at all, so the oracle is the FULL quadratic
      DedupOps.editDistancePairs(T(s, d, "customer"), "c_name", "c_custkey")
        .orderBy("a_id", "b_id")
    }),
    "q27_hof" -> ((s, d) => {
      // array higher-order functions: per-order quantity vector, then
      // filter/aggregate lambdas (codegen-free HOFs but integer-exact,
      // so the oracle can compute the equivalent FILTER aggregation)
      T(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_quantity").cast("int").as("q"))
        .groupBy("l_orderkey").agg(sort_array(collect_list("q")).as("qs"))
        .select(
          col("l_orderkey"),
          size(col("qs")).cast("long").as("n_items"),
          aggregate(filter(col("qs"), _ > 25), lit(0L), (acc, x) => acc + x).as("sum_hi"),
          size(filter(col("qs"), _ > 25)).cast("long").as("n_hi"))
        .orderBy("l_orderkey")
    }),
    "q28_datetime" -> ((s, d) => {
      // temporal rollup: year/month extraction + decimal-exact sums
      T(s, d, "orders")
        .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice"), 2).as("sum_price"))
        .orderBy("yr", "mo")
    }),
    "q31_rangeframe" -> ((s, d) => {
      // RANGE window frame: per-user trailing-hour running sum — value
      // depends on the ORDER-key distance, not row count (peers share
      // the frame, so ties are deterministic by construction)
      import org.apache.spark.sql.expressions.Window
      val e = T(s, d, "events").filter(col("user_id") % 20 === 0)
        .select(col("user_id"), col("event_id"), expr("ts div 1000000000").as("ts_s"), col("value"))
      val w = Window.partitionBy("user_id").orderBy(col("ts_s")).rangeBetween(-3600, 0)
      e.withColumn("w_sum",
          sum(col("value").cast("decimal(18,2)")).over(w).cast("decimal(38,2)").cast("double"))
        .withColumn("w_n", count(lit(1)).over(w))
        .drop("value")
        .orderBy("user_id", "ts_s", "event_id")
    }),
    "q32_lateral" -> ((s, d) => {
      // LATERAL correlated subquery: per nation, its top-2 customers by
      // balance — the SQL-level form of per-key top-k (same semantics
      // capPerKey gives the DataFrame API)
      T(s, d, "nation").createOrReplaceTempView("graft_nation")
      T(s, d, "customer").createOrReplaceTempView("graft_customer")
      s.sql("""SELECT n.n_name, t.c_custkey, t.c_acctbal
              |FROM graft_nation n,
              | LATERAL (SELECT c_custkey, c_acctbal FROM graft_customer c
              |          WHERE c.c_nationkey = n.n_nationkey
              |          ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
              |ORDER BY n.n_name, t.c_custkey""".stripMargin)
    }),
    "q29_nullsafe" -> ((s, d) => {
      // null-safe equality join (<=>): the null bucket matches the null
      // dim row instead of disappearing — the classic silent-data-loss
      // gap between = and IS NOT DISTINCT FROM
      import s.implicits._
      val e = T(s, d, "events")
        .withColumn("bucket", expr("nullif(pmod(user_id, 4), 3)"))
      val dim = Seq((Option(0L), "a"), (Option(1L), "b"), (Option(2L), "c"), (Option.empty[Long], "nul"))
        .toDF("bucket", "tag")
      e.join(broadcast(dim), e("bucket") <=> dim("bucket"))
        .groupBy("tag")
        .agg(count(lit(1)).as("n"), dsum(col("value"), 2).as("sum_value"))
        .orderBy("tag")
    }),
    "q30_stragg" -> ((s, d) => {
      // ordered string aggregation (LISTAGG): deterministic via sorted
      // distinct set — one shuffle, tiny output
      T(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          array_join(array_sort(collect_set(col("l_linestatus"))), ",").as("statuses"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),
    "data_weighted" -> ((s, d) => {
      // quality-weighted deterministic sampling: keep probability
      // ∝ n_chars (md5-uniform u < weight) — retry-stable, no RNG state
      val u = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long").cast("double") / lit(4294967296.0)
      val w = least(lit(1.0), col("n_chars").cast("double") / lit(600.0))
      TP(s, d, "documents").filter(u < w)
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    }),
    "data_topk_sample" -> ((s, d) => {
      // exact-k deterministic uniform sample: global top-k by md5 order
      // (TakeOrdered — per-partition heads then one merge, no full sort)
      TP(s, d, "documents")
        .select(col("doc_id"), md5(col("doc_id").cast("string")).as("h"))
        .orderBy("h").limit(100)
        .orderBy("doc_id")
    }),
    "graph_pagerank_check" -> ((s, d) => {
      // driver-checkable PageRank invariants (decimal ranks have no cheap
      // DuckDB twin — replicating Spark's decimal-division rounding in
      // another engine is exactly the nondeterminism PageRank here
      // avoids): on a deterministic graph derived from customer,
      // (a) node coverage is data-derived identically in both engines,
      // (b) every rank is positive, (c) total mass ≤ 1 (dangling nodes
      // leak, never create, mass), (d) a SECOND independent run returns
      // bit-identical ranks — the replay-stability property the decimal
      // arithmetic exists for (a double PageRank fails this).
      val edges = T(s, d, "customer")
        .select((col("c_custkey") % 25).as("src"), col("c_nationkey").cast("long").as("dst"))
        .filter(col("src") =!= col("dst")).distinct()
      val pr1 = GraphOps.pageRank(edges, "src", "dst", iterations = 3)
      val pr2 = GraphOps.pageRank(edges, "src", "dst", iterations = 3)
      val drift = pr1.join(pr2, Seq("id", "rank"), "left_anti")
        .agg(count(lit(1)).as("n_drift"))
      pr1.agg(
          count(lit(1)).as("n_nodes"),
          bool_and(col("rank") > 0).as("all_positive"),
          // ≤ 1 + rounding slack: each scale-18 HALF_UP division can round
          // up by 5e-19, so total mass may exceed 1 by a few ULPs even
          // though the dangling leak only ever removes mass
          (sum(col("rank")) <= lit(BigDecimal("1.000000001")).cast("decimal(38,18)")).as("mass_bounded"))
        .crossJoin(drift)
        .select(col("n_nodes"), col("all_positive"), col("mass_bounded"),
          (col("n_drift") === 0).as("replay_stable"))
    }),
    "write_metrics_check" -> ((s, d) => {
      // observe-metrics write (row 90): the metrics the WRITE JOB itself
      // reports (no second scan) must equal what the oracle computes from
      // the table — n_rows and a decimal-exact price sum
      val dir = java.nio.file.Files.createTempDirectory("graft-obs").toString
      val m = WriteOps.writeWithMetrics(
        T(s, d, "orders").select("o_orderkey", "o_totalprice"), dir,
        "n_rows" -> count(lit(1)),
        "sum_price" -> dsum(col("o_totalprice"), 2))
      import s.implicits._
      Seq((m("n_rows").asInstanceOf[Long], m("sum_price").asInstanceOf[Double]))
        .toDF("n_rows", "sum_price")
    }),
    "write_compact_check" -> ((s, d) => {
      // compaction write-layout invariant (row 79's second half): rewrite
      // to exactly 3 round-robin files, no rows lost, every file within
      // the maxRecordsPerFile cap — the small-file-problem remedy as a
      // driver-checkable row
      val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
      WriteOps.compact(T(s, d, "orders").select("o_orderkey", "o_totalprice"),
        dir, numFiles = 3, maxRecordsPerFile = 1000000L)
      s.read.parquet(dir)
        .groupBy(input_file_name().as("f")).agg(count(lit(1)).as("n"))
        .agg(
          count(lit(1)).as("n_files"),
          sum("n").as("n_rows"),
          bool_and(col("n") <= 1000000L).as("within_cap"))
    }),
    "write_zorder_check" -> ((s, d) => {
      // driver-checkable z-order WRITE-LAYOUT invariant (the dedup_simhash
      // _check pattern — the write itself has no DuckDB twin, but its
      // data-skipping guarantee does): after zorderBy into 4 files, the
      // per-file z-ranges must be pairwise DISJOINT (that disjointness IS
      // the min/max pruning property readers skip files by) and no rows
      // may be lost. The oracle states n_files/disjointness as constants
      // and derives n_rows from the table.
      val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
      val base = T(s, d, "part").select(
        pmod(col("p_partkey"), lit(256)).cast("int").as("za"),
        pmod(col("p_size"), lit(256)).cast("int").as("zb"))
      WriteOps.zorderBy(base, "za", "zb", numFiles = 4, bits = 8)
        .write.mode("overwrite").parquet(dir)
      val perFile = s.read.parquet(dir)
        .withColumn("z", WriteOps.interleaveBits(col("za"), col("zb"), 8))
        .groupBy(input_file_name().as("f"))
        .agg(min("z").as("zmin"), max("z").as("zmax"), count(lit(1)).as("n"))
      // pairwise-disjoint via a tiny self-join on the ONE-ROW-PER-FILE
      // frame (4 rows → broadcast NLJ) instead of a lead() over a global
      // Window, which emitted the "moving all data to a single partition"
      // warning into the driver-parsed log tail on every bench run
      val a = perFile.select(col("f").as("af"), col("zmin").as("amin"), col("zmax").as("amax"))
      val b = perFile.select(col("f").as("bf"), col("zmin").as("bmin"), col("zmax").as("bmax"))
      val overlaps = a.join(b,
          col("af") < col("bf") && col("amin") <= col("bmax") && col("bmin") <= col("amax"))
        .agg(count(lit(1)).as("n_overlap"))
      perFile.agg(count(lit(1)).as("n_files"), sum("n").as("n_rows"))
        .crossJoin(overlaps) // 1-row × 1-row scalar attach
        .select(col("n_files"), (col("n_overlap") === 0).as("ranges_disjoint"), col("n_rows"))
    }),
    "events_scd2" -> ((s, d) => {
      // SCD2 history compression: per-user state intervals from an event
      // log — change rows survive (lag filter), validity closes at the
      // next change (lead after the filter). Two windows over one sort.
      import org.apache.spark.sql.expressions.Window
      val e = T(s, d, "events").filter(col("user_id") % 10 === 0)
        .select(col("user_id"), col("event_id"), expr("ts div 1000").as("ts_us"), col("event_type"))
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val changes = e
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      changes
        .withColumn("valid_to", lead(col("ts_us"), 1).over(w))
        .select(col("user_id"), col("event_type"), col("ts_us").as("valid_from"), col("valid_to"))
        .orderBy("user_id", "valid_from")
    }),
    "events_funnel_conv" -> ((s, d) => {
      // funnel conversion: first click → earliest purchase at-or-after
      // it, per user. One tiny agg per stage + a key join — no window
      // over the raw log, no cross product.
      val e = T(s, d, "events")
        .select(col("user_id"), expr("ts div 1000").as("ts_us"), col("event_type"))
      val fc = e.filter(col("event_type") === "click")
        .groupBy("user_id").agg(min("ts_us").as("first_click_us"))
      val p = e.filter(col("event_type") === "purchase").select(col("user_id"), col("ts_us").as("pts"))
      fc.join(p, fc("user_id") === p("user_id") && col("pts") >= col("first_click_us"), "left")
        .groupBy(fc("user_id"), col("first_click_us"))
        .agg(min("pts").as("first_purchase_us"))
        .withColumn("converted", col("first_purchase_us").isNotNull)
        .orderBy("user_id")
    }),
    "events_intervals" -> ((s, d) => {
      // interval union per user (gaps-and-islands): each event opens a
      // 10-minute activity window; overlapping windows collapse into
      // maximal spans — one sort, two window passes, one aggregation
      val iv = T(s, d, "events").filter(col("user_id") % 10 === 0)
        .select(col("user_id"),
          expr("ts div 1000").as("s_us"),
          (expr("ts div 1000") + lit(600000000L)).as("e_us"))
      IntervalOps.mergeIntervals(iv, "user_id", "s_us", "e_us")
        .select(col("user_id"), col("island"), col("s").as("s_us"), col("e").as("e_us"), col("n"))
        .orderBy("user_id", "island")
    }),
    "events_range_join" -> ((s, d) => {
      // point-in-interval attribution via the bucketized range join (no
      // cross product): 50 deterministic overlapping 21h windows stepped
      // every 14h across the events month, built identically in DuckDB
      val baseUs = 1704067200000000L // 2024-01-01T00:00:00Z
      val stepUs = 50400000000L      // 14 h
      val lenUs = 75600000000L       // 21 h
      val iv = s.range(50).select(
        col("id").as("interval_id"),
        (lit(baseUs) + col("id") * stepUs).as("s_us"),
        (lit(baseUs) + col("id") * stepUs + lenUs).as("e_us"))
      val ev = T(s, d, "events").select(expr("ts div 1000").as("ts_us"), col("value"))
      JoinOps.rangeJoin(ev, iv, Nil, "ts_us", "s_us", "e_us", bucketWidth = lenUs)
        .groupBy("interval_id")
        .agg(count(lit(1)).as("n_events"), dsum(col("value"), 2).as("sum_value"))
        .orderBy("interval_id")
    }),
    "events_range_join_rule" -> ((s, d) => {
      // the RangeJoinBucketing optimizer rule, driver-verified: this is
      // the PLAIN inequality-join SQL (which Spark would nested-loop);
      // the injected rule rewrites it to the bucketized equi-join at
      // optimization time and the result must still hash-match the same
      // DuckDB oracle as the hand-bucketized events_range_join. The conf
      // stays set for the session: the rule's pattern guard makes it a
      // no-op for every other query shape (incl. the manual rangeJoin,
      // whose __graft_* bucket columns mark it already-bucketized).
      if (!s.experimental.extraOptimizations.contains(graft.plans.RangeJoinBucketing))
        s.experimental.extraOptimizations =
          s.experimental.extraOptimizations :+ graft.plans.RangeJoinBucketing
      s.conf.set(graft.plans.RangeJoinBucketing.WidthConf, "75600000000")
      val baseUs = 1704067200000000L
      val stepUs = 50400000000L
      val lenUs = 75600000000L
      s.range(50).select(
        col("id").as("interval_id"),
        (lit(baseUs) + col("id") * stepUs).as("s_us"),
        (lit(baseUs) + col("id") * stepUs + lenUs).as("e_us"))
        .createOrReplaceTempView("graft_rj_iv")
      T(s, d, "events").select(expr("ts div 1000").as("ts_us"), col("value"))
        .createOrReplaceTempView("graft_rj_ev")
      s.sql("""SELECT interval_id, COUNT(*) AS n_events,
              | CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_value
              |FROM graft_rj_iv JOIN graft_rj_ev ON ts_us >= s_us AND ts_us < e_us
              |GROUP BY interval_id ORDER BY interval_id""".stripMargin)
    }),
    "asof_join" -> ((s, d) => {
      val orders = T(s, d, "orders")
        .withColumn("cutoff", col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .select("o_orderkey", "cutoff")
      val line = T(s, d, "lineitem").select(col("l_orderkey").as("o_orderkey"), col("l_shipdate"))
      JoinOps
        .asofBackward(orders, line, Seq("o_orderkey"), "cutoff", "l_shipdate",
          Map("l_shipdate" -> "asof_shipdate"))
        .select(col("o_orderkey"), unix_micros(col("asof_shipdate").cast("timestamp")).as("asof_us"))
        .orderBy("o_orderkey")
    }),
    "asof_join_fwd" -> ((s, d) => {
      // forward direction of the same as-of machinery: earliest shipment
      // at-or-after the cutoff per order (DuckDB twin: MIN over >= join)
      val orders = T(s, d, "orders")
        .withColumn("cutoff", col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .select("o_orderkey", "cutoff")
      val line = T(s, d, "lineitem").select(col("l_orderkey").as("o_orderkey"), col("l_shipdate"))
      JoinOps
        .asofForward(orders, line, Seq("o_orderkey"), "cutoff", "l_shipdate",
          Map("l_shipdate" -> "asof_shipdate"))
        .select(col("o_orderkey"), unix_micros(col("asof_shipdate").cast("timestamp")).as("asof_us"))
        .orderBy("o_orderkey")
    }),
    "asof_join_tol" -> ((s, d) => {
      // merge_asof tolerance, driver-oracled: latest shipment ≤ cutoff is
      // nulled when >30d before it — equivalently (backward direction ⇒
      // monotone distance) the MAX over the [cutoff−30d, cutoff] window,
      // which a plain SQL LEFT JOIN + MAX expresses exactly
      val orders = T(s, d, "orders")
        .withColumn("cutoff", col("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .select("o_orderkey", "cutoff")
      val line = T(s, d, "lineitem").select(col("l_orderkey").as("o_orderkey"), col("l_shipdate"))
      JoinOps.asofJoin(orders, line, Seq("o_orderkey"), "cutoff", "l_shipdate",
          Map("l_shipdate" -> "asof_shipdate"), forward = false, tolerance = Some(30L * 86400))
        .select(col("o_orderkey"), unix_micros(col("asof_shipdate").cast("timestamp")).as("asof_us"))
        .orderBy("o_orderkey")
    }),
    "asof_join_nearest" -> ((s, d) => {
      // nearest as-of (pandas direction='nearest'): closest shipment to
      // the cutoff in EITHER direction, ties → backward; composed from
      // the two directional union+window passes — still two keyed
      // shuffles, zero range cross-products
      val orders = T(s, d, "orders")
        .withColumn("cutoff", col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .select("o_orderkey", "cutoff")
      val line = T(s, d, "lineitem").select(col("l_orderkey").as("o_orderkey"), col("l_shipdate"))
      JoinOps.asofNearest(orders, line, Seq("o_orderkey"), "cutoff", "l_shipdate",
          Map("l_shipdate" -> "asof_shipdate"))
        .select(col("o_orderkey"), unix_micros(col("asof_shipdate").cast("timestamp")).as("asof_us"))
        .orderBy("o_orderkey")
    }),
    "events_retention" -> ((s, d) => {
      // cohort retention matrix (cohort week × week offset → active
      // fraction): two partial-agged aggregations + user-keyed join, the
      // cohort-size table rides back small (AQE broadcast) — no
      // self-join over the raw log, no window
      val uw = T(s, d, "events")
        .select(col("user_id"), expr("ts div 1000 div 604800000000").as("week"))
        .distinct()
      val cohort = uw.groupBy("user_id").agg(min("week").as("cohort_week"))
      val sizes = cohort.groupBy("cohort_week").agg(count(lit(1)).as("n_cohort"))
      uw.join(cohort, "user_id")
        .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
        .agg(count(lit(1)).as("n_active"))
        .join(sizes, "cohort_week")
        .withColumn("retention", col("n_active").cast("double") / col("n_cohort").cast("double"))
        .orderBy("cohort_week", "week_offset")
    }),
    "events_sessionize" -> ((s, d) => {
      SessionOps
        .sessionize(T(s, d, "events").withColumn("ts", evTs), "user_id", "ts", gapSeconds = 1800)
        .orderBy("user_id", "session_idx")
    }),
    "events_window_agg" -> ((s, d) => {
      T(s, d, "events")
        .groupBy(unix_micros(date_trunc("hour", evTs)).as("hour_us"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value"), 2).as("sum_value"))
        .orderBy("hour_us")
    }),
    "events_stream_join_twin" -> ((s, d) => {
      // batch twin of StreamOps.streamStreamJoin — the SAME code path
      // (batch analysis eliminates the watermark nodes), so the driver
      // oracle pins the time-bounded join semantics and the streaming
      // spec keeps the incremental/state side: purchases within 1 hour
      // at-or-after a click by the same user
      val e = T(s, d, "events")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), evTs.as("click_ts"), col("event_id").as("click_id"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), evTs.as("purchase_ts"), col("event_id").as("purchase_id"))
      StreamOps.streamStreamJoin(clicks, purchases, Seq("user_id"),
          "click_ts", "purchase_ts", watermarkDelay = "10 minutes", maxDelay = "1 hour")
        .select(col("user_id"), col("click_id"), col("purchase_id"),
          unix_micros(col("click_ts")).as("click_us"),
          unix_micros(col("purchase_ts")).as("purchase_us"))
        .orderBy("user_id", "click_id", "purchase_id")
    }),
    "events_json" -> ((s, d) => {
      T(s, d, "events")
        .withColumn("k", regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).cast("int"))
        .groupBy("k")
        .agg(count(lit(1)).as("n"))
        .orderBy("k")
    }),

    // ----- ETL pipeline surface -----
    "pipeline_sql" -> ((s, _) => {
      val (p, _) = Pipeline.fromArgs(Seq(
        "--source", "values:///?header=a:int,b&values=1,x;2,y;3,x",
        "--transform",
        "sql:///" + java.net.URLEncoder.encode(
          "SELECT b, CAST(SUM(a) AS BIGINT) AS sum_a FROM source GROUP BY b ORDER BY b", "UTF-8")))
      p.resultView(s, "sink")
    }),
    "pipeline_values" -> ((s, _) => {
      // unnamed source defaults to view "source"; the implicit identity
      // transform renames it to "sink" (reference ETL.run behavior)
      val (p, _) = Pipeline.fromArgs(Seq(
        "--source", "values:///?header=id:int,name,score:double&values=1,ada,9.5;2,bob,7.25"))
      p.resultView(s, "sink").orderBy("id")
    }),
    "pipeline_sql_file" -> ((s, d) => {
      val f = java.nio.file.Files.createTempFile("graft", ".sql")
      java.nio.file.Files.writeString(
        f, "SELECT l_returnflag, COUNT(*) AS n FROM source GROUP BY l_returnflag ORDER BY l_returnflag")
      val (p, _) = Pipeline.fromArgs(Seq(
        "--source", s"parquet://$d/lineitem.parquet",
        "--transform", s"sql-file://$f"))
      p.resultView(s, "sink")
    }),
    "pipeline_identity" -> ((s, d) => {
      val (p, _) = Pipeline.fromArgs(Seq(
        "--source", s"regions+parquet://$d/region.parquet",
        "--transform", "regions+renamed+identity:///"))
      p.resultView(s, "renamed").orderBy("r_regionkey")
    }),
    "pipeline_csv_roundtrip" -> ((s, d) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-csv").toString
      val (write, _) = Pipeline.fromArgs(Seq(
        "--source", s"parquet://$d/region.parquet",
        "--transform", "source+sink+identity:///",
        "--sink", s"text://$tmp/region.csv"))
      write.run(s)
      val (read, _) = Pipeline.fromArgs(Seq("--source", s"text://$tmp/region.csv"))
      read.resultView(s, "source").orderBy("r_regionkey")
    }),
    "flatten_struct" -> ((s, d) => {
      val nested = T(s, d, "events").select(
        col("event_id"),
        struct(col("event_type"), col("value"), struct(col("user_id")).as("u")).as("ev"))
      FlattenOps.flatten(nested).orderBy("event_id")
    }),
    "flatten_explode" -> ((s, d) => {
      val docs = T(s, d, "documents").select(TextFunctions.tokens(col("text")).as("token"))
      FlattenOps
        .flattenExplode(docs)
        .groupBy("token")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(20)
    }),
    "diff_tables" -> ((s, d) => {
      val left = T(s, d, "orders")
      val right = left
        .filter(col("o_orderkey") % 97 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 100 === 0, col("o_totalprice") + 10).otherwise(col("o_totalprice")))
        .withColumn("o_orderkey",
          when(col("o_orderkey") % 500 === 0, col("o_orderkey") + 1000000).otherwise(col("o_orderkey")))
      DiffOps
        .onlyDifferences(DiffOps.diff(left, right, Seq("o_orderkey")))
        .select("diff", "o_orderkey", "left_o_totalprice", "right_o_totalprice")
        .orderBy("o_orderkey", "diff")
    }),

    "merge_upsert" -> ((s, d) => {
      // CDC apply over orders: keys %100 get a price bump (update), keys
      // %97 are tombstoned (delete), keys %500 re-insert under +2000000
      // (insert); the merged snapshot is aggregated for a compact oracle
      val base = T(s, d, "orders")
      val mods = base
        .filter(col("o_orderkey") % 100 === 0 || col("o_orderkey") % 97 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 10)
        .withColumn("__delete", col("o_orderkey") % 97 === 0)
      val inserts = base.filter(col("o_orderkey") % 500 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 2000000)
        .withColumn("__delete", lit(false))
      DiffOps.merge(base, mods.unionByName(inserts), Seq("o_orderkey"), deleteCol = Some("__delete"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice"), 2).as("sum_price"))
        .orderBy("o_orderstatus")
    }),

    // ----- LLM-pipeline: dedup -----
    "dedup_exact" -> ((s, d) => {
      val docs = TP(s, d, "documents")
      val doubled = docs.unionByName(docs.withColumn("doc_id", col("doc_id") + 1000000))
      DedupOps.exact(doubled, "text", "doc_id").orderBy("keep_id")
    }),
    "dedup_minhash" -> ((s, d) => {
      // SQL-oracled: banding recall at j≥0.7 with 32 bands × 3 rows is
      // 1-(1-0.7³)^32 ≈ 1-1.4e-6 per pair, so the verified output equals
      // the full quadratic Jaccard pair set the DuckDB oracle computes.
      // rows=2 was too loose here: background 2-gram jaccard ≈ 0.1 made
      // ~10% of ALL pairs candidates (measured 91s/1778s CPU at sf0.1)
      DedupOps
        .minhashDupPairs(TP(s, d, "documents"), "text", "doc_id", threshold = 0.7,
          shingleSize = 2, numBands = 32, rowsPerBand = 3)
        .orderBy("a_id", "b_id")
    }),
    "dedup_incremental" -> ((s, d) => {
      // incremental dedup (daily-delta shape): base corpus (¾ of docs)
      // indexed ONCE into bucketed band/sig tables, then the new batch
      // (doc_id % 4 == 0) probed against the index — pairs touching at
      // least one new doc. Same band params as dedup_minhash, so the
      // verified output equals the quadratic oracle restricted to
      // new×all (per-pair recall 1-(1-0.7³)^32 ≈ 1-1.4e-6).
      val docs = TP(s, d, "documents")
      val isNew = col("doc_id") % 4 === 0
      val idx = IncrementalDedupOps.buildIndex(docs.filter(!isNew), "text", "doc_id",
        prefix = "graft_inc_idx", numBuckets = 8, shingleSize = 2, numBands = 32, rowsPerBand = 3)
      IncrementalDedupOps.probe(docs.filter(isNew), "text", "doc_id", idx, threshold = 0.7,
          shingleSize = 2, numBands = 32, rowsPerBand = 3)
        .orderBy("a_id", "b_id")
    }),
    "dedup_simhash" -> ((s, d) => {
      DedupOps
        .simhashDupPairs(TP(s, d, "documents"), "text", "doc_id", maxHamming = 3)
        .orderBy("a_id", "b_id")
    }),
    "dedup_ngram_jaccard" -> ((s, d) => {
      // candidates from MinHash bands (no self-join, no skewed metadata
      // block key), verified by exact 3-gram Jaccard ≥ 0.8; band recall
      // 1-(1-0.8³)^16 ≈ 1-1e-5 per pair → output equals the quadratic
      // Jaccard pair set the oracle computes
      DedupOps
        .minhashDupPairs(TP(s, d, "documents"), "text", "doc_id", threshold = 0.8,
          shingleSize = 3, numBands = 16, rowsPerBand = 3)
        .orderBy("a_id", "b_id")
    }),
    "dedup_containment" -> ((s, d) => {
      // asymmetric doc-in-doc duplication: containment = |A∩B|/min sizes,
      // rare-shingle inverted-index blocking (complete for any pair
      // sharing a df≤20 shingle; the oracle replicates the same rule)
      DedupOps.containmentPairs(TP(s, d, "documents"), "text", "doc_id",
          threshold = 0.9, shingleSize = 3, maxDf = 20)
        .orderBy("a_id", "b_id")
    }),
    "dedup_embedding" -> ((s, d) => {
      // LSH-bucket blocking (no label/metadata dependence): near-parallel
      // vectors keep identical hyperplane signs, so every cosine≥0.999
      // pair lands in a shared bucket and the output equals the quadratic
      // cosine pair set the oracle computes
      val vecs = TP(s, d, "embeddings")
        .select(col("vec_id"), VectorFunctions.asDouble(col("embedding")).as("vec"))
      val scaled = vecs
        .withColumn("vec_id", col("vec_id") + 100000)
        .withColumn("vec", transform(col("vec"), x => x * 1.001))
      SimilarityOps
        .embeddingDupPairsLsh(vecs.unionByName(scaled), "vec_id", "vec", threshold = 0.999)
        .orderBy("a_id", "b_id")
    }),

    "vec_quantize" -> ((s, d) => {
      // int8 scalar quantization of the embedding table (4× storage cut)
      // + reconstruction error, both engines computing the identical
      // arithmetic: per-vector min/max, codes = round((x-lo)·255/range),
      // max |x − dequant(x)| per vector
      val vecs = TP(s, d, "embeddings")
        .select(col("vec_id"), VectorFunctions.asDouble(col("embedding")).as("vec"))
      val q = vecs.withColumn("q", VectorFunctions.quantize8(col("vec")))
      q.select(
        col("vec_id"),
        col("q.lo").as("lo"),
        col("q.hi").as("hi"),
        array_max(zip_with(col("vec"), VectorFunctions.dequantize8(col("q")),
          (a, b) => abs(a - b))).as("max_abs_err"))
        .orderBy("vec_id")
    }),

    // ----- LLM-pipeline: similarity search -----
    "ann_bruteforce" -> ((s, d) => {
      val vecs = TP(s, d, "embeddings")
        .select(col("vec_id"), VectorFunctions.asDouble(col("embedding")).as("vec"))
      SimilarityOps
        .bruteForceTopK(vecs, vecs.filter(col("vec_id") < 8), "vec_id", "vec", k = 5)
        .orderBy("query_id", "rank")
    }),
    "ann_lsh" -> ((s, d) => {
      // LSH result rows depend on the hash buckets (not SQL-replicable),
      // so the DRIVER-checked output is the recall-vs-brute-force
      // invariant as data: one row the DuckDB oracle states as constants.
      // Exact top-k rows are exercised by the ScalaTest recall spec.
      val vecs = TP(s, d, "embeddings")
        .select(col("vec_id"), VectorFunctions.asDouble(col("embedding")).as("vec"))
      val queries = vecs.filter(col("vec_id") < 8)
      val k = 5
      val bf = SimilarityOps.bruteForceTopK(vecs, queries, "vec_id", "vec", k)
        .select("query_id", "neighbor_id")
      // Hamming-1 multi-probe at nBits=5/nTables=8: per-table hit prob
      // rises p⁵ → p⁵+5p⁴(1-p), so FEWER tables than the old single-probe
      // nTables=12 while recall clears 0.8 with margin (measured ≥0.9 at
      // sf0.01/sf0.1, ≥0.97 at sf0.001, on this corpus's ~0.4-cosine
      // neighbor geometry; the old setup measured 0.65-0.70 vs a 0.5 bar)
      val lsh = SimilarityOps.lshTopK(vecs, queries, "vec_id", "vec", k,
          nBits = 5, nTables = 8, multiProbe = true)
        .select("query_id", "neighbor_id")
      bf.join(lsh, Seq("query_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("hits"))
        .select(
          lit(8L).as("n_queries"),
          (col("hits").cast("double") / (8 * k) >= 0.8).as("recall_ok"))
    }),
    "ann_ivf" -> ((s, d) => {
      // IVF coarse-quantization ANN (the nProbe/nCells scan-fraction knob);
      // like ann_lsh, driver-checked via the recall-vs-brute-force
      // invariant; exact rows pinned by the ScalaTest recall spec.
      // Round 5: √n adaptive sizing (ivfTopKAuto) replaced the fixed
      // 16-cell index whose centroids were noisy at 500 vectors —
      // measured recall@5 0.825/0.95/0.85 at sf0.001/0.01/0.1
      // (deterministic), so the invariant rises 0.7 → 0.8
      val vecs = TP(s, d, "embeddings")
        .select(col("vec_id"), VectorFunctions.asDouble(col("embedding")).as("vec"))
      val queries = vecs.filter(col("vec_id") < 8)
      val k = 5
      val bf = SimilarityOps.bruteForceTopK(vecs, queries, "vec_id", "vec", k)
        .select("query_id", "neighbor_id")
      val ivf = SimilarityOps.ivfTopKAuto(vecs, queries, "vec_id", "vec", k)
        .select("query_id", "neighbor_id")
      bf.join(ivf, Seq("query_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("hits"))
        .select(
          lit(8L).as("n_queries"),
          (col("hits").cast("double") / (8 * k) >= 0.8).as("recall_ok"))
    }),

    // ----- LLM-pipeline: text analysis -----
    // All text queries materialize (norm, tokens) ONCE as aliased columns
    // in a staged select: an alias referenced more than once is not
    // re-inlined by CollapseProject, so the regexp tokenizer runs once per
    // row instead of once per use site and codegen classes stay small
    // (round 1 inlined it up to ~10×/row).
    "text_tokens" -> ((s, d) => {
      TP(s, d, "documents")
        .select(col("doc_id"), col("text"), TextFunctions.normText(col("text")).as("norm"))
        .select(col("doc_id"), col("text"), TextFunctions.tokensFromNorm(col("norm")).as("tk"))
        .select(
          col("doc_id"),
          size(col("tk")).cast("long").as("n_ws"),
          TextFunctions.bpeTokenCount(col("text")).cast("long").as("n_bpe"))
        .orderBy("doc_id")
    }),
    "text_quality" -> ((s, d) => {
      TP(s, d, "documents")
        .select(col("doc_id"), TextFunctions.normText(col("text")).as("norm"))
        .select(col("doc_id"), col("norm"), TextFunctions.tokensFromNorm(col("norm")).as("tk"))
        .select(
          col("doc_id"),
          length(col("norm")).cast("long").as("n_chars_norm"),
          TextFunctions.punctCountFromNorm(col("norm")).cast("long").as("punct_cnt"),
          size(col("tk")).as("n_tok"),
          TextFunctions.tokenHitsFromTokens(col("tk"), TextFunctions.allStopwords).as("stop_hits"))
        .select(
          col("doc_id"), col("n_chars_norm"), col("punct_cnt"),
          TextFunctions.qualityScoreFrom(col("n_tok"), col("n_chars_norm"), col("punct_cnt"), col("stop_hits"))
            .as("quality_score"))
        .orderBy("doc_id")
    }),
    "text_langid" -> ((s, d) => {
      val langs = Seq("en", "de", "es", "fr", "zh")
      TP(s, d, "documents")
        .select(col("doc_id"), TextFunctions.normText(col("text")).as("norm"))
        .select(col("doc_id"), array_distinct(TextFunctions.tokensFromNorm(col("norm"))).as("dtk"))
        .select(
          col("doc_id") +:
            langs.map(l =>
              TextFunctions.markerOverlapFromDistinct(col("dtk"), TextFunctions.stopwords(l))
                .cast("long").as(s"s_$l")): _*)
        .withColumn("lang_guess", TextFunctions.langIdFromScores(langs.map(l => l -> col(s"s_$l"))))
        .orderBy("doc_id")
    }),
    "text_fingerprint" -> ((s, d) => {
      TP(s, d, "documents")
        .select(col("doc_id"), TextFunctions.normText(col("text")).as("norm"))
        .select(col("doc_id"), col("norm"), TextFunctions.tokensFromNorm(col("norm")).as("tk"))
        .select(
          col("doc_id"),
          md5(col("norm")).as("fp"),
          array_min(transform(TextFunctions.shinglesFromTokens(col("tk"), 3), x => md5(x))).as("min_shingle_fp"))
        .orderBy("doc_id")
    }),
    "text_shingles" -> ((s, d) => {
      TP(s, d, "documents")
        .select(col("doc_id"), TextFunctions.normText(col("text")).as("norm"))
        .select(col("doc_id"), TextFunctions.tokensFromNorm(col("norm")).as("tk"))
        .select(col("doc_id"), TextFunctions.shinglesFromTokens(col("tk"), 3).as("sh"))
        .select(
          col("doc_id"),
          size(col("sh")).cast("long").as("n_shingles"),
          size(array_distinct(col("sh"))).cast("long").as("n_distinct_shingles"))
        .orderBy("doc_id")
    }),

    "text_repetition" -> ((s, d) => {
      // Gopher-style repetition signal: duplicate word-2-gram fraction
      TP(s, d, "documents")
        .select(col("doc_id"), TextFunctions.normText(col("text")).as("norm"))
        .select(col("doc_id"), TextFunctions.tokensFromNorm(col("norm")).as("tk"))
        .select(
          col("doc_id"),
          size(col("tk")).cast("long").as("n_tok"),
          TextFunctions.repetitionRatioFromTokens(col("tk"), 2).as("rep_ratio"))
        .orderBy("doc_id")
    }),
    "data_split" -> ((s, d) => {
      // deterministic md5-bucket train/val/test split (12/2/2 of 16):
      // same doc → same split on every run and engine — the property that
      // prevents train↔test leakage across reprocessing at corpus scale
      TP(s, d, "documents")
        .select(
          col("doc_id"),
          TextFunctions.tokens(col("text")).as("tk"),
          SplitOps.assignSplit(col("doc_id")).as("split"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), sum(size(col("tk")).cast("long")).as("n_tokens"))
        .orderBy("split")
    }),
    "vec_meanpool" -> ((s, d) => {
      // chunk embeddings → document embedding by deterministic mean
      // pooling (decimal-exact per-position sums → replay-stable vector);
      // the oracle checks dim/count plus two sampled positions (array
      // outputs don't hash portably — scalars do)
      val pooled = SimilarityOps.meanPool(
        TP(s, d, "embeddings").select(pmod(col("vec_id"), lit(50)).as("grp"), col("embedding")),
        "grp", "embedding")
      pooled.select(
          col("grp"),
          size(col("mean_vec")).cast("long").as("dim"),
          col("n_vectors").as("n_chunks"),
          element_at(col("mean_vec"), 1).as("v0"),
          element_at(col("mean_vec"), 32).as("v31"))
        .orderBy("grp")
    }),
    "data_packing" -> ((s, d) => {
      // sequence-packing plan: concatenate-then-chop documents into
      // 512-token context windows across 16 md5 shards — per-doc
      // placement is one running sum per shard over a portable hash, so
      // the training-batch layout reproduces in any engine; `div` (not
      // double /) keeps window ids exact past 2^53 token offsets
      val docs = TP(s, d, "documents")
      PackingOps.packSequences(docs, "doc_id",
          TextFunctions.tokenCount(col("text")), windowTokens = 512L,
          shardCol = SplitOps.bucket16(col("doc_id")))
        .orderBy("doc_id")
    }),
    "data_shuffle" -> ((s, d) => {
      // deterministic training shuffle: seeded engine-portable global
      // permutation (md5("42:"||doc_id) sort key, id tiebreak) — position
      // computed bucket-parallel (no global window), so the batch order a
      // training run sees reproduces on any engine from (seed, ids) alone
      ExportOps.permutation(TP(s, d, "documents").select("doc_id"), "doc_id", seed = "42")
        .select("doc_id", "pos")
        .orderBy("pos")
    }),
    "data_shuffle_check" -> ((s, d) => {
      // chunked-export write invariant (the write_compact_check pattern):
      // after exportShuffled at 1000 rows/file, the re-read layout must
      // show ceil(n/1000) chunks, one file per chunk, every chunk exactly
      // the contiguous position range [chunk·1000+1, chunk·1000+n_k] —
      // which pins the full permutation→file assignment, not just counts
      val dir = java.nio.file.Files.createTempDirectory("graft-shuffle").toString
      ExportOps.exportShuffled(TP(s, d, "documents").select("doc_id", "lang"),
        "doc_id", seed = "42", dir, rowsPerFile = 1000L)
      val back = s.read.parquet(dir)
        .select(col("chunk").cast("long").as("chunk"), col("pos"), input_file_name().as("f"))
      back.groupBy(col("chunk"))
        .agg(count(lit(1)).as("n"), min("pos").as("minp"), max("pos").as("maxp"),
          countDistinct(col("f")).as("nf"))
        .agg(
          count(lit(1)).as("n_files"),
          sum("n").as("n_rows"),
          bool_and(col("n") <= 1000L).as("within_cap"),
          bool_and(col("minp") === col("chunk") * 1000L + 1 &&
            col("maxp") === col("chunk") * 1000L + col("n")).as("ranges_contiguous"),
          bool_and(col("nf") === 1).as("one_file_per_chunk"))
    }),
    "text_postings" -> ((s, d) => {
      // rare-3-gram inverted index (df ≤ 2): the blocking structure
      // containment dedup / contamination tracing query; df filtered
      // BEFORE collect_list so no boilerplate gram ever materializes a
      // giant posting buffer
      CorpusOps.rarePostings(TP(s, d, "documents"), "doc_id", "text", n = 3, maxDf = 2)
        .orderBy("gram")
    }),
    "q34_unpivot" -> ((s, d) => {
      // UNPIVOT / melt (the inverse of q16_pivot): wide metric columns →
      // long (metric, value) rows — a pure per-row Expand projection, no
      // shuffle except the final ORDER BY; metrics pre-cast to one type
      // (unpivot requires it, and raw-value double casts are correctly
      // rounded in both engines)
      T(s, d, "lineitem").filter(col("l_orderkey") <= 100)
        .select(col("l_orderkey"), col("l_linenumber").cast("int").as("l_linenumber"),
          col("l_quantity").cast("double").as("quantity"),
          col("l_extendedprice").cast("double").as("extendedprice"),
          col("l_discount").cast("double").as("discount"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("quantity"), col("extendedprice"), col("discount")),
          "metric", "value")
        .orderBy("l_orderkey", "l_linenumber", "metric", "value")
    }),
    "q33_zscore" -> ((s, d) => {
      // per-group z-score standardization: decimal-exact (n, Σx, Σx²)
      // moments + one join back; the per-row standardization is a fixed
      // IEEE expression mirrored token-for-token by the oracle
      StatsOps.zscore(
          T(s, d, "customer").filter(col("c_custkey") % 10 === 0)
            .select("c_custkey", "c_mktsegment", "c_acctbal"),
          Seq("c_mktsegment"), col("c_acctbal"))
        .select("c_custkey", "c_mktsegment", "z")
        .orderBy("c_custkey")
    }),
    "dedup_simhash_check" -> ((s, d) => {
      // driver-checkable SimHash invariant (hamming over 64-bit xxhash
      // signatures has no DuckDB twin, so the pair list itself stays
      // rows-only): on a corpus where every doc is duplicated, every
      // exact-dup pair MUST surface with hamming 0. n_exact_pairs is
      // data-derived identically in both engines; all_covered pins the
      // banding + bucket plumbing (a dropped bucket or band bug flips it)
      val docs = TP(s, d, "documents")
      val doubled = docs.unionByName(docs.withColumn("doc_id", col("doc_id") + 1000000))
      val exact = DedupOps.exactDupPairs(doubled, "text", "doc_id")
      val sims0 = DedupOps.simhashDupPairs(doubled, "text", "doc_id", maxHamming = 3)
        .filter(col("hamming") === 0).select("a_id", "b_id")
      val miss = exact.join(sims0, Seq("a_id", "b_id"), "left_anti")
        .agg(count(lit(1)).as("n_missing"))
      exact.agg(count(lit(1)).as("n_exact_pairs")).crossJoin(miss)
        .select(col("n_exact_pairs"), (col("n_missing") === 0).as("all_covered"))
    }),
    "dedup_clusters" -> ((s, d) => {
      // pair detection → duplicate CLUSTERS: connected components over
      // the verified minhash pair set (same parameters as dedup_minhash);
      // cluster_id = min member id = the canonical keeper
      val pairs = DedupOps.minhashDupPairs(TP(s, d, "documents"), "text", "doc_id",
        threshold = 0.7, shingleSize = 2, numBands = 32, rowsPerBand = 3)
      GraphOps.connectedComponents(pairs, "a_id", "b_id").orderBy("id")
    }),
    "data_sample" -> ((s, d) => {
      // deterministic 2/16 sample: a pure md5-bucket filter — stable under
      // retries and reprocessing, reproducible in any engine (df.sample is
      // partitioning-dependent and would never oracle-match)
      SplitOps.deterministicSample(TP(s, d, "documents"), "doc_id", keepBuckets = 2)
        .select(col("doc_id"), TextFunctions.tokenCount(col("text")).cast("long").as("n_tok"))
        .orderBy("doc_id")
    }),
    "data_decontam" -> ((s, d) => {
      // benchmark decontamination: every 50th doc stands in for an eval
      // set; docs sharing any word 8-gram with it are contaminated
      // (benchmark members trivially hit themselves — kept; the oracle
      // computes the same). Bench shingles broadcast; corpus scans once.
      val docs = TP(s, d, "documents")
      val bench = docs.filter(col("doc_id") % 50 === 0).select(col("text"))
      DecontamOps.contaminationHits(docs, "text", "doc_id", bench, "text", n = 8)
        .orderBy("doc_id")
    }),
    "data_stratified" -> ((s, d) => {
      // per-stratum deterministic downsampling (keep all purchases, 1/8
      // of clicks, 1/16 of views, 1/4 of the rest) — the curation shape
      // for rebalancing training mixtures, still a pure pushed filter
      val sampled = SplitOps.stratifiedSample(T(s, d, "events"), "event_id", "event_type",
        Map("click" -> 2, "purchase" -> 16, "view" -> 1), defaultBuckets = 4)
      sampled.groupBy("event_type")
        .agg(count(lit(1)).as("n"), dsum(col("value"), 2).as("sum_value"))
        .orderBy("event_type")
    }),
    "text_topterms" -> ((s, d) => {
      // most frequent non-stopword token per doc (integer-only tf ranking
      // — no float idf, so the oracle matches bit-for-bit); the classic
      // explode → groupBy wordcount shape with map-side combine
      import org.apache.spark.sql.expressions.Window
      val toks = TP(s, d, "documents")
        .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("token"))
        .filter(col("token") =!= "" && !col("token").isin(TextFunctions.allStopwords: _*))
      val counts = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      val w = Window.partitionBy("doc_id").orderBy(col("tf").desc, col("token").asc)
      counts.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("doc_id"), col("token").as("top_term"), col("tf"))
        .orderBy("doc_id")
    }),
    "text_vocab" -> ((s, d) => {
      // corpus vocabulary: top-100 tokens by total tf with document
      // frequency — two-level agg, no count-distinct Expand (distinct
      // (doc, token) IS the first grouping level)
      CorpusOps.vocabulary(TP(s, d, "documents"), "doc_id", "text", topV = 100)
        .orderBy(col("tf").desc, col("token").asc)
    }),
    "text_tfidf" -> ((s, d) => {
      // per-doc top tf-idf term: the distinct-token df table is unbounded
      // at corpus scale, so it is NOT broadcast-hinted — AQE broadcasts
      // when small, else shuffle join on token (skew-splittable); score =
      // tf·N/df as ONE IEEE division on integer-exact inputs (log-free →
      // bit-identical cross-engine, monotone in tf and 1/df)
      CorpusOps.tfidfTopTerms(TP(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),
    "dedup_spans" -> ((s, d) => {
      // substring-dedup approximation at 8-gram granularity (the Lee
      // et al. duplicated-span signal): per doc, how many distinct
      // 8-grams occur in ≥2 docs. df via two-level groupBy on the hash
      // (map-side partial agg bounds hot boilerplate shingles) joined
      // back without a hint so AQE can broadcast or skew-split
      CorpusOps.duplicatedSpanStats(TP(s, d, "documents"), "doc_id", "text", n = 8)
        .orderBy("doc_id")
    }),
    "text_clean" -> ((s, d) => {
      // crawled-text cleanup: strip tags, decode entities, straighten
      // curly punctuation, collapse whitespace — md5 pins the exact
      // cleaned string against the DuckDB twin
      val cleaned = TextFunctions.cleanHtml(col("text"))
      TP(s, d, "documents")
        .select(col("doc_id"), length(cleaned).as("clean_chars"), md5(cleaned).as("clean_md5"))
        .orderBy("doc_id")
    }),
    "data_funnel" -> ((s, d) => {
      // curation filter funnel: first-failing-rule attribution, the
      // drop-reason report every pipeline run ships with
      CorpusOps.filterFunnel(TP(s, d, "documents"), Seq(
          "too_short" -> (size(TextFunctions.tokens(col("text"))) < 20),
          "too_long" -> (col("n_chars") > 450),
          "non_english" -> (col("lang") =!= "en")))
        .orderBy("verdict")
    }),
    "data_mixture" -> ((s, d) => {
      // rebalance to a target language mixture: binding stratum caps the
      // output (fr here — its rate lands exactly 1.0, exercising the
      // thr≥65536 keep-all edge); per-lang kept counts are the output
      val kept = SplitOps.mixtureSample(TP(s, d, "documents"), "doc_id", "lang",
        Map("en" -> 0.5, "de" -> 0.2, "fr" -> 0.2, "zh" -> 0.1))
      kept.groupBy("lang").agg(count(lit(1)).as("n_kept")).orderBy("lang")
    }),
    "data_domain_cap" -> ((s, d) => {
      // per-domain document cap (web-crawl "max N docs per domain"):
      // two-phase top-k — per-(domain, salt) local cap bounds the final
      // per-domain reducer input to saltBuckets·k rows under any skew
      CorpusOps.capPerKey(
          TP(s, d, "documents").select("doc_id", "source", "n_chars"),
          "source", Seq(col("n_chars").desc, col("doc_id").asc), k = 20, rankCol = Some("rn"))
        .orderBy("source", "rn")
    }),
    "text_chunks" -> ((s, d) => {
      // LLM pre-training chunking: 32-token windows, 8-token overlap
      TP(s, d, "documents")
        .select(col("doc_id"), TextFunctions.normText(col("text")).as("norm"))
        .select(col("doc_id"), TextFunctions.tokensFromNorm(col("norm")).as("tk"))
        .select(col("doc_id"), explode(TextFunctions.chunkTokens(col("tk"), 32, 8)).as("c"))
        .select(
          col("doc_id"),
          col("c.chunk_idx").as("chunk_idx"),
          col("c.n_tokens").as("n_tokens"),
          md5(col("c.chunk_text")).as("chunk_hash"))
        .orderBy("doc_id", "chunk_idx")
    }),
    "text_pii" -> ((s, d) => {
      // the corpus has no natural PII, so augment each doc with
      // deterministic doc_id-derived spans — both engines compute the
      // same augmented text, making the scrub/count oracle substantive
      val aug = concat(
        col("text"), lit(" contact-"), col("doc_id").cast("string"),
        lit("@example.com see https://ex.org/d/"), col("doc_id").cast("string"),
        lit(" ref 9876543210"))
      TP(s, d, "documents")
        .select(col("doc_id"), aug.as("t2"))
        .select(
          col("doc_id"),
          TextFunctions.piiCounts(col("t2")).as("pc"),
          md5(TextFunctions.scrubPii(col("t2"))).as("scrub_hash"))
        .select(
          col("doc_id"),
          col("pc.emails").as("n_emails"),
          col("pc.urls").as("n_urls"),
          col("pc.long_numbers").as("n_long_nums"),
          col("scrub_hash"))
        .orderBy("doc_id")
    }),

    "pipeline_curation" -> ((s, d) => {
      // the engine's purpose in one verified flow: exact-dedup keep-first
      // → benchmark decontamination → quality filter → deterministic
      // split → chunk counting. Every stage is the already-oracled
      // operator; the composition itself is what this query pins.
      val docs = TP(s, d, "documents")
      val deduped = DedupOps.exactKeepFirst(docs, "text", "doc_id")
      val bench = docs.filter(col("doc_id") % 50 === 0).select(col("text"))
      val clean = DecontamOps.decontaminated(deduped, "text", "doc_id", bench, "text", n = 8)
      val scored = clean
        .select(col("doc_id"), TextFunctions.normText(col("text")).as("norm"))
        .select(col("doc_id"), col("norm"), TextFunctions.tokensFromNorm(col("norm")).as("tk"))
        .select(col("doc_id"), col("tk"),
          TextFunctions.qualityScoreFrom(
            size(col("tk")), length(col("norm")),
            TextFunctions.punctCountFromNorm(col("norm")),
            TextFunctions.tokenHitsFromTokens(col("tk"), TextFunctions.allStopwords)).as("q"))
        .filter(col("q") >= 0.5)
      scored
        .withColumn("split", SplitOps.assignSplit(col("doc_id")))
        .withColumn("n_chunks", size(TextFunctions.chunkTokens(col("tk"), 32, 8)).cast("long"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(col("tk")).cast("long")).as("n_tokens"),
          sum(col("n_chunks")).as("n_chunks"))
        .orderBy("split")
    }),

    // ----- LLM-pipeline: multimodal plumbing -----
    "multimodal_features" -> ((s, d) => {
      val withBin = T(s, d, "documents").select(col("doc_id"), encode(col("text"), "UTF-8").as("bin"))
      MultimodalOps
        .fakeDecodeMeta(withBin, "bin")
        .select(
          col("doc_id"),
          length(col("bin")).cast("long").as("byte_len"),
          col("media_meta.width").as("width"),
          col("media_meta.height").as("height"),
          col("media_meta.n_frames").as("n_frames"),
          md5(col("bin")).as("content_hash"))
        .orderBy("doc_id")
    })
  )

  // ---------------------------------------------------------------- oracles

  /** DuckDB-dialect twins of `queries`, aligned column-for-column. Keys
    * absent here (minhash/simhash/lsh/approx) get the driver's weaker
    * rows-only check — their semantics are pinned by ScalaTest instead.
    */
  def oracleSql: Map[String, String] = {
    // shared SQL fragments (DuckDB dialect)
    // collapse-then-trim, mirroring TextFunctions.normText (trim strips
    // only spaces, so the order matters for tab-edged documents)
    val norm = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
    // empty-doc alignment (round-2 advisor): DuckDB string_split('', ' ')
    // yields [''] where Spark tokensFromNorm yields [] — the CASE makes
    // every token-derived oracle column agree on empty/whitespace docs
    val toks = s"(CASE WHEN len($norm) = 0 THEN []::VARCHAR[] ELSE string_split($norm, ' ') END)"
    // word n-gram shingles of token list t (DuckDB slice t[a:b] is
    // 1-based inclusive; range(x, y) excludes y) — mirrors
    // TextFunctions.shinglesFromTokens for any n
    def shingles(t: String, n: Int = 3) =
      s"(CASE WHEN len($t) <= $n THEN [array_to_string($t, ' ')] " +
        s"ELSE list_transform(range(1, len($t)-${n - 2}), i -> array_to_string($t[i:i+${n - 1}], ' ')) END)"
    def jaccardPairsSql(n: Int, threshold: Double, extraWhere: String = "") =
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
         |sh AS (SELECT doc_id, list_distinct(${shingles("tk", n)}) AS s FROM t)
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         | ROUND(len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(a.s || b.s)), 4) AS jaccard
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(a.s || b.s)) >= $threshold
         |$extraWhere
         |ORDER BY a_id, b_id""".stripMargin
    val revenue =
      "CAST(CAST(CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE)"
    val stopAll = TextFunctions.stopwords.values.flatten.toSeq.distinct.sorted
      .map(w => s"'$w'").mkString("[", ", ", "]")
    def markers(l: String) =
      TextFunctions.stopwords(l).map(w => s"'$w'").mkString("[", ", ", "]")
    def sL(l: String) = s"len(list_intersect(list_distinct($toks), ${markers(l)}))"
    val dotExpr = "list_reduce(list_transform(list_zip(a.vec, b.vec), p -> p[1]*p[2]), (x,y) -> x+y)"
    def normExpr(side: String) =
      s"sqrt(list_reduce(list_transform($side.vec, x -> x*x), (x,y) -> x+y))"

    Map(
      "q1_agg" ->
        """SELECT l_returnflag, l_linestatus,
          | CAST(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) AS sum_qty,
          | CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) AS sum_base_price,
          | CAST(CAST(CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
          | ROUND(CAST(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE)/COUNT(*), 4) AS avg_qty,
          | COUNT(*) AS count_order
          |FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
      "q2_pushdown" ->
        """SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
          |WHERE l_quantity >= 48 AND l_discount >= 0.08 ORDER BY l_orderkey, l_linenumber""".stripMargin,
      "q3_join_topn" ->
        s"""SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, $revenue AS revenue
           |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |WHERE c_mktsegment = 'BUILDING'
           |GROUP BY o_orderkey, o_orderdate ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
      "q4_semijoin" ->
        """SELECT o_orderpriority, COUNT(*) AS order_count FROM orders
          |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
      "q5_multijoin" ->
        s"""SELECT n_name, $revenue AS revenue
           |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation ON c_nationkey = n_nationkey
           |JOIN region ON n_regionkey = r_regionkey
           |WHERE r_name = 'ASIA'
           |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
      "q6_selective_agg" ->
        """SELECT CAST(CAST(CAST(SUM(CAST(l_extendedprice*l_discount AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) AS revenue,
          | COUNT(*) AS n
          |FROM lineitem
          |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
          | AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
      "q7_window" ->
        """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
          | SELECT o_custkey, o_orderkey, o_totalprice,
          |  CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
          | FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
      "q8_distinct" ->
        """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
          | COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
      "q9_antijoin" ->
        """SELECT c_nationkey, COUNT(*) AS n_customers FROM customer
          |WHERE NOT EXISTS (SELECT 1 FROM orders
          |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
          |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
      "q10_topk" ->
        """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
          |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
      "q11_having" ->
        """SELECT l_partkey, CAST(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) AS sum_qty
          |FROM lineitem GROUP BY l_partkey
          |HAVING CAST(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) > 900
          |ORDER BY l_partkey""".stripMargin,
      "q12_case_agg" ->
        """SELECT l_linestatus,
          | CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
          | CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_count
          |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
      "q13_outerjoin_agg" ->
        """SELECT c_count, COUNT(*) AS custdist FROM (
          | SELECT c_custkey, COUNT(o_orderkey) AS c_count
          | FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
          | GROUP BY c_custkey)
          |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
      "q14_union" ->
        """SELECT event_type, COUNT(*) AS n FROM (
          | SELECT * FROM events WHERE event_type IN ('click','purchase')
          | UNION ALL
          | SELECT * FROM events WHERE event_type IN ('signup','view'))
          |GROUP BY event_type ORDER BY event_type""".stripMargin,
      "q15_rollup" ->
        """SELECT l_returnflag, l_linestatus,
          | CAST(GROUPING(l_returnflag)*2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
          | COUNT(*) AS n,
          | CAST(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) AS sum_qty
          |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
          |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
      "q16_pivot" ->
        """SELECT user_id % 10 AS cohort,
          | CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (event_type = 'click') AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) AS click,
          | CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (event_type = 'error') AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) AS error,
          | CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (event_type = 'purchase') AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) AS purchase,
          | CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (event_type = 'signup') AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) AS signup,
          | CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (event_type = 'view') AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) AS view
          |FROM events GROUP BY cohort ORDER BY cohort""".stripMargin,
      "q17_subquery" ->
        """SELECT p_partkey, p_brand, p_retailprice FROM (
          | SELECT p_partkey, p_brand, p_retailprice,
          |  CAST(CAST(CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) OVER (PARTITION BY p_brand) AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE)
          |   / COUNT(*) OVER (PARTITION BY p_brand) AS brand_avg
          | FROM part)
          |WHERE p_retailprice > brand_avg ORDER BY p_partkey""".stripMargin,
      "q20_approx" ->
        """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts_exact,
          | true AS parts_ok, true AS p50_ok
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
      "ann_lsh" ->
        "SELECT CAST(8 AS BIGINT) AS n_queries, true AS recall_ok",
      "ann_ivf" ->
        "SELECT CAST(8 AS BIGINT) AS n_queries, true AS recall_ok",
      "q19_percentile" ->
        """SELECT o_orderstatus, quantile_cont(o_totalprice, 0.5) AS p50,
          | quantile_cont(o_totalprice, 0.9) AS p90
          |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
      "asof_join" ->
        """SELECT o_orderkey, epoch_us(MAX(l_shipdate)) AS asof_us
          |FROM orders LEFT JOIN lineitem
          | ON l_orderkey = o_orderkey AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
          |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,
      "asof_join_fwd" ->
        """SELECT o_orderkey, epoch_us(MIN(l_shipdate)) AS asof_us
          |FROM orders LEFT JOIN lineitem
          | ON l_orderkey = o_orderkey AND l_shipdate >= o_orderdate + INTERVAL 60 DAY
          |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,
      "asof_join_tol" ->
        """SELECT o_orderkey, epoch_us(MAX(l_shipdate)) AS asof_us
          |FROM orders LEFT JOIN lineitem
          | ON l_orderkey = o_orderkey
          | AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
          | AND l_shipdate >= o_orderdate + INTERVAL 90 DAY - INTERVAL 30 DAY
          |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,
      "asof_join_nearest" ->
        """WITH b AS (SELECT o_orderkey, MAX(l_shipdate) AS bt
          |           FROM orders LEFT JOIN lineitem
          |            ON l_orderkey = o_orderkey AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
          |           GROUP BY o_orderkey),
          |f AS (SELECT o_orderkey, MIN(l_shipdate) AS ft
          |      FROM orders LEFT JOIN lineitem
          |       ON l_orderkey = o_orderkey AND l_shipdate >= o_orderdate + INTERVAL 60 DAY
          |      GROUP BY o_orderkey),
          |j AS (SELECT o.o_orderkey, o.o_orderdate + INTERVAL 60 DAY AS cutoff, b.bt, f.ft
          |      FROM orders o JOIN b USING (o_orderkey) JOIN f USING (o_orderkey))
          |SELECT o_orderkey,
          | epoch_us(CASE WHEN ft IS NULL THEN bt
          |               WHEN bt IS NULL THEN ft
          |               WHEN cutoff - bt <= ft - cutoff THEN bt ELSE ft END) AS asof_us
          |FROM j ORDER BY o_orderkey""".stripMargin,
      "events_retention" ->
        """WITH uw AS (SELECT DISTINCT user_id,
          |  epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS week FROM events),
          |c AS (SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY user_id),
          |sz AS (SELECT cohort_week, COUNT(*) AS n_cohort FROM c GROUP BY cohort_week),
          |act AS (SELECT c.cohort_week, uw.week - c.cohort_week AS week_offset, COUNT(*) AS n_active
          |        FROM uw JOIN c USING (user_id) GROUP BY c.cohort_week, week_offset)
          |SELECT cohort_week, week_offset, n_active, n_cohort,
          | CAST(n_active AS DOUBLE) / CAST(n_cohort AS DOUBLE) AS retention
          |FROM act JOIN sz USING (cohort_week)
          |ORDER BY cohort_week, week_offset""".stripMargin,
      "events_sessionize" ->
        """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
          |w AS (SELECT user_id, us,
          |  CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
          |        OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us) > 1800000000 THEN 1 ELSE 0 END AS ns
          | FROM e),
          |s AS (SELECT user_id, us,
          |  CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
          | FROM w)
          |SELECT user_id, session_idx, COUNT(*) AS n_events, MIN(us) AS start_us, MAX(us) AS end_us
          |FROM s GROUP BY user_id, session_idx ORDER BY user_id, session_idx""".stripMargin,
      "events_range_join_rule" ->
        """WITH iv AS (SELECT i AS interval_id,
          |  1704067200000000 + i*50400000000 AS s_us,
          |  1704067200000000 + i*50400000000 + 75600000000 AS e_us
          | FROM range(50) t(i)),
          |ev AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value FROM events)
          |SELECT interval_id, COUNT(*) AS n_events,
          | CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) AS sum_value
          |FROM iv JOIN ev ON ts_us >= s_us AND ts_us < e_us
          |GROUP BY interval_id ORDER BY interval_id""".stripMargin,
      "events_range_join" ->
        """WITH iv AS (SELECT i AS interval_id,
          |  1704067200000000 + i*50400000000 AS s_us,
          |  1704067200000000 + i*50400000000 + 75600000000 AS e_us
          | FROM range(50) t(i)),
          |ev AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value FROM events)
          |SELECT interval_id, COUNT(*) AS n_events,
          | CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) AS sum_value
          |FROM iv JOIN ev ON ts_us >= s_us AND ts_us < e_us
          |GROUP BY interval_id ORDER BY interval_id""".stripMargin,
      "events_window_agg" ->
        """SELECT epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS hour_us, COUNT(*) AS n_events,
          | CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) AS sum_value
          |FROM events GROUP BY hour_us ORDER BY hour_us""".stripMargin,
      "events_json" ->
        """SELECT CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT) AS k, COUNT(*) AS n
          |FROM events GROUP BY k ORDER BY k""".stripMargin,
      "events_stream_join_twin" ->
        """WITH c AS (SELECT user_id, event_id AS click_id, epoch_us(CAST(ts AS TIMESTAMP)) AS click_us
          |  FROM events WHERE event_type = 'click'),
          |p AS (SELECT user_id, event_id AS purchase_id, epoch_us(CAST(ts AS TIMESTAMP)) AS purchase_us
          |  FROM events WHERE event_type = 'purchase')
          |SELECT c.user_id AS user_id, click_id, purchase_id, click_us, purchase_us
          |FROM c JOIN p ON c.user_id = p.user_id
          | AND purchase_us >= click_us AND purchase_us <= click_us + 3600000000
          |ORDER BY c.user_id, click_id, purchase_id""".stripMargin,
      "pipeline_sql" ->
        """SELECT b, CAST(SUM(a) AS BIGINT) AS sum_a
          |FROM (VALUES (1,'x'),(2,'y'),(3,'x')) t(a,b) GROUP BY b ORDER BY b""".stripMargin,
      "pipeline_values" ->
        """SELECT * FROM (VALUES (1,'ada',9.5),(2,'bob',7.25)) t(id, name, score) ORDER BY id""",
      "pipeline_sql_file" ->
        "SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
      "pipeline_identity" -> "SELECT * FROM region ORDER BY r_regionkey",
      "pipeline_csv_roundtrip" -> "SELECT * FROM region ORDER BY r_regionkey",
      "flatten_struct" ->
        """SELECT event_id, event_type AS ev_event_type, value AS ev_value, user_id AS ev_u_user_id
          |FROM events ORDER BY event_id""".stripMargin,
      "flatten_explode" ->
        s"""SELECT token, COUNT(*) AS n FROM (SELECT unnest($toks) AS token FROM documents)
           |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin,
      "diff_tables" ->
        """WITH r AS (
          | SELECT CASE WHEN o_orderkey % 500 = 0 THEN o_orderkey + 1000000 ELSE o_orderkey END AS o_orderkey,
          |  o_custkey, o_orderstatus,
          |  CASE WHEN o_orderkey % 100 = 0 THEN o_totalprice + 10 ELSE o_totalprice END AS o_totalprice,
          |  o_orderdate, o_orderpriority
          | FROM orders WHERE o_orderkey % 97 <> 0),
          |d AS (
          | SELECT CASE WHEN r.o_orderkey IS NULL THEN 'D' WHEN l.o_orderkey IS NULL THEN 'I'
          |   WHEN (l.o_custkey IS DISTINCT FROM r.o_custkey) OR (l.o_orderstatus IS DISTINCT FROM r.o_orderstatus)
          |     OR (l.o_totalprice IS DISTINCT FROM r.o_totalprice) OR (l.o_orderdate IS DISTINCT FROM r.o_orderdate)
          |     OR (l.o_orderpriority IS DISTINCT FROM r.o_orderpriority) THEN 'C' ELSE 'N' END AS diff,
          |  COALESCE(l.o_orderkey, r.o_orderkey) AS o_orderkey,
          |  l.o_totalprice AS left_o_totalprice, r.o_totalprice AS right_o_totalprice
          | FROM orders l FULL OUTER JOIN r ON l.o_orderkey = r.o_orderkey)
          |SELECT diff, o_orderkey, left_o_totalprice, right_o_totalprice FROM d
          |WHERE diff <> 'N' ORDER BY o_orderkey, diff""".stripMargin,
      "merge_upsert" ->
        """WITH upd AS (
          | SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice + 10 AS o_totalprice,
          |        o_orderdate, o_orderpriority, o_orderkey % 97 = 0 AS del
          | FROM orders WHERE o_orderkey % 100 = 0 OR o_orderkey % 97 = 0
          | UNION ALL
          | SELECT o_orderkey + 2000000, o_custkey, o_orderstatus, o_totalprice,
          |        o_orderdate, o_orderpriority, false
          | FROM orders WHERE o_orderkey % 500 = 0),
          |merged AS (
          | SELECT o_orderkey, o_orderstatus, o_totalprice FROM upd WHERE NOT del
          | UNION ALL
          | SELECT b.o_orderkey, b.o_orderstatus, b.o_totalprice FROM orders b
          | WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM upd))
          |SELECT o_orderstatus, COUNT(*) AS n,
          | CAST(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) AS sum_price
          |FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
      "dedup_exact" ->
        s"""WITH doubled AS (
           | SELECT doc_id, text FROM documents
           | UNION ALL SELECT doc_id + 1000000, text FROM documents)
           |SELECT md5($norm) AS content_hash, MIN(doc_id) AS keep_id, COUNT(*) AS dup_count
           |FROM doubled GROUP BY content_hash ORDER BY keep_id""".stripMargin,
      "dedup_minhash" -> jaccardPairsSql(n = 2, threshold = 0.7),
      // the incremental probe returns exactly the quadratic pair set
      // restricted to pairs touching at least one NEW doc (doc_id%4=0)
      "dedup_incremental" -> jaccardPairsSql(n = 2, threshold = 0.7,
        extraWhere = "AND (a.doc_id % 4 = 0 OR b.doc_id % 4 = 0)"),
      "dedup_simhash_check" ->
        s"""WITH doubled AS (
           | SELECT doc_id, text FROM documents
           | UNION ALL SELECT doc_id + 1000000, text FROM documents),
           |g AS (SELECT md5($norm) AS h, COUNT(*) AS m FROM doubled GROUP BY h)
           |SELECT CAST(SUM((m*(m-1))//2) AS BIGINT) AS n_exact_pairs, true AS all_covered FROM g""".stripMargin,
      "graph_pagerank_check" ->
        """WITH e AS (SELECT DISTINCT c_custkey % 25 AS src, CAST(c_nationkey AS BIGINT) AS dst
          |           FROM customer WHERE c_custkey % 25 <> c_nationkey),
          |n AS (SELECT src AS id FROM e UNION SELECT dst FROM e)
          |SELECT (SELECT COUNT(*) FROM n) AS n_nodes,
          | true AS all_positive, true AS mass_bounded, true AS replay_stable""".stripMargin,
      "write_metrics_check" ->
        """SELECT COUNT(*) AS n_rows,
          | CAST(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) AS sum_price
          |FROM orders""".stripMargin,
      "write_compact_check" ->
        """SELECT CAST(3 AS BIGINT) AS n_files,
          | (SELECT COUNT(*) FROM orders) AS n_rows, true AS within_cap""".stripMargin,
      "write_zorder_check" ->
        """SELECT CAST(4 AS BIGINT) AS n_files, true AS ranges_disjoint,
          | (SELECT COUNT(*) FROM part) AS n_rows""".stripMargin,
      "vec_meanpool" ->
        """WITH pe AS (SELECT vec_id % 50 AS grp,
          |  generate_subscripts(embedding, 1) - 1 AS pos, unnest(embedding) AS x
          |  FROM embeddings),
          |m AS (SELECT grp, pos, COUNT(*) AS n,
          |  CAST(CAST(CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(28,12))) AS DECIMAL(38,12)) AS VARCHAR) AS DOUBLE) AS sx
          |  FROM pe GROUP BY grp, pos)
          |SELECT grp, COUNT(*) AS dim, MAX(n) AS n_chunks,
          | MAX(CASE WHEN pos = 0 THEN sx / CAST(n AS DOUBLE) END) AS v0,
          | MAX(CASE WHEN pos = 31 THEN sx / CAST(n AS DOUBLE) END) AS v31
          |FROM m GROUP BY grp ORDER BY grp""".stripMargin,
      "data_packing" ->
        s"""WITH t AS (SELECT doc_id, CAST(len($toks) AS BIGINT) AS n_tok,
           |  CAST(strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 1, 1)) - 1 AS INT) AS shard
           |  FROM documents),
           |c AS (SELECT doc_id, shard, n_tok,
           |  CAST(SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
           |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS end_off
           |  FROM t),
           |p AS (SELECT doc_id, shard, n_tok, end_off - n_tok AS start_off,
           |  (end_off - n_tok) // 512 AS first_win,
           |  CASE WHEN n_tok = 0 THEN (end_off - n_tok) // 512 ELSE (end_off - 1) // 512 END AS last_win
           |  FROM c)
           |SELECT doc_id, shard, n_tok, start_off, first_win, last_win,
           | last_win - first_win + 1 AS n_windows
           |FROM p ORDER BY doc_id""".stripMargin,
      "data_shuffle" ->
        """SELECT doc_id,
          | ROW_NUMBER() OVER (ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)), doc_id) AS pos
          |FROM documents ORDER BY pos""".stripMargin,
      "data_shuffle_check" ->
        """SELECT CAST(CEIL(COUNT(*) / 1000.0) AS BIGINT) AS n_files, COUNT(*) AS n_rows,
          | true AS within_cap, true AS ranges_contiguous, true AS one_file_per_chunk
          |FROM documents""".stripMargin,
      "text_postings" ->
        s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
           |g AS (SELECT DISTINCT doc_id, gram FROM
           |  (SELECT doc_id, unnest(${shingles("tk", 3)}) AS gram FROM t) WHERE gram <> ''),
           |r AS (SELECT gram, COUNT(*) AS df FROM g GROUP BY gram HAVING COUNT(*) <= 2)
           |SELECT gram, df,
           | array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
           |FROM g JOIN r USING (gram)
           |GROUP BY gram, df ORDER BY gram""".stripMargin,
      "q34_unpivot" ->
        """WITH b AS (SELECT l_orderkey, CAST(l_linenumber AS INT) AS l_linenumber,
          |  CAST(l_quantity AS DOUBLE) AS quantity,
          |  CAST(l_extendedprice AS DOUBLE) AS extendedprice,
          |  CAST(l_discount AS DOUBLE) AS discount
          |  FROM lineitem WHERE l_orderkey <= 100)
          |SELECT l_orderkey, l_linenumber, metric, value FROM b
          |UNPIVOT (value FOR metric IN (quantity, extendedprice, discount))
          |ORDER BY l_orderkey, l_linenumber, metric, value""".stripMargin,
      "q33_zscore" ->
        """WITH fl AS (SELECT c_custkey, c_mktsegment, c_acctbal FROM customer WHERE c_custkey % 10 = 0),
          |m AS (SELECT c_mktsegment,
          | COUNT(CASE WHEN c_acctbal IS NOT NULL THEN 1 END) AS n,
          | CAST(CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) AS sx,
          | CAST(CAST(CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * CAST(c_acctbal AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE) AS sxx
          | FROM fl GROUP BY c_mktsegment),
          |s AS (SELECT c_mktsegment, sx / CAST(n AS DOUBLE) AS mean,
          |      sqrt((sxx - sx*sx/CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)) AS sd FROM m)
          |SELECT c_custkey, c_mktsegment,
          | CASE WHEN sd > 0 THEN (CAST(c_acctbal AS DOUBLE) - mean) / sd END AS z
          |FROM fl JOIN s USING (c_mktsegment) ORDER BY c_custkey""".stripMargin,
      "dedup_clusters" ->
        s"""WITH RECURSIVE t AS (SELECT doc_id, $toks AS tk FROM documents),
           |sh AS (SELECT doc_id, list_distinct(${shingles("tk", 2)}) AS s FROM t),
           |p AS (SELECT a.doc_id AS a, b.doc_id AS b
           |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           |      WHERE len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(a.s || b.s)) >= 0.7),
           |e AS (SELECT a, b FROM p UNION ALL SELECT b AS a, a AS b FROM p),
           |reach(id, r) AS (
           | SELECT DISTINCT a AS id, a AS r FROM e
           | UNION
           | SELECT e.b AS id, reach.r AS r FROM reach JOIN e ON e.a = reach.id)
           |SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id ORDER BY id""".stripMargin,
      "data_sample" ->
        s"""SELECT doc_id, len($toks) AS n_tok FROM documents
           |WHERE substr(md5(doc_id::VARCHAR), 1, 1) IN ('0','1') ORDER BY doc_id""".stripMargin,
      "data_decontam" ->
        s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
           |shl AS (SELECT doc_id, unnest(list_distinct(${shingles("tk", 8)})) AS s FROM t),
           |b AS (SELECT DISTINCT s FROM shl WHERE doc_id % 50 = 0)
           |SELECT doc_id, COUNT(*) AS n_hits FROM shl JOIN b USING (s)
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
      "data_stratified" ->
        """WITH f AS (SELECT event_type, value FROM events
          | WHERE CASE event_type
          |  WHEN 'click' THEN substr(md5(event_id::VARCHAR),1,1) < '2'
          |  WHEN 'purchase' THEN true
          |  WHEN 'view' THEN substr(md5(event_id::VARCHAR),1,1) < '1'
          |  ELSE substr(md5(event_id::VARCHAR),1,1) < '4' END)
          |SELECT event_type, COUNT(*) AS n,
          | CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) AS sum_value
          |FROM f GROUP BY event_type ORDER BY event_type""".stripMargin,
      "text_topterms" ->
        s"""WITH tok AS (SELECT doc_id, unnest($toks) AS token FROM documents),
           |f AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok
           |      WHERE token <> '' AND NOT list_contains($stopAll, token)
           |      GROUP BY doc_id, token),
           |r AS (SELECT doc_id, token, tf,
           |       ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tf DESC, token) AS rn FROM f)
           |SELECT doc_id, token AS top_term, tf FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin,
      "q25_ntile" ->
        """WITH r AS (SELECT c_mktsegment, c_acctbal,
          |  NTILE(4) OVER (PARTITION BY c_mktsegment
          |                 ORDER BY c_acctbal DESC, c_custkey) AS quartile
          | FROM customer)
          |SELECT c_mktsegment, quartile, COUNT(*) AS n,
          | MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal
          |FROM r GROUP BY c_mktsegment, quartile ORDER BY c_mktsegment, quartile""".stripMargin,
      "q26_fuzzy" ->
        """SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
          | CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
          |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
          |WHERE levenshtein(a.c_name, b.c_name) <= 1
          |ORDER BY a_id, b_id""".stripMargin,
      "q27_hof" ->
        """SELECT l_orderkey, COUNT(*) AS n_items,
          | CAST(COALESCE(SUM(CAST(l_quantity AS INT)) FILTER (CAST(l_quantity AS INT) > 25), 0) AS BIGINT) AS sum_hi,
          | CAST(COUNT(*) FILTER (CAST(l_quantity AS INT) > 25) AS BIGINT) AS n_hi
          |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
      "q28_datetime" ->
        """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
          | CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS mo,
          | COUNT(*) AS n,
          | CAST(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) AS sum_price
          |FROM orders GROUP BY yr, mo ORDER BY yr, mo""".stripMargin,
      "q18_skewjoin" ->
        """SELECT l_returnflag,
          | CAST(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) AS sum_qty,
          | COUNT(*) AS n
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
      "q21_cube" ->
        """SELECT l_returnflag, l_linestatus,
          | CAST(GROUPING(l_returnflag)*2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
          | COUNT(*) AS n,
          | CAST(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) AS sum_qty
          |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
          |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
      "q22_setops" ->
        """WITH a AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'),
          |b AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
          |i AS (SELECT o_custkey, 'both' AS op FROM (SELECT * FROM a INTERSECT SELECT * FROM b)),
          |e AS (SELECT o_custkey, 'open_only' AS op FROM (SELECT * FROM a EXCEPT SELECT * FROM b))
          |SELECT o_custkey, op FROM i UNION ALL SELECT o_custkey, op FROM e
          |ORDER BY op, o_custkey""".stripMargin,
      "text_vocab" ->
        s"""WITH tok AS (SELECT doc_id, unnest($toks) AS token FROM documents),
           |f AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok
           |      WHERE token <> '' AND NOT list_contains($stopAll, token)
           |      GROUP BY doc_id, token),
           |v AS (SELECT token, CAST(SUM(tf) AS BIGINT) AS tf, COUNT(*) AS df FROM f GROUP BY token)
           |SELECT token, tf, df FROM v ORDER BY tf DESC, token LIMIT 100""".stripMargin,
      "text_tfidf" ->
        s"""WITH tok AS (SELECT doc_id, unnest($toks) AS token FROM documents),
           |f AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok
           |      WHERE token <> '' AND NOT list_contains($stopAll, token)
           |      GROUP BY doc_id, token),
           |dft AS (SELECT token, COUNT(*) AS df FROM f GROUP BY token),
           |nn AS (SELECT COUNT(*) AS n_docs FROM documents),
           |sc AS (SELECT f.doc_id, f.token, f.tf, dft.df,
           |       CAST(f.tf * nn.n_docs AS DOUBLE)/dft.df AS score
           |       FROM f JOIN dft USING (token) CROSS JOIN nn),
           |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS rn FROM sc)
           |SELECT doc_id, token AS term, tf, df, score FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin,
      "q23_histogram" ->
        """WITH b AS (SELECT CAST(FLOOR(l_extendedprice/5000) AS BIGINT) AS bin FROM lineitem)
          |SELECT bin, COUNT(*) AS n, CAST(bin*5000 AS DOUBLE) AS lo
          |FROM b GROUP BY bin ORDER BY bin""".stripMargin,
      "q24_stats" ->
        """WITH m AS (SELECT l_returnflag, COUNT(*) AS n,
          | CAST(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) AS sx,
          | CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) AS sy,
          | CAST(CAST(CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE) AS sxx,
          | CAST(CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE) AS syy,
          | CAST(CAST(CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE) AS sxy
          | FROM lineitem GROUP BY l_returnflag)
          |SELECT l_returnflag, n,
          | sx / CAST(n AS DOUBLE) AS mean_x,
          | sqrt((sxx - sx*sx/CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)) AS stddev_x,
          | (CAST(n AS DOUBLE)*sxy - sx*sy) /
          |   sqrt((CAST(n AS DOUBLE)*sxx - sx*sx) * (CAST(n AS DOUBLE)*syy - sy*sy)) AS corr_xy
          |FROM m ORDER BY l_returnflag""".stripMargin,
      "q31_rangeframe" ->
        """WITH e AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS ts_s, value
          |           FROM events WHERE user_id % 20 = 0)
          |SELECT user_id, event_id, ts_s,
          | CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) AS w_sum,
          | COUNT(*) OVER w AS w_n
          |FROM e
          |WINDOW w AS (PARTITION BY user_id ORDER BY ts_s RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
          |ORDER BY user_id, ts_s, event_id""".stripMargin,
      "q32_lateral" ->
        """SELECT n.n_name, t.c_custkey, t.c_acctbal
          |FROM nation n,
          | LATERAL (SELECT c_custkey, c_acctbal FROM customer c
          |          WHERE c.c_nationkey = n.n_nationkey
          |          ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
          |ORDER BY n.n_name, t.c_custkey""".stripMargin,
      "q29_nullsafe" ->
        """WITH e AS (SELECT NULLIF(user_id % 4, 3) AS bucket, value FROM events),
          |d AS (SELECT * FROM (VALUES (0, 'a'), (1, 'b'), (2, 'c'), (NULL, 'nul')) AS t(bucket, tag))
          |SELECT tag, COUNT(*) AS n,
          | CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) AS sum_value
          |FROM e JOIN d ON e.bucket IS NOT DISTINCT FROM d.bucket
          |GROUP BY tag ORDER BY tag""".stripMargin,
      "q30_stragg" ->
        """SELECT l_returnflag,
          | string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses,
          | COUNT(*) AS n
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
      "data_weighted" ->
        """SELECT doc_id, n_chars FROM documents
          |WHERE CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE) / 4294967296.0
          |      < LEAST(CAST(1 AS DOUBLE), CAST(n_chars AS DOUBLE) / 600.0)
          |ORDER BY doc_id""".stripMargin,
      "data_topk_sample" ->
        """SELECT doc_id, h FROM (
          |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents ORDER BY h LIMIT 100)
          |ORDER BY doc_id""".stripMargin,
      "events_scd2" ->
        """WITH e AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type
          |           FROM events WHERE user_id % 10 = 0),
          |c AS (SELECT user_id, event_id, ts_us, event_type,
          |       lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev
          |      FROM e),
          |f AS (SELECT user_id, event_id, ts_us, event_type FROM c
          |      WHERE prev IS NULL OR prev <> event_type)
          |SELECT user_id, event_type, ts_us AS valid_from,
          | lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS valid_to
          |FROM f ORDER BY user_id, valid_from""".stripMargin,
      "events_funnel_conv" ->
        """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type FROM events),
          |fc AS (SELECT user_id, MIN(ts_us) AS first_click_us FROM e
          |       WHERE event_type = 'click' GROUP BY user_id),
          |j AS (SELECT fc.user_id, fc.first_click_us, p.ts_us AS pts
          |      FROM fc LEFT JOIN e p
          |       ON p.user_id = fc.user_id AND p.event_type = 'purchase' AND p.ts_us >= fc.first_click_us)
          |SELECT user_id, first_click_us, MIN(pts) AS first_purchase_us,
          | MIN(pts) IS NOT NULL AS converted
          |FROM j GROUP BY user_id, first_click_us ORDER BY user_id""".stripMargin,
      "events_intervals" ->
        """WITH iv AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS s,
          |            epoch_us(CAST(ts AS TIMESTAMP)) + 600000000 AS e
          |            FROM events WHERE user_id % 10 = 0),
          |t AS (SELECT user_id, s, e,
          |      MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
          |                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
          |      FROM iv),
          |t2 AS (SELECT user_id, s, e,
          |       SUM(CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END) OVER
          |        (PARTITION BY user_id ORDER BY s, e
          |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
          |       FROM t)
          |SELECT user_id, CAST(island AS BIGINT) AS island, MIN(s) AS s_us, MAX(e) AS e_us, COUNT(*) AS n
          |FROM t2 GROUP BY user_id, island ORDER BY user_id, island""".stripMargin,
      "events_resample" ->
        """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS bucket, value
          |           FROM events WHERE user_id % 10 = 0),
          |pb AS (SELECT user_id, bucket, COUNT(*) AS n,
          |       CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) AS sum_value
          |       FROM e GROUP BY user_id, bucket),
          |bounds AS (SELECT user_id, MIN(bucket) AS lo, MAX(bucket) AS hi FROM pb GROUP BY user_id
          |           HAVING MAX(bucket) - MIN(bucket) < 1000000),
          |grid AS (SELECT user_id, unnest(range(lo, hi+1)) AS bucket FROM bounds),
          |j AS (SELECT g.user_id, g.bucket, pb.n, pb.sum_value
          |      FROM grid g LEFT JOIN pb USING (user_id, bucket))
          |SELECT user_id, bucket, COALESCE(n, 0) AS n,
          | LAST_VALUE(sum_value IGNORE NULLS) OVER
          |  (PARTITION BY user_id ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sum_value,
          | n IS NULL AS gap
          |FROM j ORDER BY user_id, bucket""".stripMargin,
      "dedup_spans" ->
        s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
           |sh AS (SELECT doc_id, unnest(list_distinct(${shingles("tk", 8)})) AS s FROM t),
           |dfq AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY s),
           |agg AS (SELECT doc_id, COUNT(*) AS n_ngrams,
           |        CAST(COUNT(*) FILTER (df >= 2) AS BIGINT) AS n_dup
           |        FROM sh JOIN dfq USING (s) GROUP BY doc_id)
           |SELECT doc_id, n_ngrams, n_dup, CAST(n_dup AS DOUBLE)/n_ngrams AS dup_fraction
           |FROM agg ORDER BY doc_id""".stripMargin,
      "text_clean" ->
        """WITH c AS (SELECT doc_id,
          | trim(regexp_replace(
          |  replace(replace(replace(replace(replace(replace(
          |  replace(replace(replace(replace(replace(replace(
          |   regexp_replace(text, '<[^>]*>', ' ', 'g'),
          |   '&lt;','<'),'&gt;','>'),'&quot;','"'),'&#39;',''''),'&nbsp;',' '),'&amp;','&'),
          |   '“','"'),'”','"'),'‘',''''),'’',''''),'–','-'),'—','-'),
          |  '\s+', ' ', 'g')) AS t
          | FROM documents)
          |SELECT doc_id, length(t) AS clean_chars, md5(t) AS clean_md5
          |FROM c ORDER BY doc_id""".stripMargin,
      "data_mixture" ->
        """WITH c AS (SELECT lang, COUNT(*) AS cnt FROM documents
          |           WHERE lang IN ('en','de','fr','zh') GROUP BY lang),
          |t AS (SELECT lang, cnt, CASE lang
          |        WHEN 'en' THEN CAST(0.5 AS DOUBLE) WHEN 'de' THEN CAST(0.2 AS DOUBLE)
          |        WHEN 'fr' THEN CAST(0.2 AS DOUBLE) WHEN 'zh' THEN CAST(0.1 AS DOUBLE) END AS tf
          |      FROM c),
          |n AS (SELECT MIN(CAST(cnt AS DOUBLE) / tf) AS n_total FROM t),
          |r AS (SELECT lang, CAST(FLOOR(LEAST(CAST(1 AS DOUBLE), tf * n.n_total / CAST(cnt AS DOUBLE)) * 65536) AS INT) AS thr
          |      FROM t, n),
          |k AS (SELECT d.lang FROM documents d JOIN r USING (lang)
          |      WHERE r.thr >= 65536
          |         OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) < printf('%04x', r.thr))
          |SELECT lang, COUNT(*) AS n_kept FROM k GROUP BY lang ORDER BY lang""".stripMargin,
      "data_funnel" ->
        s"""WITH v AS (SELECT CASE
           | WHEN len($toks) < 20 THEN 'too_short'
           | WHEN n_chars > 450 THEN 'too_long'
           | WHEN lang <> 'en' THEN 'non_english'
           | ELSE 'kept' END AS verdict FROM documents)
           |SELECT verdict, COUNT(*) AS n_docs FROM v GROUP BY verdict ORDER BY verdict""".stripMargin,
      "data_domain_cap" ->
        """WITH r AS (SELECT doc_id, source, n_chars,
          |  ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn
          |  FROM documents)
          |SELECT doc_id, source, n_chars, rn FROM r WHERE rn <= 20
          |ORDER BY source, rn""".stripMargin,
      "dedup_containment" ->
        s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
           |sh AS (SELECT doc_id, list_distinct(${shingles("tk", 3)}) AS s FROM t),
           |e AS (SELECT doc_id, unnest(s) AS g FROM sh),
           |dfq AS (SELECT g, COUNT(*) AS df FROM e GROUP BY g),
           |rare AS (SELECT e.doc_id, e.g FROM e JOIN dfq USING (g) WHERE df <= 20),
           |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
           |         FROM rare a JOIN rare b ON a.g = b.g AND a.doc_id < b.doc_id),
           |v AS (SELECT a_id, b_id,
           |      len(list_intersect(sa.s, sb.s))::DOUBLE / LEAST(len(sa.s), len(sb.s)) AS containment
           |      FROM cand JOIN sh sa ON sa.doc_id = a_id JOIN sh sb ON sb.doc_id = b_id)
           |SELECT a_id, b_id, ROUND(containment, 4) AS containment
           |FROM v WHERE containment >= 0.9 ORDER BY a_id, b_id""".stripMargin,
      "dedup_ngram_jaccard" -> jaccardPairsSql(n = 3, threshold = 0.8),
      "dedup_embedding" ->
        s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
           |both_t AS (
           | SELECT vec_id, vec FROM base
           | UNION ALL SELECT vec_id + 100000, list_transform(vec, x -> x*1.001) FROM base)
           |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           | ROUND($dotExpr / (${normExpr("a")} * ${normExpr("b")}), 6) AS cosine
           |FROM both_t a JOIN both_t b ON a.vec_id < b.vec_id
           |WHERE ROUND($dotExpr / (${normExpr("a")} * ${normExpr("b")}), 6) >= 0.999
           |ORDER BY a_id, b_id""".stripMargin,
      "vec_quantize" ->
        """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
          |q AS (SELECT vec_id, vec, list_min(vec) AS lo, list_max(vec) AS hi FROM v),
          |c AS (SELECT vec_id, vec, lo, hi,
          |  list_transform(vec, x -> CASE WHEN hi - lo = 0 THEN 0
          |    ELSE CAST(round((x - lo) * 255 / (hi - lo)) AS INT) END) AS codes FROM q),
          |r AS (SELECT vec_id, lo, hi,
          |  list_aggregate(
          |   list_transform(
          |    list_zip(vec, list_transform(codes, cc -> CASE WHEN hi - lo = 0 THEN lo
          |      ELSE lo + cc::DOUBLE * (hi - lo) / 255 END)),
          |    p -> abs(p[1] - p[2])), 'max') AS max_abs_err
          | FROM c)
          |SELECT vec_id, lo, hi, max_abs_err FROM r ORDER BY vec_id""".stripMargin,
      "ann_bruteforce" ->
        s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
           |scored AS (
           | SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           |  ROUND($dotExpr / (${normExpr("a")} * ${normExpr("b")}), 6) AS cosine
           | FROM base a JOIN base b ON a.vec_id < 8 AND b.vec_id <> a.vec_id),
           |ranked AS (
           | SELECT query_id, neighbor_id, cosine,
           |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
           | FROM scored)
           |SELECT query_id, rank, neighbor_id, cosine FROM ranked WHERE rank <= 5
           |ORDER BY query_id, rank""".stripMargin,
      "text_tokens" ->
        s"""SELECT doc_id, len($toks) AS n_ws,
           | len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\\s]')) AS n_bpe
           |FROM documents ORDER BY doc_id""".stripMargin,
      "text_quality" ->
        s"""WITH q AS (SELECT doc_id,
           |  len($norm) AS n_chars_norm,
           |  len($norm) - len(regexp_replace($norm, '[^a-z0-9\\sà-ÿ一-鿿]', '', 'g')) AS punct_cnt,
           |  len($toks) AS n_tok,
           |  len(list_filter($toks, t -> list_contains($stopAll, t))) AS stop_hits
           | FROM documents)
           |SELECT doc_id, n_chars_norm, punct_cnt,
           | 0.4 * least(n_tok/50.0, 1.0)
           |  + 0.3 * (1.0 - (CASE WHEN n_chars_norm = 0 THEN 0.0 ELSE punct_cnt::DOUBLE/n_chars_norm END))
           |  + 0.3 * (CASE WHEN n_tok = 0 THEN 0.0 ELSE stop_hits::DOUBLE/n_tok END) AS quality_score
           |FROM q ORDER BY doc_id""".stripMargin,
      "text_langid" ->
        s"""WITH sc AS (SELECT doc_id,
           |  ${sL("en")} AS s_en, ${sL("de")} AS s_de, ${sL("es")} AS s_es,
           |  ${sL("fr")} AS s_fr, ${sL("zh")} AS s_zh
           | FROM documents)
           |SELECT doc_id, s_en, s_de, s_es, s_fr, s_zh,
           | CASE
           |  WHEN s_en > 0 AND s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
           |  WHEN s_de > 0 AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
           |  WHEN s_es > 0 AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
           |  WHEN s_fr > 0 AND s_fr >= s_zh THEN 'fr'
           |  WHEN s_zh > 0 THEN 'zh'
           |  ELSE 'und' END AS lang_guess
           |FROM sc ORDER BY doc_id""".stripMargin,
      "text_fingerprint" ->
        s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents)
           |SELECT doc_id, md5(array_to_string(tk, ' ')) AS fp,
           | list_aggregate(list_transform(${shingles("tk")}, s -> md5(s)), 'min') AS min_shingle_fp
           |FROM t ORDER BY doc_id""".stripMargin,
      "text_shingles" ->
        s"""WITH t AS (SELECT doc_id, ${shingles(toks)} AS s FROM documents)
           |SELECT doc_id, len(s) AS n_shingles, len(list_distinct(s)) AS n_distinct_shingles
           |FROM t ORDER BY doc_id""".stripMargin,
      "text_repetition" ->
        s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
           | s AS (SELECT doc_id, len(tk) AS n_tok, ${shingles("tk", 2)} AS sh FROM t)
           |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
           | CASE WHEN n_tok <= 2 THEN 0.0
           |  ELSE 1.0 - len(list_distinct(sh))::DOUBLE / len(sh) END AS rep_ratio
           |FROM s ORDER BY doc_id""".stripMargin,
      "data_split" ->
        s"""WITH s AS (SELECT doc_id, len($toks) AS n_tok,
           |            substr(md5(doc_id::VARCHAR), 1, 1) AS b FROM documents),
           |a AS (SELECT CASE WHEN b <= 'b' THEN 'train' WHEN b <= 'd' THEN 'val'
           |             ELSE 'test' END AS split, n_tok FROM s)
           |SELECT split, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
           |FROM a GROUP BY split ORDER BY split""".stripMargin,
      "text_chunks" ->
        s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
           |w AS (SELECT doc_id, tk,
           |       unnest(range(0, CAST(greatest(ceil((greatest(len(tk),1) - 8)/24.0), 1) AS BIGINT))) AS chunk_idx
           |      FROM t),
           |c AS (SELECT doc_id, chunk_idx, tk[chunk_idx*24+1 : chunk_idx*24+32] AS slc FROM w)
           |SELECT doc_id, chunk_idx, CAST(len(slc) AS BIGINT) AS n_tokens,
           | md5(array_to_string(slc, ' ')) AS chunk_hash
           |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
      "text_pii" ->
        """WITH t AS (SELECT doc_id,
          |  text || ' contact-' || doc_id::VARCHAR || '@example.com see https://ex.org/d/'
          |   || doc_id::VARCHAR || ' ref 9876543210' AS t2 FROM documents)
          |SELECT doc_id,
          | CAST(len(regexp_extract_all(t2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
          | CAST(len(regexp_extract_all(t2, 'https?://[^ \t\n]+')) AS BIGINT) AS n_urls,
          | CAST(len(regexp_extract_all(t2, '[0-9]{9,}')) AS BIGINT) AS n_long_nums,
          | md5(regexp_replace(regexp_replace(regexp_replace(t2,
          |   'https?://[^ \t\n]+', '<URL>', 'g'),
          |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          |   '[0-9]{9,}', '<NUM>', 'g')) AS scrub_hash
          |FROM t ORDER BY doc_id""".stripMargin,
      "pipeline_curation" ->
        s"""WITH dedup AS (
           | SELECT doc_id, text FROM (
           |  SELECT doc_id, text, ROW_NUMBER() OVER (PARTITION BY md5($norm) ORDER BY doc_id) AS rn
           |  FROM documents) WHERE rn = 1),
           |dt AS (SELECT doc_id, $toks AS tk FROM dedup),
           |dsh AS (SELECT doc_id, unnest(list_distinct(${shingles("tk", 8)})) AS s FROM dt),
           |bt AS (SELECT doc_id, $toks AS tk FROM documents WHERE doc_id % 50 = 0),
           |b AS (SELECT DISTINCT unnest(list_distinct(${shingles("tk", 8)})) AS s FROM bt),
           |contaminated AS (SELECT DISTINCT doc_id FROM dsh JOIN b USING (s)),
           |clean AS (SELECT doc_id, text FROM dedup
           |          WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
           |q AS (SELECT doc_id, $toks AS tk,
           |       len($norm) AS nc,
           |       len($norm) - len(regexp_replace($norm, '[^a-z0-9\\sà-ÿ一-鿿]', '', 'g')) AS pc,
           |       len(list_filter($toks, t -> list_contains($stopAll, t))) AS shits
           |      FROM clean),
           |f AS (SELECT doc_id, tk FROM q
           |      WHERE 0.4 * least(len(tk)/50.0, 1.0)
           |        + 0.3 * (1.0 - (CASE WHEN nc = 0 THEN 0.0 ELSE pc::DOUBLE/nc END))
           |        + 0.3 * (CASE WHEN len(tk) = 0 THEN 0.0 ELSE shits::DOUBLE/len(tk) END) >= 0.5),
           |sp AS (SELECT doc_id, tk,
           |        CASE WHEN substr(md5(doc_id::VARCHAR),1,1) <= 'b' THEN 'train'
           |             WHEN substr(md5(doc_id::VARCHAR),1,1) <= 'd' THEN 'val' ELSE 'test' END AS split,
           |        CAST(greatest(ceil((greatest(len(tk),1) - 8)/24.0), 1) AS BIGINT) AS n_chunks
           |       FROM f)
           |SELECT split, COUNT(*) AS n_docs, CAST(SUM(len(tk)) AS BIGINT) AS n_tokens,
           | CAST(SUM(n_chunks) AS BIGINT) AS n_chunks
           |FROM sp GROUP BY split ORDER BY split""".stripMargin,
      "multimodal_features" ->
        """SELECT doc_id, octet_length(encode(text)) AS byte_len,
          | CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS width,
          | CAST(octet_length(encode(text)) % 480 + 1 AS INT) AS height,
          | CAST(octet_length(encode(text)) % 30 + 1 AS INT) AS n_frames,
          | md5(text) AS content_hash
          |FROM documents ORDER BY doc_id""".stripMargin
    )
  }
}
