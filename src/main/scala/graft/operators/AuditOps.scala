package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational governance audits over a star/snowflake schema.
  *
  * Reference scope: the reference engine ships schema-level checks only
  * as ad-hoc SQL (reference/core ETL.scala sql transformer); a curation
  * pipeline at 100 TB needs referential integrity as a first-class,
  * cheap, single-pass report — orphaned fact rows silently break every
  * downstream join-based metric.
  */
object AuditOps {

  /** One foreign-key edge: child(fkCol) must exist in parent(pkCol).
    * Keys must be integral (the audit stacks every edge into one long
    * key column). */
  final case class FkEdge(
      childName: String, child: DataFrame, fkCol: String,
      parentName: String, parent: DataFrame, pkCol: String) {
    def label: String = s"$childName.$fkCol->$parentName.$pkCol"
  }

  /** Referential-integrity audit: for every FK edge, the number of
    * child rows carrying a non-null key with no parent row (SQL FK
    * semantics: NULL keys are not violations).
    *
    * Scale shape — the whole audit is ONE join, not one per edge:
    * each child table is scanned ONCE, emitting (edge, key) pairs for
    * all of its FK columns in-row (`inline` of a struct array — 3 FK
    * columns of lineitem cost one pass over the fact table, not three);
    * one groupBy collapses the pairs to the DISTINCT (edge, key) domain
    * BEFORE any parent data is touched, so the shuffle carries key
    * domains, never fact rows. Parent pk columns union into one
    * (edge, key) side — pks are assumed unique (they are declared
    * primary keys; no distinct pass is spent re-proving it) — and a
    * single left join + edge-keyed aggregate yields every edge's
    * report. AQE broadcasts the parent side when the dims are small.
    */
  def fkAudit(edges: Seq[FkEdge]): DataFrame = {
    // one scan per distinct child table, all its edges stacked in-row
    val childPairs = edges.groupBy(e => e.childName).values.map { es =>
      val structs = es.map(e =>
        struct(lit(e.label).as("fk"), col(e.fkCol).cast("long").as("k")))
      es.head.child.select(inline(array(structs: _*)))
    }.reduce(_ unionAll _)
    val grouped = childPairs
      .filter(col("k").isNotNull)
      .groupBy("fk", "k")
      .agg(count(lit(1)).as("c"))
    val parents = edges.map { e =>
      e.parent.select(lit(e.label).as("fk"), col(e.pkCol).cast("long").as("k"))
    }.reduce(_ unionAll _).withColumn("hit", lit(1))
    grouped
      .join(parents, Seq("fk", "k"), "left")
      .groupBy("fk")
      .agg(
        sum(col("c")).cast("bigint").as("n_rows"),
        coalesce(sum(when(col("hit").isNull, col("c"))), lit(0L))
          .cast("bigint").as("n_orphans"))
      .orderBy("fk")
  }

  /** One declarative data-quality expectation: `measured` is any
    * aggregate expression over the table; `ok` is a predicate on the
    * measured value. */
  final case class Expectation(name: String, measured: org.apache.spark.sql.Column,
      ok: org.apache.spark.sql.Column => org.apache.spark.sql.Column)

  /** Data-contract check: evaluate every expectation in ONE scan (a
    * single aggregate computes all measured values; the per-rule rows
    * are an in-row stack of that 1-row frame) and emit
    * (rule, measured DOUBLE, ok BOOLEAN) — the pass/fail report a
    * pipeline gates a publish step on. 100 TB cost = one pass over the
    * table regardless of rule count. */
  def expectations(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    val measured = df.agg(
      rules.head.measured.cast("double").as("m0"),
      rules.tail.zipWithIndex.map { case (r, i) =>
        r.measured.cast("double").as(s"m${i + 1}") }: _*)
    val stacked = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("rule"), col(s"m$i").as("measured"),
        r.ok(col(s"m$i")).as("ok"))
    }
    measured.select(inline(array(stacked: _*))).orderBy("rule")
  }

  /** The full TPC-H-ish FK graph over the driver testdata tables. */
  def tpchFkEdges(s: SparkSession, dir: String): Seq[FkEdge] = {
    def t(n: String) = s.read.parquet(s"$dir/$n.parquet")
    val (li, ord, cust, supp, nat) =
      (t("lineitem"), t("orders"), t("customer"), t("supplier"), t("nation"))
    Seq(
      FkEdge("lineitem", li, "l_orderkey", "orders", ord, "o_orderkey"),
      FkEdge("lineitem", li, "l_partkey", "part", t("part"), "p_partkey"),
      FkEdge("lineitem", li, "l_suppkey", "supplier", supp, "s_suppkey"),
      FkEdge("orders", ord, "o_custkey", "customer", cust, "c_custkey"),
      FkEdge("customer", cust, "c_nationkey", "nation", nat, "n_nationkey"),
      FkEdge("supplier", supp, "s_nationkey", "nation", nat, "n_nationkey"),
      FkEdge("nation", nat, "n_regionkey", "region", t("region"), "r_regionkey"))
  }
}
