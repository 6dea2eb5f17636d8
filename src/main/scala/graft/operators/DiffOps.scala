package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level table diff with G-Research spark-extension semantics, built
  * natively on a single full-outer join (the reference delegates to
  * uk.co.gresearch.spark.diff — /root/reference/diff/src/main/scala/dev/mauch/spark/dfio/DiffTransformerParser.scala:38-45).
  *
  * Output schema: `diff` ∈ {"N","C","I","D"}, id columns, then
  * `left_<c>`, `right_<c>` for every non-id column (ignored columns are
  * carried but not compared).
  *   - "N" unchanged, "C" changed, "I" inserted (right only),
  *     "D" deleted (left only).
  *
  * Scale: one shuffle on the id columns (sort-merge or broadcast if one
  * side is small — left to Catalyst/AQE). Comparison is a codegen'd
  * projection; no collect except in `failOnDifferences`, which only
  * collects a bounded sample of diff rows for the error message.
  */
object DiffOps {

  def diff(
      left: DataFrame,
      right: DataFrame,
      idColumns: Seq[String] = Seq.empty,
      ignoreColumns: Seq[String] = Seq.empty
  ): DataFrame = {
    require(
      left.columns.sorted.sameElements(right.columns.sorted),
      s"diff requires equal schemas, got ${left.columns.mkString(",")} vs ${right.columns.mkString(",")}"
    )
    val ids = if (idColumns.nonEmpty) idColumns else left.columns.toSeq
    val valueCols = left.columns.toSeq.filterNot(ids.contains)
    val compareCols = valueCols.filterNot(ignoreColumns.contains)

    val l = left.withColumn("__l", lit(true))
    val r = right.withColumn("__r", lit(true))
    val joined = l.as("l").join(r.as("r"), ids.map(c => col(s"l.`$c`") <=> col(s"r.`$c`")).reduceOption(_ && _).getOrElse(lit(true)), "full_outer")

    val existsL = col("l.__l").isNotNull
    val existsR = col("r.__r").isNotNull
    val changed = compareCols
      .map(c => !(col(s"l.`$c`") <=> col(s"r.`$c`")))
      .reduceOption(_ || _)
      .getOrElse(lit(false))

    val diffCol = when(existsL && !existsR, "D")
      .when(!existsL && existsR, "I")
      .when(changed, "C")
      .otherwise("N")
      .as("diff")

    val idOut: Seq[Column] = ids.map(c => coalesce(col(s"l.`$c`"), col(s"r.`$c`")).as(c))
    val valOut: Seq[Column] = valueCols.flatMap(c =>
      Seq(col(s"l.`$c`").as(s"left_$c"), col(s"r.`$c`").as(s"right_$c")))

    joined.select(diffCol +: (idOut ++ valOut): _*)
  }

  /** Keep only rows that differ (diff != "N"). */
  def onlyDifferences(diffed: DataFrame): DataFrame = diffed.filter(col("diff") =!= "N")

  /** Throw if any differences exist (reference handleDifferences=fail). */
  def failOnDifferences(diffed: DataFrame, sample: Int = 20): DataFrame = {
    val diffs = onlyDifferences(diffed).take(sample)
    if (diffs.nonEmpty)
      throw new RuntimeException(s"Differences found (first ${diffs.length}): ${diffs.mkString(", ")}")
    diffed
  }

  /** MERGE INTO for plain tables (diff's inverse — CDC apply):
    * `updates` rows override base rows sharing `keyCols`, new keys
    * insert, and rows whose optional `deleteCol` is true drop the key.
    * An update's NULL value column OVERRIDES the base value (presence is
    * tracked by a marker, not by coalesce — the distinction MERGE
    * semantics require). Updates must be unique per key.
    *
    * Scale: one full-outer shuffle join on the key — the snapshot-refresh
    * shape for formats without transactional MERGE; write the result
    * back partitioned and the refresh parallelizes trivially.
    */
  def merge(
      base: DataFrame,
      updates: DataFrame,
      keyCols: Seq[String],
      deleteCol: Option[String] = None
  ): DataFrame = {
    val dataCols = base.columns.toSeq.filterNot(keyCols.contains)
    val u = updates.withColumn("__upd", lit(true))
    val joined = base.as("b").join(u.as("u"),
      keyCols.map(k => col(s"b.`$k`") <=> col(s"u.`$k`")).reduce(_ && _), "full_outer")
    val isUpd = coalesce(col("__upd"), lit(false))
    val keep = deleteCol
      .map(dc => !(isUpd && coalesce(col(s"u.`$dc`"), lit(false))))
      .getOrElse(lit(true))
    joined.filter(keep).select(
      keyCols.map(k => coalesce(col(s"u.`$k`"), col(s"b.`$k`")).as(k)) ++
        dataCols.map(c => when(isUpd, col(s"u.`$c`")).otherwise(col(s"b.`$c`")).as(c)): _*)
  }
}
