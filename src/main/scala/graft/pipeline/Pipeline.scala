package graft.pipeline

import graft.operators.{DiffOps, FlattenOps}
import graft.sources.SourceRegistry
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A declared ETL pipeline: named sources → named transforms → named sinks.
  *
  * Execution contract matches the reference CLI
  * (/root/reference/etl/src/main/scala/dev/mauch/spark/dfio/ETL.scala:100-130):
  *   - each source reads and registers a temp view under its name
  *     (default "source");
  *   - with no transforms, an implicit `source→sink` identity runs;
  *   - each transform reads view `in`, registers result as view `out`
  *     (defaults "source"/"sink");
  *   - sinks run in order and stop at the first failure; run() returns
  *     whether all sinks succeeded.
  *
  * Everything stays a lazy DataFrame plan until a sink materializes it, so
  * Catalyst sees the whole pipeline (pushdown through SQL transforms etc.).
  */
final case class Pipeline(
    sources: Seq[(String, SparkSession => DataFrame)],
    transforms: Seq[(String, String, DataFrame => DataFrame)],
    sinks: Seq[(String, DataFrame => Boolean)]
) {
  def run(spark: SparkSession): Boolean = {
    sources.foreach { case (name, rd) =>
      rd(spark).createOrReplaceTempView(name)
    }
    val effective =
      if (transforms.isEmpty) Seq(("source", "sink", identity[DataFrame] _))
      else transforms
    effective.foreach { case (in, out, fn) =>
      fn(spark.table(in)).createOrReplaceTempView(out)
    }
    val ok = sinks.takeWhile { case (name, wr) => wr(spark.table(name)) }
    ok.length == sinks.length
  }

  /** Convenience for tests/queries: run sources+transforms, return view. */
  def resultView(spark: SparkSession, view: String): DataFrame = {
    sources.foreach { case (name, rd) => rd(spark).createOrReplaceTempView(name) }
    val effective =
      if (transforms.isEmpty) Seq(("source", "sink", identity[DataFrame] _))
      else transforms
    effective.foreach { case (in, out, fn) =>
      fn(spark.table(in)).createOrReplaceTempView(out)
    }
    spark.table(view)
  }
}

object Pipeline {

  /** Transformer registry: scheme → DataFrame => DataFrame. The SQL
    * transformer registers its input as view `input` (reference
    * TransformerParser.scala:22-34) in addition to the named views.
    */
  def transformerFor(uri: Uris.ParsedUri): DataFrame => DataFrame = uri.scheme match {
    case "identity" => identity[DataFrame]
    case "sql" =>
      df => {
        val sql = Uris.decode(uri.path.stripPrefix("/"))
        df.createOrReplaceTempView("input")
        df.sparkSession.sql(sql)
      }
    case "sql_file" | "sql-file" =>
      df => {
        val sql = {
          val src = scala.io.Source.fromFile(uri.path)
          try src.mkString
          finally src.close()
        }
        df.createOrReplaceTempView("input")
        df.sparkSession.sql(sql)
      }
    case "flatten"                              => FlattenOps.flatten
    case "flatten_explode" | "flatten-explode"  => FlattenOps.flattenExplode
    case "diff" =>
      df => {
        val params = uri.queryParams
        val ids = params.get("id").map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty)).getOrElse(Seq.empty)
        val ignore = params.get("ignore").map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty)).getOrElse(Seq.empty)
        val rightView = uri.relPath
        require(rightView.nonEmpty, "diff: right table view path is empty")
        val right = df.sparkSession.table(rightView)
        val diffed = DiffOps.diff(df, right, ids, ignore)
        params.get("handleDifferences").map(_.toLowerCase) match {
          case Some("filter") => DiffOps.onlyDifferences(diffed)
          case Some("fail")   => DiffOps.failOnDifferences(diffed)
          case _              => diffed
        }
      }
    case other =>
      throw new IllegalArgumentException(
        s"transform scheme '$other' not in: identity, sql, sql-file, flatten, flatten-explode, diff")
  }

  /** Parse reference-style CLI args:
    * `--source uri --transform uri --sink uri [--master m] [--app-name n]`.
    */
  def fromArgs(args: Seq[String]): (Pipeline, Map[String, String]) = {
    val opts = scala.collection.mutable.Map.empty[String, String]
    val sources = scala.collection.mutable.ArrayBuffer.empty[(String, SparkSession => DataFrame)]
    val transforms = scala.collection.mutable.ArrayBuffer.empty[(String, String, DataFrame => DataFrame)]
    val sinks = scala.collection.mutable.ArrayBuffer.empty[(String, DataFrame => Boolean)]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--source" =>
          val (name, uri) = Uris.sourceOrSinkUri(args(i + 1), "source")
          sources += name -> (spark => SourceRegistry.forUri(uri)(spark).read())
          i += 2
        case "--transform" =>
          val (in, out, uri) = Uris.transformUri(args(i + 1))
          transforms += ((in, out, transformerFor(uri)))
          i += 2
        case "--sink" =>
          val (name, uri) = Uris.sourceOrSinkUri(args(i + 1), "sink")
          sinks += name -> (df => SourceRegistry.forUri(uri)(df.sparkSession).write(df))
          i += 2
        case "--master" | "--app-name" | "--appName" =>
          opts += args(i).stripPrefix("--") -> args(i + 1)
          i += 2
        case other =>
          throw new IllegalArgumentException(s"unknown arg '$other'")
      }
    }
    (Pipeline(sources.toSeq, transforms.toSeq, sinks.toSeq), opts.toMap)
  }
}

/** CLI entry point compatible with the reference's `ETL` main. */
object EtlCli {
  def main(args: Array[String]): Unit = {
    val (pipeline, opts) = Pipeline.fromArgs(args.toIndexedSeq)
    val builder0 = SparkSession.builder().appName(opts.getOrElse("app-name", "graft-etl"))
    val builder1 = SourceRegistry.sparkConfigs.foldLeft(builder0) { case (b, (k, v)) => b.config(k, v) }
    // default to local[*] when neither --master nor spark-submit set one
    val master = opts.get("master")
      .orElse(sys.props.get("spark.master"))
      .orElse(sys.env.get("SPARK_MASTER"))
      .getOrElse("local[*]")
    // graft's native SQL functions (graft_dot, graft_minhash_sig, ...) and
    // the range-join bucketing rule are part of the CLI's sql:// surface
    val builder = builder1.master(master).withExtensions(new graft.GraftExtensions)
    val spark = builder.getOrCreate()
    val ok = pipeline.run(spark)
    println(if (ok) "Write successful" else "Writing to sink failed")
    if (!ok) sys.exit(1)
  }
}
