package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Embedded file-backed commit-log table format — the `delta://` seam's
  * in-container backend (round-12 verdict item 7: the Delta OSS jar is
  * not vendorable in this zero-egress image — no artifact exists in any
  * local cache — so the scheme's COMMIT-LOG SEMANTICS are exercised
  * against this minimal transaction log instead of throwing
  * UnsupportedSourceInEnv; the RegistryClientFactory seam precedent).
  *
  * What it implements (the Delta core a pipeline actually relies on):
  *  - a table = data files + an ordered log of JSON commits under
  *    `_graft_log/` (`00000000.json`, `00000001.json`, …), each commit
  *    recording `append` (adds files) or `overwrite` (replaces the live
  *    file set);
  *  - ATOMIC commits: data files are staged first, the commit file
  *    lands last via ATOMIC_MOVE with create-new semantics — a reader
  *    never sees half a commit, a crashed writer leaves only orphaned
  *    staging files the log never references;
  *  - optimistic concurrency: losing a version race (the move hits an
  *    existing commit file) re-reads the log and retries at the next
  *    version — appends serialize, they do not clobber;
  *  - snapshot reads + TIME TRAVEL: a read resolves the file set by
  *    replaying the log up to `versionAsOf` (default: latest), so
  *    readers are isolated from concurrent appends and any historical
  *    version stays reproducible (files are never deleted here — VACUUM
  *    is out of scope).
  *
  * NOT implemented (documented, fail-loud where reachable): MERGE/DML
  * on the log (graft's merge/diff operators cover the semantics at the
  * DataFrame layer), checkpoint compaction of the log, VACUUM, schema
  * evolution enforcement beyond parquet's own.
  */
object EmbeddedCommitLog {

  final case class Commit(version: Int, action: String, files: Seq[String])

  private def logDir(table: String): Path = Paths.get(table, "_graft_log")

  private def render(c: Commit): String =
    s"""{"version":${c.version},"action":"${c.action}","files":[""" +
      c.files.map("\"" + _ + "\"").mkString(",") + "]}"

  // parser for OUR OWN one-line format above — not a general JSON reader
  private val commitRe =
    """\{"version":(\d+),"action":"(append|overwrite)","files":\[(.*)\]\}""".r

  private def parse(s: String): Commit = s.trim match {
    case commitRe(v, a, fs) =>
      val files =
        if (fs.isEmpty) Nil
        else fs.split(",").toSeq.map(_.stripPrefix("\"").stripSuffix("\""))
      Commit(v.toInt, a, files)
    case other => sys.error(s"EmbeddedCommitLog: unparseable commit '$other'")
  }

  def commits(table: String): Seq[Commit] = {
    val dir = logDir(table)
    if (!Files.isDirectory(dir)) Nil
    else {
      import scala.jdk.CollectionConverters._
      Files.list(dir).iterator().asScala.toSeq
        .filter(_.getFileName.toString.endsWith(".json"))
        .sortBy(_.getFileName.toString)
        .map(p => parse(Files.readString(p, StandardCharsets.UTF_8)))
    }
  }

  /** The live file set at `versionAsOf` (inclusive; None = latest):
    * replay — overwrite resets, append accumulates. */
  def filesAt(table: String, versionAsOf: Option[Int]): Seq[String] = {
    val log = commits(table)
    require(log.nonEmpty, s"EmbeddedCommitLog: $table has no commits")
    versionAsOf.foreach { v =>
      require(log.exists(_.version == v),
        s"EmbeddedCommitLog: $table has no version $v (latest ${log.last.version})")
    }
    val upTo = versionAsOf.fold(log)(v => log.filter(_.version <= v))
    upTo.foldLeft(Seq.empty[String]) { (live, c) =>
      if (c.action == "overwrite") c.files else live ++ c.files
    }
  }

  def read(spark: SparkSession, table: String, versionAsOf: Option[Int]): DataFrame = {
    val files = filesAt(table, versionAsOf)
    require(files.nonEmpty,
      s"EmbeddedCommitLog: $table is empty at version ${versionAsOf.getOrElse("latest")}")
    spark.read.parquet(files.map(f => Paths.get(table, f).toString): _*)
  }

  /** Stage data files, then land the commit ATOMICALLY; retries the
    * version on a concurrent-writer race. Returns the committed version. */
  def write(df: DataFrame, table: String, overwrite: Boolean): Int = {
    val tableDir = Paths.get(table)
    Files.createDirectories(logDir(table))
    val stamp = java.util.UUID.randomUUID().toString.take(8)
    val staging = tableDir.resolve(s"_staging_$stamp")
    df.write.parquet(staging.toString)
    import scala.jdk.CollectionConverters._
    val parts = Files.list(staging).iterator().asScala.toSeq
      .filter(_.getFileName.toString.endsWith(".parquet")).sortBy(_.toString)
    val names = parts.zipWithIndex.map { case (p, i) =>
      val name = s"part-$stamp-$i.parquet"
      Files.move(p, tableDir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
      name
    }
    // clean the now-empty staging dir (best effort — _SUCCESS, .crc)
    Files.walk(staging).iterator().asScala.toSeq.reverse.foreach(p =>
      try Files.deleteIfExists(p) catch { case _: Throwable => () })
    var version = commits(table).lastOption.fold(0)(_.version + 1)
    var done = -1
    while (done < 0) {
      val tmp = logDir(table).resolve(s".tmp_$stamp")
      Files.writeString(tmp,
        render(Commit(version, if (overwrite) "overwrite" else "append", names)),
        StandardCharsets.UTF_8)
      try {
        // createLink is the POSIX create-new atomic primitive (a plain
        // ATOMIC_MOVE is rename(2), which silently REPLACES an existing
        // target): either this writer owns the version or the link
        // fails and we retry one higher — the optimistic-concurrency loop
        Files.createLink(logDir(table).resolve(f"$version%08d.json"), tmp)
        Files.deleteIfExists(tmp)
        done = version
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(tmp)
          version += 1
      }
    }
    done
  }
}
