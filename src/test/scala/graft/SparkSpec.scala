package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for operator specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  @transient lazy val spark: SparkSession = SparkSpec.session

  override def afterAll(): Unit = super.afterAll()
}

object SparkSpec {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-tests")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Session-isolated clone: shares the SparkContext, catalog and cache
    * but owns its SQL conf. Plan-shape suites (QueryPlanBudgetSpec,
    * PlanAuditSpec) run on one of these so that (a) their own conf
    * flips (adaptive off, broadcast threshold −1) cannot leak into
    * suites running in parallel on the shared session, and (b) other
    * suites' flips cannot change the exchange counts they pin — sbt
    * runs suites concurrently in the forked JVM, and a shared-session
    * conf race makes an exact-count pin a coin flip (round-14 VERDICT
    * item 1).
    */
  def isolated(): SparkSession = session.newSession()
}
