package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-12 additions: the DECIMAL-output tripwire and this round's
  * new operators. */
class Round12OpsSpec extends SparkSpec {
  import spark.implicits._

  test("Verify decimal tripwire: DecimalType leaves are found at any nesting") {
    // a deliberately-decimal result schema must trip (round-11 verdict
    // item 2: the driver's canonical hash diverges on DECIMAL — rounds
    // 1 and 11 both burned on it while the local value-compare passed)
    val df = Seq((1, BigDecimal(1.5))).toDF("id", "amt")
      .select(col("id"), col("amt").cast(DecimalType(18, 2)).as("amt"),
        struct(col("amt").cast(DecimalType(12, 2)).as("inner")).as("s"),
        array(col("amt").cast(DecimalType(10, 1))).as("arr"))
    val hits = df.schema.fields.toSeq.flatMap(f => Verify.decimalCols(f.dataType, f.name))
    assert(hits == Seq("amt", "s.inner", "arr[]"), hits.toString)
    // and a clean DOUBLE/BIGINT schema must not
    val ok = Seq((1L, 1.5)).toDF("id", "v")
      .select(col("id"), col("v"), struct(col("v").as("x")).as("s"))
    assert(ok.schema.fields.toSeq.flatMap(f => Verify.decimalCols(f.dataType, f.name)).isEmpty)
  }
}
