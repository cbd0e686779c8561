package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Loader-armor guards (ADVICE r8): the decimal→double normalization
  * must REFUSE precision it cannot carry exactly, and the legacy NANOS
  * conf must be scoped by the footer probe instead of set blanket. */
class TablesGuardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("decimal within double's exact range casts; wider decimal fails loudly") {
    import spark.implicits._
    val base = Scratch.tempDir("tables_guard")
    // A narrow-decimal 'customer': normalizes to double.
    Seq((1L, BigDecimal("12.34"))).toDF("c_custkey", "c_acctbal")
      .select($"c_custkey", $"c_acctbal".cast("decimal(12,2)").as("c_acctbal"))
      .write.mode("overwrite").parquet(s"$base/narrow/customer.parquet")
    val ok = Tables(spark, s"$base/narrow").customer
    assert(ok.schema("c_acctbal").dataType
      == org.apache.spark.sql.types.DoubleType)
    assert(ok.select(sum($"c_acctbal")).head().getDouble(0) == 12.34)
    // A 20-digit decimal: silent rounding would corrupt money sums and
    // diverge from an oracle reading the parquet exactly — must throw.
    Seq((1L, BigDecimal("12345678901234567.89"))).toDF("c_custkey", "c_acctbal")
      .select($"c_custkey", $"c_acctbal".cast("decimal(20,2)").as("c_acctbal"))
      .write.mode("overwrite").parquet(s"$base/wide/customer.parquet")
    val e = intercept[IllegalStateException](Tables(spark, s"$base/wide").customer)
    assert(e.getMessage.contains("DECIMAL(20,2)"), e.getMessage)
  }

  test("the NANOS footer probe answers without a session conf and matches the loaded type") {
    // Whatever this fixture generation's encoding is, the probe must
    // agree with what the adaptive loader ends up doing: NANOS → the
    // legacy conf is needed (ts would surface as Long pre-conversion);
    // otherwise the conf stays unset on a fresh reader.
    val nanos = Tables.eventsCarriesNanos(dir) // session-free overload
    assert(Tables.eventsCarriesNanos(spark, dir) == nanos) // cached, consistent
    val ts = Tables(spark, dir).events.schema("ts").dataType
    assert(ts == org.apache.spark.sql.types.TimestampType) // normalized either way
    if (!nanos)
      assert(spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
        .forall(_ == "false"),
        "probe said no NANOS but the legacy conf got set anyway")
  }
}
