package graft

import graft.operators.{Joins, Scalars, TextAnalysis, WritePath}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavior + plan contracts for the round-2 pipeline operators:
  * train/test splitting, per-source capping, bloom-pruned semi-join,
  * partitioned sink, CSV round-trip. */
class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("t10 split is ~80/10/10, exhaustive, and dup-consistent") {
    val rows = TextAnalysis.queries("t10_train_split")(spark, dir).collect()
    val n = rows.length.toDouble
    val bySplit = rows.groupBy(_.getString(1)).view.mapValues(_.length / n).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(math.abs(bySplit("train") - 0.797) < 0.08, bySplit)
    assert(math.abs(bySplit("val") - 0.102) < 0.05, bySplit)
    // Content-keyed: byte-identical documents always share a split, so
    // exact dups can never straddle train/test.
    import spark.implicits._
    val docs = Tables(spark, dir).documents
    val assigned = docs.select($"doc_id", $"text")
      .join(TextAnalysis.queries("t10_train_split")(spark, dir), "doc_id")
    val straddling = assigned.groupBy($"text")
      .agg(countDistinct($"split").as("k")).filter($"k" > 1).count()
    assert(straddling == 0)
  }

  test("t11 caps every source at 50 and picks a deterministic subset") {
    val out = TextAnalysis.queries("t11_source_cap")(spark, dir)
    val perSource = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSource.values.forall(_ <= 50), perSource)
    assert(perSource.nonEmpty)
    val again = TextAnalysis.queries("t11_source_cap")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(again == out.collect().map(_.getLong(0)).toSet)
  }

  test("j7 bloom prune is at the fact scan and is semantically transparent") {
    import spark.implicits._
    val df = Joins.queries("j7_bloom_semi_join")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
    // Transparent: same result as the plain semi-join.
    val t = Tables(spark, dir)
    val dim = t.supplier
      .join(t.nation.filter($"n_name" === "NATION_19"),
        $"s_nationkey" === $"n_nationkey", "left_semi")
      .select($"s_suppkey")
    val plain = t.lineitem
      .join(dim, $"l_suppkey" === $"s_suppkey", "left_semi")
      .groupBy($"l_suppkey")
      .agg(count(lit(1)).as("n_items"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloomed = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bloomed == plain)
    assert(plain.nonEmpty)
  }

  test("w7 read-back prunes partitions on the lang filter") {
    import spark.implicits._
    // Run the query (which writes the partitioned layout), then check a
    // filtered read-back plans directory pruning, not a full scan.
    WritePath.queries("w7_partitioned_write")(spark, dir).collect()
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_w7_partitioned"
    val filtered = spark.read.parquet(out).filter($"lang" === "en")
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(lang"), scan)
    // And the partition column round-trips as data.
    assert(filtered.count() ==
      Tables(spark, dir).documents.filter($"lang" === "en").count())
  }

  test("x2 CSV round-trip is lossless for count, keys, and decimal sum") {
    import spark.implicits._
    val row = Scalars.queries("x2_csv_roundtrip")(spark, dir).head()
    val src = Tables(spark, dir).supplier
    assert(row.getLong(0) == src.count())
    assert(row.getLong(1) == src.select(countDistinct($"s_suppkey")).head().getLong(0))
  }
}
