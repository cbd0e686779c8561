package graft

import graft.operators._
import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's edge semantics (SURVEY.md §1.4) as executable facts,
  * on micro-fixtures that contain the edge rows the parquet fixtures
  * don't (nulls, legacy status values, dangling FKs, over-capacity).
  * Sites are /root/reference/index.js. */
class QuirkSemanticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("P5: Mongo $ne matches missing fields — null-safe not(<=>) keeps nulls") {
    // index.js:599-602: {status: {$ne: 'deleted'}} matches docs with no status.
    val tasks = Seq(("t1", "open"), ("t2", "deleted"), ("t3", null))
      .toDF("id", "status")
    val kept = tasks.filter(!($"status" <=> "deleted")).select("id")
      .as[String].collect().sorted
    assert(kept.toSeq == Seq("t1", "t3"))
    // The naive =!= silently drops the null row — the bug we must not have:
    assert(tasks.filter($"status" =!= "deleted").count() == 1)
  }

  test("A6/F10: null-tolerant fold — sum(coalesce(x, 0)) over null amounts") {
    // index.js:340-343: reduce((s, x) => s + (x.payable_amount || 0), 0)
    val subs = Seq(Some(10.0), None, Some(2.5), None).toDF("payable_amount")
    val total = subs.agg(dsum0(coalesce($"payable_amount", lit(0.0))).as("t"))
      .as[Double].head()
    assert(total == 12.5)
  }

  test("A3: empty aggregate yields 0, not null") {
    // index.js:566,1210: agg[0]?.total || 0
    val empty = Seq.empty[Double].toDF("amount_usd")
    assert(empty.agg(dsum0($"amount_usd")).as[Double].head() == 0.0)
  }

  test("P6: legacy status drift — isin('approve', 'approved')") {
    // index.js:612-615: {$in: ['approve', 'approved']}
    val subs = Seq("approve", "approved", "pending", "rejected").toDF("status")
    assert(subs.filter($"status".isin("approve", "approved")).count() == 2)
  }

  test("J2: enrichment join defaults on dangling task_id") {
    // index.js:354-356: missing task → 'Unknown Task' / 'Unknown Buyer'
    val subs = Seq(("s1", "t1"), ("s2", "t404")).toDF("sid", "task_id")
    val tasks = Seq(("t1", "Write docs", "buyer@x")).toDF("tid", "task_title", "buyer_name")
    val out = subs.join(tasks, $"task_id" === $"tid", "left_outer")
      .select($"sid",
        coalesce($"task_title", lit("Unknown Task")).as("title"),
        coalesce($"buyer_name", lit("Unknown Buyer")).as("buyer"))
      .orderBy($"sid").collect()
    assert(out(0) == Row("s1", "Write docs", "buyer@x"))
    assert(out(1) == Row("s2", "Unknown Task", "Unknown Buyer"))
  }

  test("W5: capacity rule approves exactly required_workers, deterministically") {
    // index.js:816-822 admits overshoot under concurrency; the batch rule
    // (row_number <= capacity by submit time) cannot.
    val subs = Seq(
      ("t1", "s1", 1L), ("t1", "s2", 2L), ("t1", "s3", 3L),
      ("t1", "s4", 4L), ("t1", "s5", 5L), ("t2", "s6", 1L))
      .toDF("task_id", "sid", "submitted_at")
    val w = Window.partitionBy($"task_id").orderBy($"submitted_at", $"sid")
    val approved = subs.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3).select("sid").as[String].collect().toSet
    assert(approved == Set("s1", "s2", "s3", "s6"))
  }

  test("A5: one-pass conditional counts partition the total") {
    // index.js:335-337: total / pending / approved from one fetched array.
    val subs = Seq("pending", "approved", "approved", "rejected", "pending")
      .toDF("status")
    val r = subs.agg(
      count(lit(1)).as("total"),
      countIf($"status" === "pending").as("p"),
      countIf($"status" === "approved").as("a")).head()
    assert(r.getLong(0) == 5 && r.getLong(1) == 2 && r.getLong(2) == 2)
  }

  test("t8 scrub masks emails, URLs, and long digit runs") {
    // The fixture corpus has no PII, so the masking behavior is pinned
    // on crafted rows using the same expressions as the catalog query.
    val df = Seq(
      "mail me at a.b+x@test.org or see https://ex.com/p?q=1 ref 1234567 end",
      "clean text with short 123 numbers only")
      .toDF("text")
    val scrubbed = df.select(
      regexp_replace(regexp_replace(regexp_replace($"text",
        "https?://[^\\s]+", "<URL>"),
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
        "[0-9]{6,}", "<NUM>").as("s")).as[String].collect()
    assert(scrubbed(0) == "mail me at <EMAIL> or see <URL> ref <NUM> end")
    assert(scrubbed(1) == "clean text with short 123 numbers only")
  }

  test("W3: balance identity — base + credits − debits") {
    // The analytic restatement of every $inc site (index.js:312,489,...).
    val events = Seq(
      (1L, "purchase", 5.0), (1L, "error", 2.0), (1L, "view", 99.0),
      (2L, "purchase", 1.0))
      .toDF("user_id", "event_type", "value")
    val out = events.groupBy($"user_id")
      .agg((lit(10.0)
        + dsum0(when($"event_type" === "purchase", $"value"))
        - dsum0(when($"event_type" === "error", $"value"))).as("coins"))
      .orderBy($"user_id").as[(Long, Double)].collect()
    assert(out.toSeq == Seq((1L, 13.0), (2L, 11.0)))
  }
}
