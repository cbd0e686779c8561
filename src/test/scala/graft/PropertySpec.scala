package graft

import graft.operators._
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks (ScalaCheck driven from ScalaTest, per
  * SURVEY.md §5.2): relational invariants that must hold for ANY data,
  * not just the fixtures. */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), p)
    assert(r.passed, r.status.toString)
  }

  private val statusGen = Gen.listOfN(40,
    Gen.oneOf("pending", "approved", "approve", "rejected"))

  test("A5 invariant: pending + approved + other == total") {
    import spark.implicits._
    check(Prop.forAll(statusGen) { statuses =>
      val df = statuses.toDF("status")
      val r = df.agg(
        count(lit(1)).as("t"),
        countIf($"status" === "pending").as("p"),
        countIf($"status".isin("approve", "approved")).as("a"),
        countIf(!$"status".isin("pending", "approve", "approved")).as("o")).head()
      r.getLong(0) == r.getLong(1) + r.getLong(2) + r.getLong(3)
    })
  }

  test("top-k is a prefix of the full sort") {
    import spark.implicits._
    check(Prop.forAll(Gen.listOfN(30, Gen.chooseNum(-1000, 1000))) { xs =>
      val df = xs.zipWithIndex.toDF("coins", "id")
      val full = df.orderBy($"coins".desc, $"id").collect().map(_.getInt(1)).toSeq
      val topk = df.orderBy($"coins".desc, $"id").limit(6).collect().map(_.getInt(1)).toSeq
      full.take(6) == topk
    })
  }

  test("W3 ledger: balance == base + credits − debits under any event log") {
    import spark.implicits._
    val eventGen = Gen.listOfN(25, for {
      u <- Gen.chooseNum(1L, 3L)
      t <- Gen.oneOf("purchase", "error", "view")
      v <- Gen.chooseNum(0, 1000).map(_ / 4.0) // exact binary fractions
    } yield (u, t, v))
    check(Prop.forAll(eventGen) { events =>
      val df = events.toDF("user_id", "event_type", "value")
      val got = df.groupBy($"user_id")
        .agg((lit(10.0)
          + dsum0(when($"event_type" === "purchase", $"value"))
          - dsum0(when($"event_type" === "error", $"value"))).as("coins"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val want = events.groupBy(_._1).map { case (u, es) =>
        u -> (10.0
          + es.filter(_._2 == "purchase").map(_._3).sum
          - es.filter(_._2 == "error").map(_._3).sum)
      }
      got == want
    })
  }

  test("set-operation algebra matches Scala set semantics") {
    import spark.implicits._
    val gen = for {
      a <- Gen.listOfN(25, Gen.chooseNum(0, 12))
      b <- Gen.listOfN(25, Gen.chooseNum(0, 12))
    } yield (a, b)
    check(Prop.forAll(gen) { case (a, b) =>
      val da = a.toDF("k"); val db = b.toDF("k")
      def vals(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.getInt(0)).toSet
      vals(da.union(db).distinct()) == (a.toSet | b.toSet) &&
        vals(da.intersect(db)) == (a.toSet & b.toSet) &&
        vals(da.except(db)) == (a.toSet -- b.toSet)
    })
  }

  test("d2 dedup is a fixpoint: survivors are dup-free and cover every text") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val out = Dedup.queries("d2_dedup_exact_select")(spark, dir)
      .join(Tables(spark, dir).documents.select($"doc_id", $"text"), "doc_id")
    // No two survivors share a text (running dedup again changes nothing) ...
    assert(out.groupBy($"text").count().filter($"count" > 1).count() == 0)
    // ... and every corpus text has a surviving representative.
    val missing = Tables(spark, dir).documents.select($"text")
      .join(out.select($"text"), Seq("text"), "left_anti").count()
    assert(missing == 0)
  }

  test("Misra-Gries: estimates undercount by ≤ N/(k+1); heavy items always survive") {
    // The mergeable-summaries contract behind t20, checked as pure
    // merge algebra under RANDOM merge trees and partitionings — no
    // Spark needed: reduce/merge are exactly what Spark's partial and
    // final aggregation call.
    val gen = for {
      n <- Gen.chooseNum(50, 400)
      // Skewed alphabet so genuine heavy hitters exist.
      xs <- Gen.listOfN(n, Gen.frequency(
        8 -> Gen.oneOf("the", "a", "of"),
        3 -> Gen.oneOf("b", "c", "d", "e"),
        2 -> Gen.alphaLowerStr.map(_.take(3))))
      cuts <- Gen.listOfN(4, Gen.chooseNum(0, n))
    } yield (xs, cuts)
    check(Prop.forAll(gen) { case (xs, cuts) =>
      val k = 8
      val mg = new graft.functions.MisraGries(k)
      // Split the stream at random cut points, reduce each slice, then
      // merge the slice buffers left-to-right (any tree is valid).
      val bounds = (0 +: cuts.sorted :+ xs.length).distinct.sorted
      val slices = bounds.zip(bounds.tail).map { case (a, b) => xs.slice(a, b) }
      val merged = slices
        .map(s => s.foldLeft(mg.zero)(mg.reduce))
        .foldLeft(mg.zero)(mg.merge)
      val (est, total) = mg.finish(merged)
      val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val estMap = est.toMap
      val n = xs.length.toLong
      total == n &&
        // No overestimate, bounded underestimate:
        estMap.forall { case (w, c) =>
          c <= truth(w) && truth(w) - c <= n / (k + 1) } &&
        // Containment: every item above the guarantee threshold present.
        truth.forall { case (w, c) => c <= n / (k + 1) || estMap.contains(w) }
    })
  }

  test("t10 split assignment is invariant to input partitioning") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val direct = TextAnalysis.queries("t10_train_split")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // Same rule applied to an adversarially re-partitioned copy of the
    // corpus: content-keyed assignment must not notice data layout —
    // the property that makes the split stable under resharding and
    // re-ingestion at warehouse scale.
    val reshuffled = Tables(spark, dir).documents
      .repartition(7, $"lang") // different key, different layout
      .select($"doc_id",
        when(substring(md5($"text"), 1, 2) < "cc", "train")
          .when(substring(md5($"text"), 1, 2) < "e6", "val")
          .otherwise("test").as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(direct == reshuffled)
  }

  test("semi-join result is a subset with no duplication") {
    import spark.implicits._
    val gen = for {
      left  <- Gen.listOfN(30, Gen.chooseNum(0, 10))
      right <- Gen.listOfN(10, Gen.chooseNum(0, 10))
    } yield (left, right)
    check(Prop.forAll(gen) { case (left, right) =>
      val l = left.zipWithIndex.toDF("k", "id")
      val r = right.toDF("k")
      val out = l.join(r, Seq("k"), "left_semi").collect()
      val keys = right.toSet
      out.length == left.count(keys.contains) &&
        out.forall(row => keys.contains(row.getInt(0)))
    })
  }
}
