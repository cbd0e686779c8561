package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The empirical-scaling fixture generator must scale VOLUME without
  * changing any query's asymptotic class (ScaleUp's scaladoc contract).
  * Each test pins one of the structural invariants the scaling-exponent
  * measurements in SURVEY §12 depend on. */
class ScaleUpSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val src = "/root/testdata/sf0.001"
  private val reps = 3
  private lazy val out: String = {
    val d = graft.Scratch.dir(s"scaleup_spec_${spark.sparkContext.applicationId}")
    ScaleUp.run(spark, src, d, reps)
    d
  }

  private def srcT(n: String): DataFrame = spark.read.parquet(s"$src/$n.parquet")
  private def outT(n: String): DataFrame = spark.read.parquet(s"$out/$n.parquet")

  test("row counts: fixed dims copied 1x, every fact table exactly Rx, schemas unchanged") {
    for (n <- Seq("region", "nation")) {
      assert(outT(n).count() == srcT(n).count(), n)
      assert(outT(n).schema == srcT(n).schema, n)
    }
    for (n <- Seq("customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings")) {
      assert(outT(n).count() == reps * srcT(n).count(), n)
      assert(outT(n).schema == srcT(n).schema, n)
    }
  }

  test("key shift preserves join fanout: orders-per-customer distribution is identical per replica") {
    import spark.implicits._
    // Histogram of (orders per custkey) -> count of custkeys with that
    // fanout. Replication must multiply every histogram bar by exactly
    // R: join fanout and group cardinality per key are the source's.
    def hist(df: DataFrame): Map[Long, Long] =
      df.groupBy($"o_custkey").count()
        .groupBy($"count".as("fanout")).count()
        .as[(Long, Long)].collect().toMap
    val s = hist(srcT("orders"))
    val o = hist(outT("orders"))
    assert(o == s.map { case (fanout, nKeys) => fanout -> (nKeys * reps) })
  }

  test("foreign keys stay within their replica: every scaled lineitem joins an order, Rx join rows") {
    val joined = outT("lineitem").join(outT("orders"),
      col("l_orderkey") === col("o_orderkey"))
    assert(joined.count() == reps * srcT("lineitem").count())
  }

  test("replica-perturbed documents: exact-dup structure replicates; cross-replica shingles disjoint") {
    import spark.implicits._
    // Within-replica: identical source texts perturb identically, so
    // the dup-group histogram (group size -> #groups) scales by exactly R.
    def dupHist(df: DataFrame): Map[Long, Long] =
      df.groupBy($"text").count().where($"count" > 1)
        .groupBy($"count".as("sz")).count().as[(Long, Long)].collect().toMap
    val s = dupHist(srcT("documents"))
    assert(dupHist(outT("documents")) ==
      s.map { case (sz, n) => sz -> (n * reps) })
    // ... and distinct-text cardinality scales exactly Rx (replica tags
    // make texts cross-replica distinct; perturbation is injective).
    assert(outT("documents").select($"text").distinct().count() ==
      reps * srcT("documents").select($"text").distinct().count())
    // Across replicas: the marker token after every 4th word breaks
    // every 3-gram shingle window, so a doc shares NO shingle with its
    // own replica twin -> cross-replica Jaccard is 0 and near-dup
    // volume grows linearly in R, never quadratically.
    val dDoc = srcT("documents").agg(max($"doc_id")).head().getLong(0) + 1L
    val shingles = outT("documents")
      .select($"doc_id", split($"text", " ").as("w"))
      .where(size($"w") >= 3) // sequence(0, n-3) reverses when n<3
      .select($"doc_id", explode(expr(
        "transform(sequence(0, size(w)-3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))")).as("sh"))
    val crossPairs = shingles.as("a").join(shingles.as("b"),
        $"a.sh" === $"b.sh" &&
          ($"a.doc_id" % dDoc) === ($"b.doc_id" % dDoc) &&
          $"a.doc_id" < $"b.doc_id")
      .count()
    assert(crossPairs == 0L)
  }

  test("name tags: within-replica edit distances unchanged, no cross-replica pair within distance 1") {
    import spark.implicits._
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val dSupp = srcT("supplier").agg(max($"s_suppkey")).head().getLong(0) + 1L
    val srcN = srcT("supplier").select($"s_suppkey", $"s_name")
      .as[(Long, String)].collect().toMap
    val outN = outT("supplier").select($"s_suppkey", $"s_name")
      .as[(Long, String)].collect().toMap
    // a common suffix leaves Levenshtein distances exactly unchanged
    for ((i, a) <- srcN; (j, b) <- srcN if i < j; r <- 0 until reps)
      assert(lev(outN(i + r * dSupp), outN(j + r * dSupp)) == lev(a, b))
    // distinct replica tags differ in all 3 positions -> never fuzzy-joinable
    for ((i, a) <- outN; (j, b) <- outN
         if i < j && (i / dSupp) != (j / dSupp))
      assert(lev(a, b) > 1, s"cross-replica pair ($i,$j) within distance 1")
  }

  test("orthogonal embedding transform: within-replica geometry exact, cross-replica decorrelated") {
    import spark.implicits._
    val nSrc = srcT("embeddings").agg(max($"vec_id")).head().getLong(0) + 1L
    val dot = (a: Seq[Float], b: Seq[Float]) =>
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val byId = outT("embeddings")
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .collect().toMap
    val srcById = srcT("embeddings")
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .collect().toMap
    // Norms are preserved exactly up to summation order (permutation +
    // sign flips permute the squared terms); pairwise dots likewise.
    for ((id, v) <- srcById.take(50)) {
      for (r <- 0 until reps) {
        val w = byId(id + r * nSrc)
        assert(math.abs(dot(w, w) - dot(v, v)) < 1e-4, s"norm, id=$id rep=$r")
      }
    }
    val ids = srcById.keys.toSeq.sorted.take(20)
    for (i <- ids; j <- ids if i < j; r <- 1 until reps) {
      val (a0, b0) = (srcById(i), srcById(j))
      val (a1, b1) = (byId(i + r * nSrc), byId(j + r * nSrc))
      // same replica: inner products survive the orthogonal transform
      assert(math.abs(dot(a1, b1) - dot(a0, b0)) < 1e-4, s"pair ($i,$j) rep $r")
    }
    // cross-replica: a vector against its own twin must NOT stay at
    // cosine 1 (the transform decorrelates replicas). Averaged over a
    // sample, |cos| should drop to random-direction levels (<0.5).
    val twinCos = ids.map { i =>
      val (v, w) = (srcById(i), byId(i + 1 * nSrc))
      math.abs(dot(v, w)) / math.sqrt(dot(v, v) * dot(w, w))
    }
    assert(twinCos.sum / twinCos.size < 0.5,
      s"replica twins still correlated: ${twinCos.sum / twinCos.size}")
  }

  // ---- time-axis stretch (r11 verdict #4) ----------------------------

  /** ts in epoch micros regardless of the column's physical encoding
    * (int64 NANOS or a timestamp type). */
  private def microsCol(df: DataFrame) =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _ => expr("unix_micros(CAST(ts AS TIMESTAMP))")
    }

  test("time-axis stretch: each replica's event timestamps are the source's shifted by r x span days; per-window density never grows") {
    import spark.implicits._
    val sEv = srcT("events")
    val srcMicros = sEv.select(microsCol(sEv).as("m")).as[Long]
      .collect().sorted.toSeq
    val dEv = sEv.agg(max($"event_id")).as[Long].head() + 1
    val axisDays = (srcMicros.max - srcMicros.min) / 86400000000L + 1L
    val oEv = outT("events")
    for (r <- 0 until reps) {
      // The doc-dated invariant: un-shifting replica r reproduces the
      // source's timestamp multiset EXACTLY — every within-replica
      // window/session/interval result is the source's, relabeled.
      val got = oEv
        .filter($"event_id" >= r * dEv && $"event_id" < (r + 1) * dEv)
        .select((microsCol(oEv) - lit(r * axisDays * 86400000000L)).as("m"))
        .as[Long].collect().sorted.toSeq
      assert(got == srcMicros,
        s"replica $r timestamps must be the source's shifted by r x axis span")
    }
    // Density, the point of the stretch: the busiest 10-minute bucket
    // holds exactly as many events at Rx volume as at 1x (the shared
    // axis made it Rx busier — the quadratic-window artifact).
    def maxBucket(df: DataFrame): Long =
      df.select((microsCol(df).cast("long") / 600000000L).cast("long").as("b"))
        .groupBy($"b").count().agg(max($"count")).as[Long].head()
    assert(maxBucket(oEv) == maxBucket(sEv),
      "per-window density must be constant across the stretch")
  }

  test("stretch-order-dates: interval-overlap pairs never cross replicas, replica 0 reproduces the source pairs exactly") {
    import spark.implicits._
    val d2 = graft.Scratch.dir(
      s"scaleup_stretch_${spark.sparkContext.applicationId}")
    ScaleUp.run(spark, src, d2, reps, Set("orders", "lineitem"),
      stretchOrderAxis = true)
    val dOrd = srcT("orders").agg(max($"o_orderkey")).as[Long].head() + 1
    val pairs = operators.Joins.queries("j11_interval_overlap")(spark, d2)
      .select($"ak", $"bk").as[(Long, Long)].collect().toSeq
    assert(pairs.nonEmpty, "the probe needs a non-trivial pair set")
    val cross = pairs.count { case (a, b) => a / dOrd != b / dOrd }
    assert(cross == 0,
      s"stretched replicas must contribute ZERO cross-replica overlaps, got $cross")
    // Replica 0 is byte-verbatim, so its within-replica pair set must
    // BE the source's — the stretch relabels time, never re-pairs.
    val srcPairs = operators.Joins.queries("j11_interval_overlap")(spark, src)
      .select($"ak", $"bk").as[(Long, Long)].collect().toSeq.sorted
    val rep0 = pairs.filter { case (a, b) => a < dOrd && b < dOrd }.sorted
    assert(rep0 == srcPairs, "replica 0 must reproduce the source pair set")
  }
}
