package graft

import graft.operators.{Events, Joins, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Crafted recompute specs for the fourth-session catalog additions:
  * j12 as-of join (kernel tie/NULL semantics + fixture equivalence to
  * the brute-force form), t30 BM25 (driver-side score replay), s14
  * hard negatives (predicate exactness + independent margin recount),
  * e16 session paths (driver-side sessionization replay). */
class SessionOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    SparkEntry.queries(name)(spark, dir)

  // ---------------------------------------------------------------- j12

  test("asofJoin kernel: at-or-before, same-instant inclusion, rid tie-break, NULL when no prior") {
    import spark.implicits._
    val right = Seq(
      (1L, 10L, 1L, "A"), (1L, 20L, 2L, "B"), (1L, 20L, 3L, "C"),
      (1L, 50L, 4L, "D"), (3L, 7L, 9L, "Z"))
      .toDF("key", "ts", "rid", "v")
      .select($"key", $"ts", struct($"rid", $"v").as("m"))
    val left = Seq(
      (1L, 5L, 10L),  // before every quote -> NULL
      (1L, 10L, 11L), // same instant as rid 1 -> matches it ("at or before")
      (1L, 25L, 12L), // two quotes at ts 20 -> larger rid (3) wins
      (1L, 60L, 13L), // -> latest (rid 4)
      (2L, 30L, 14L)) // key with no right rows at all -> NULL
      .toDF("key", "ts", "lid")
    val rows = Joins.asofJoin(left, right)
      .select($"lid", $"m.rid", $"m.v").collect()
    val got = rows
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got == Map(10L -> -1L, 11L -> 1L, 12L -> 3L, 13L -> 4L, 14L -> -1L))
    // Exactly one row per LEFT row — right-only keys contribute none,
    // and no left row duplicates (length, not the map, proves it).
    assert(rows.length == 5)
  }

  test("j12 equals the brute-force non-equi + argmax form on the fixture") {
    import spark.implicits._
    val ev = Tables(spark, dir).events
    val v = ev.filter($"event_type" === "view")
      .select($"user_id", unix_micros($"ts").as("vus"),
        $"event_id".as("view_id"), $"value".as("view_value"))
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id", unix_micros($"ts").as("pus"))
    val arg = p.join(v, p("user_id") === v("user_id") && $"vus" <= $"pus", "left")
      .groupBy($"purchase_id", p("user_id").as("user_id"), $"pus")
      .agg(max(struct($"vus", $"view_id", $"view_value")).as("w"))
      .select($"purchase_id", $"user_id", $"w.view_id".as("view_id"),
        $"w.view_value".as("view_value"), ($"pus" - $"w.vus").as("staleness_us"))
    val want = arg.collect().map(_.toSeq.toVector).toSet
    val got = run("j12_asof_join").collect().map(_.toSeq.toVector).toSet
    assert(got == want)
    assert(got.nonEmpty)
    // Both populated and NULL (no-prior-view) outcomes must occur for
    // the fixture to actually exercise the outer semantics.
    assert(got.exists(r => r(2) != null))
    assert(got.exists(r => r(2) == null),
      "fixture must contain a purchase with no prior view")
  }

  // ---------------------------------------------------------------- t30

  test("t30 BM25: driver-side replay of the full scoring pipeline is bit-exact") {
    import spark.implicits._
    val terms = Seq("spark", "query", "window", "stream")
    val docs = Tables(spark, dir).documents
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1).split("\\s+").filter(_.nonEmpty)))
    val nDocs = docs.length.toLong
    val nTokens = docs.map(_._2.length.toLong).sum
    val avgdl = nTokens.toDouble / nDocs.toDouble
    val df = terms.map(t => t -> docs.count(_._2.contains(t)).toLong).toMap
    def round6(x: Double): Double =
      new java.math.BigDecimal(java.lang.Double.toString(x))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val want = docs.flatMap { case (id, toks) =>
      val dl = toks.length.toLong
      val scores = terms.flatMap { t =>
        val tf = toks.count(_ == t).toLong
        if (tf == 0) None else {
          val idf = math.log(1.0 + ((nDocs - df(t)).toDouble + 0.5) / (df(t).toDouble + 0.5))
          val tfn = (tf.toDouble * 2.2) /
            (tf.toDouble + 1.2 * (0.25 + (0.75 * dl.toDouble) / avgdl))
          Some(round6(idf * tfn))
        }
      }
      if (scores.isEmpty) None
      else Some((id,
        scores.map(s => BigDecimal(s).setScale(6)).sum.toDouble,
        scores.length.toLong))
    }.sortBy { case (id, s, _) => (-s, id) }.take(10)
      .zipWithIndex.map { case ((id, s, n), i) => (id, i + 1L, s, n) }.toVector
    val got = run("t30_bm25").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toVector
    assert(got == want)
    assert(got.size == 10 && got.map(_._4).max > 1,
      "fixture must exercise multi-term matches")
  }

  // ---------------------------------------------------------------- s14

  test("s14 hard negatives: wrong-label only, dense ranks, margins recount independently") {
    import spark.implicits._
    val emb = Tables(spark, dir).embeddings
      .select($"vec_id", $"embedding", $"label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def round6(x: Double): Double =
      new java.math.BigDecimal(java.lang.Double.toString(x))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val labels = emb.map(e => e._1 -> e._3).toMap
    val got = run("s14_hard_negatives").collect()
    assert(got.nonEmpty)
    // Replay: full cosine scan per query, wrong-label top-5 + best positive.
    val queries = emb.filter(_._1 < 5)
    val want = queries.flatMap { case (qid, qe, ql) =>
      val sims = emb.filter(_._1 != qid).map { case (id, e, l) =>
        (id, l, round6(dot(qe, e) / (math.sqrt(dot(qe, qe)) * math.sqrt(dot(e, e)))))
      }
      val pos = sims.filter(_._2 == ql).map(_._3).maxOption
      sims.filter(_._2 != ql).sortBy { case (id, _, s) => (-s, id) }.take(5)
        .zipWithIndex.map { case ((id, l, s), i) =>
          (qid, i + 1L, id, l, s, pos.map(p => round6(p - s)))
        }
    }.toSet
    val gotSet = got.map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getDouble(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)))
    }.toSet
    assert(gotSet == want)
    // Predicate exactness: no returned neighbor carries the query's label.
    assert(got.forall(r => labels(r.getLong(2)) == r.getInt(3)))
    got.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to rows.length))
    }
  }

  // ---------------------------------------------------------------- s15

  test("s15 retrieval metrics: textbook nDCG/MRR/recall replay is bit-exact") {
    import spark.implicits._
    val emb = Tables(spark, dir).embeddings
      .select($"vec_id", $"embedding", $"label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def rnd(x: Double, s: Int): Double =
      new java.math.BigDecimal(java.lang.Double.toString(x))
        .setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()
    val want = emb.filter(_._1 < 5).map { case (qid, qe, ql) =>
      val ranked = emb.filter(_._1 != qid).map { case (id, e, l) =>
        (id, l == ql,
          rnd(dot(qe, e) / (math.sqrt(dot(qe, qe)) * math.sqrt(dot(e, e))), 6))
      }.sortBy { case (id, _, s) => (-s, id) }.zipWithIndex
        .map { case ((id, rel, s), i) => (i + 1L, rel) }
      val nRel = ranked.count(_._2).toLong
      val dcgTerms = ranked.filter { case (rk, rel) => rk <= 10 && rel }
        .map { case (rk, _) => BigDecimal(rnd(math.log(2.0) / math.log((rk + 1).toDouble), 9)).setScale(9) }
      val dcg = if (dcgTerms.isEmpty) 0.0 else dcgTerms.sum.toDouble
      val idcg = (1L to math.min(nRel, 10L)).map(i =>
        BigDecimal(rnd(math.log(2.0) / math.log((i + 1).toDouble), 9)).setScale(9))
        .sum.toDouble
      val firstRel = ranked.find(_._2).get._1
      val hits10 = ranked.count { case (rk, rel) => rk <= 10 && rel }.toLong
      (qid, nRel, dcg, rnd(dcg / idcg, 6), rnd(1.0 / firstRel.toDouble, 6),
        rnd(hits10.toDouble / nRel.toDouble, 6))
    }.sortBy(_._1).toVector
    val got = run("s15_retrieval_metrics").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toVector
    assert(got == want)
    got.foreach { case (_, nRel, _, ndcg, mrr, rec) =>
      assert(nRel > 0 && ndcg >= 0 && ndcg <= 1 && mrr > 0 && mrr <= 1
        && rec >= 0 && rec <= 1)
    }
  }

  // ---------------------------------------------------------------- s16

  test("s16 MMR: driver-side greedy replay is bit-exact, and picks are measurably more diverse than top-5") {
    import spark.implicits._
    val emb = Tables(spark, dir).embeddings
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def rnd(x: Double, s: Int): Double =
      new java.math.BigDecimal(java.lang.Double.toString(x))
        .setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()
    def cos(a: Array[Float], b: Array[Float]): Double =
      rnd(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))), 6)
    val byId = emb.toMap
    val queries = emb.filter(_._1 < 5)
    val want = queries.flatMap { case (qid, qe) =>
      val cand = emb.filter(_._1 != qid)
        .map { case (id, e) => (id, cos(qe, e)) }
        .sortBy { case (id, s) => (-s, id) }.take(20)
      var remaining = cand
      var picked = Vector.empty[(Long, Double, Double)] // (id, rel, score)
      var maxsim = Map.empty[Long, Double].withDefaultValue(0.0)
      for (r <- 1 to 5) {
        val scored = remaining.map { case (id, rel) =>
          (id, rel, rnd(0.7 * rel - 0.3 * maxsim(id), 7))
        }
        val (pid, prel, pscore) =
          scored.sortBy { case (id, _, s) => (-s, id) }.head
        picked :+= ((pid, prel, pscore))
        remaining = remaining.filter(_._1 != pid)
        maxsim = remaining.map { case (id, _) =>
          id -> math.max(maxsim(id), cos(byId(pid), byId(id)))
        }.toMap.withDefaultValue(0.0)
        ()
      }
      picked.zipWithIndex.map { case ((id, rel, sc), i) =>
        (qid, i + 1L, id, rel, sc)
      }
    }.toVector.sortBy(t => (t._1, t._2))
    val got = run("s16_mmr_rerank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toVector
    assert(got == want)
    // The operator's reason to exist: vs pure top-5, at least one query
    // re-ranks, and MMR's picks are mutually LESS similar on average.
    val top5 = queries.map { case (qid, qe) =>
      qid -> emb.filter(_._1 != qid).map { case (id, e) => (id, cos(qe, e)) }
        .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1)
    }.toMap
    val mmr5 = got.groupBy(_._1).map { case (q, rows) => q -> rows.map(_._3) }
    assert(queries.exists { case (qid, _) => mmr5(qid).toSet != top5(qid).toSet },
      "MMR must actually re-rank somewhere")
    def meanPairSim(ids: Seq[Long]): Double = {
      val ps = for (i <- ids.indices; j <- i + 1 until ids.size)
        yield cos(byId(ids(i)), byId(ids(j)))
      ps.sum / ps.size
    }
    val mmrDiv = queries.map { case (q, _) => meanPairSim(mmr5(q)) }.sum
    val topDiv = queries.map { case (q, _) => meanPairSim(top5(q).toSeq) }.sum
    assert(mmrDiv < topDiv, s"MMR picks must be more diverse: $mmrDiv vs $topDiv")
  }

  // --------------------------------------------------------------- pipe6

  test("pipe6 RRF: fusion arithmetic recounts from the leg ranks; both single-leg and dual-leg docs surface") {
    val got = run("pipe6_hybrid_rrf").collect()
    assert(got.length == 10)
    def rnd9(x: Double): Double =
      new java.math.BigDecimal(java.lang.Double.toString(x))
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    got.foreach { r =>
      val rka = if (r.isNullAt(2)) None else Some(r.getLong(2))
      val rkb = if (r.isNullAt(3)) None else Some(r.getLong(3))
      assert(rka.isDefined || rkb.isDefined)
      assert(rka.forall(k => k >= 1 && k <= 50) && rkb.forall(k => k >= 1 && k <= 50))
      val want = rnd9(rka.map(k => 1.0 / (60L + k).toDouble).getOrElse(0.0)
        + rkb.map(k => 1.0 / (60L + k).toDouble).getOrElse(0.0))
      assert(r.getDouble(4) == want, s"rrf recount mismatch at doc ${r.getLong(0)}")
    }
    // The fusion is real: the top-10 must mix dual-leg docs with docs
    // that only one ranker surfaced (rank-cut or missing embedding).
    assert(got.exists(r => !r.isNullAt(2) && !r.isNullAt(3)), "a dual-leg doc")
    assert(got.exists(r => r.isNullAt(2) || r.isNullAt(3)), "a single-leg doc")
    // Scores are non-increasing in rank with doc_id tie-break.
    val rs = got.sortBy(_.getLong(1)).map(r => (r.getDouble(4), r.getLong(0)))
    assert(rs.sliding(2).forall { case Array((s1, d1), (s2, d2)) =>
      s1 > s2 || (s1 == s2 && d1 < d2) })
  }

  // ---------------------------------------------------------------- e17

  test("e17 RFM: driver-side cutpoint + rule replay is exact; segments cover every purchasing user once") {
    import spark.implicits._
    // Fetch only the per-user rollup primitives (last purchase micros,
    // count, exact decimal sum); quantization, quartile cutpoints, and
    // the rule table are all replayed driver-side.
    val users = Tables(spark, dir).events
      .filter($"event_type" === "purchase")
      .groupBy($"user_id")
      .agg(max(unix_micros($"ts")).as("last_us"), count(lit(1)).as("n"),
        sum($"value".cast("decimal(18,6)")).as("mdec"))
      .collect().map { r =>
        val mdec = BigDecimal(r.getDecimal(3))
        (r.getLong(0),
          // r_v: day index, HALF_UP round of the long→double quotient
          BigDecimal(r.getLong(1).toDouble / 86400e6)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble,
          r.getLong(2).toDouble,                                // f_v
          mdec.setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble, // m_v cents
          mdec.toDouble)                                        // monetary
      }
    // percentile_cont replay: h = p·(n−1), linear interpolation.
    def cut(vs: Array[Double], p: Double): Double = {
      val s = vs.sorted; val h = p * (s.length - 1); val lo = math.floor(h).toInt
      if (lo + 1 >= s.length) s(lo) else s(lo) + (h - lo) * (s(lo + 1) - s(lo))
    }
    def score(v: Double, vs: Array[Double]): Int =
      1 + Seq(0.25, 0.5, 0.75).count(p => v > cut(vs, p))
    val (rVs, fVs, mVs) = (users.map(_._2), users.map(_._3), users.map(_._4))
    val segs = users.map { case (_, rv, fv, mv, m) =>
      val (r, f, ms) = (score(rv, rVs), score(fv, fVs), score(mv, mVs))
      val seg =
        if (r == 4 && f == 4 && ms == 4) "champion"
        else if (r <= 1 && f >= 3) "at_risk"
        else if (r == 4 && f <= 2) "promising"
        else if (f >= 3) "loyal"
        else if (ms == 4) "big_spender"
        else "regular"
      (seg, m)
    }
    val want = segs.groupBy(_._1).map { case (s, xs) =>
      (s, xs.length.toLong,
        xs.map(x => BigDecimal(x._2).setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble)
    }.toSeq.sortBy(_._1).toVector
    val got = run("e17_rfm_segments").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toVector
    assert(got == want)
    assert(got.map(_._2).sum == users.length, "segments partition the users")
    assert(got.size >= 2, "the rule table must actually discriminate")
  }

  // ---------------------------------------------------------------- e16

  test("e16 session paths: driver-side sessionization replay is exact") {
    import spark.implicits._
    val ev = Tables(spark, dir).events
      .select($"user_id", unix_micros($"ts").as("us"), $"event_id", $"event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val paths = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      val sessions = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer[(Long, Long, String)]())
      var prev = Long.MinValue
      sorted.foreach { case (_, us, eid, typ) =>
        if (prev != Long.MinValue && us - prev > 600000000L)
          sessions += scala.collection.mutable.ArrayBuffer()
        sessions.last += ((us, eid, typ))
        prev = us
      }
      sessions.map(s => s.sortBy(e => (e._1, e._2)).map(_._3).mkString(">"))
    }
    val want = paths.groupBy(identity).map { case (p, xs) => (p, xs.length.toLong) }
      .toSeq.sortBy { case (p, n) => (-n, p) }.take(10)
      .zipWithIndex.map { case ((p, n), i) => (i + 1L, p, n) }.toVector
    val got = run("e16_session_paths").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toVector
    assert(got == want)
    assert(got.exists(_._2.contains(">")), "multi-event sessions must exist")
  }
}
