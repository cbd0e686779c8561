package graft

import graft.operators.{Dedup, Similarity}
import org.scalatest.funsuite.AnyFunSuite

/** Cross-checks between the approximate (LSH) tiers and their exact
  * ground-truth tiers, on the sf0.001 fixtures (real planted dups). */
class DedupSimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("d13 semantic dedup: kept flags equal a driver-side SemDeDup recompute") {
    val out = Similarity.queries("d13_semantic_dedup")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    assert(out.size == corpus.length)
    // Same arithmetic as the engine: left-to-right float→double dot,
    // HALF_UP 6-decimal round — bit-exact, so == comparisons hold.
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }; s
    }
    def r6(x: Double): Double = new java.math.BigDecimal(java.lang.Double.toString(x))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val nrm = corpus.map { case (id, e) => id -> math.sqrt(dot(e, e)) }.toMap
    // Two-level replay mirroring the engine: C0 coarse centroids route
    // both the fine centroids and the vectors; each vector argmaxes
    // over only its coarse cell's fine centroids, falling back to the
    // coarse centroid itself when the cell attracted none.
    val k = math.max(8L, math.ceil(corpus.length / 250.0).toLong)
    val c0 = math.max(8L, math.ceil(math.sqrt(k.toDouble)).toLong)
    val fine = corpus.filter(_._1 < k)
    val coarse = corpus.filter(_._1 < c0)
    def route(e: Array[Float], self: Long): (Double, Long) = coarse
      .map { case (c, ce) => (r6(dot(e, ce) / (nrm(self) * nrm(c))), c) }
      .maxBy { case (s, c) => (s, -c) }
    val fineByCoarse: Map[Long, Array[(Long, Array[Float])]] =
      fine.map { case (cid, ce) => (route(ce, cid)._2, (cid, ce)) }
        .groupBy(_._1).map { case (cc, xs) => cc -> xs.map(_._2) }
    val assigned = corpus.map { case (id, e) =>
      val (gsim, cc) = route(e, id)
      fineByCoarse.get(cc) match {
        case Some(cands) =>
          val (csim, cell) = cands
            .map { case (c, ce) => (r6(dot(e, ce) / (nrm(id) * nrm(c))), c) }
            .maxBy { case (s, c) => (s, -c) }
          (id, e, cell, csim)
        case None => (id, e, cc, gsim)
      }
    }
    // Assignment and centroid-sim agree.
    assigned.foreach { case (id, _, cell, csim) =>
      assert(out(id)._1 == cell && out(id)._2 == csim, s"vec $id assignment")
    }
    // Drop rule: v is dropped iff a same-cell neighbor at cos >= 0.45
    // has a strictly lower (centroid-sim, id) key.
    val byCell = assigned.groupBy(_._3)
    var nDropped = 0
    assigned.foreach { case (id, e, cell, csim) =>
      val dominated = byCell(cell).exists { case (id2, e2, _, csim2) =>
        id2 != id &&
          r6(dot(e, e2) / (nrm(id) * nrm(id2))) >= 0.45 &&
          (csim2 < csim || (csim2 == csim && id2 < id))
      }
      assert(out(id)._3 == !dominated, s"vec $id kept flag")
      if (dominated) nDropped += 1
    }
    // The per-cell minimum-(csim, id) member can never be dominated.
    byCell.values.foreach { cell =>
      val champ = cell.minBy { case (id, _, _, csim) => (csim, id) }
      assert(out(champ._1)._3, "cluster champion must be kept")
    }
    assert(nDropped > 0, "fixture should exercise the drop branch")
  }

  test("m6 perceptual hashes equal a driver recompute from the pixel formulas; banding equals brute force") {
    val hashes = graft.operators.Multimodal.m6Hashes(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).getBytes("UTF-8")))
    assert(hashes.size == docs.length)
    docs.foreach { case (id, payload) =>
      val L = payload.length
      val v = (id / 3) % 2
      val w = (8 + (L.toLong * 3) % 300).toInt
      val h = (8 + (L.toLong * 7) % 220).toInt
      var hash = 0L
      val s = Array.tabulate(60) { k =>
        val x = ((2 * (k % 10) + 1) * w) / 20
        val y = ((2 * (k / 10) + 1) * h) / 12
        val base = y.toLong * w + x
        val idx = if (v == 0) base else base * 3
        payload((idx % L).toInt) & 0xFF
      }
      val total = s.map(_.toLong).sum
      (0 until 60).foreach(k => if (s(k).toLong * 60 >= total) hash |= 1L << k)
      assert(hashes(id) == hash, s"doc $id perceptual hash")
    }
    // Banded pigeonhole pairing == brute force over the same hashes
    // (recall exactly 1 at hamming <= 3).
    val pairs = graft.operators.Multimodal.queries("m6_perceptual_neardup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = (for {
      (i, hi) <- hashes; (j, hj) <- hashes
      if i < j && java.lang.Long.bitCount(hi ^ hj) <= 3
    } yield (i, j)).toSet
    assert(pairs == brute)
  }

  test("d14 containment sees the quote-inside-a-long-doc pair that Jaccard is blind to") {
    import spark.implicits._
    // doc 1: a 12-word "quote"; doc 2: the quote verbatim + 60 words of
    // filler — c(1→2) = 1 but J(1,2) ≈ 0.14, invisible at d3's τ=0.5;
    // doc 3: an exact copy of doc 1 (both directions must appear).
    val quote = (1 to 12).map(i => s"q$i").mkString(" ")
    val filler = (1 to 60).map(i => s"f$i").mkString(" ")
    val tmp = graft.Scratch.tempDir("d14")
    Seq((1L, quote), (2L, s"$quote $filler"), (3L, quote))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val d14 = SparkEntry.queries("d14_containment")(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // Directed: 1→2 contained (c = 1.0); 2→1 absent (10/70 < 0.8);
    // exact twins 1↔3 appear both ways; 3→2 contained like 1→2.
    assert(d14.toSet == Set((1L, 2L, 1.0), (1L, 3L, 1.0), (3L, 1L, 1.0), (3L, 2L, 1.0)))
    val d3 = SparkEntry.queries("d3_dedup_ngram_jaccard")(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // Symmetric Jaccard at τ=0.5 sees only the exact twins — the
    // contained-quote pair is below its radar; that asymmetry is d14's
    // reason to exist.
    assert(d3.toSet == Set((1L, 3L)))
  }

  test("d14 hot-shingle salting: fully-salted containment equals the unsalted form on the corpus fixture") {
    // hotMin = 1 salts EVERY shingle (each pair must meet in exactly
    // one salt bucket); hotMin = MaxValue salts none. Identical output
    // = the salting changed shuffle layout, never semantics — the
    // equivalence the 100x spill fix rides on (r11 verdict #1).
    val salted = operators.Dedup
      .d14Containment(spark, dir, 1L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
    val unsalted = operators.Dedup
      .d14Containment(spark, dir, Long.MaxValue).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
    assert(salted.nonEmpty, "the fixture must produce containment pairs")
    assert(salted == unsalted,
      "salted and unsalted containment must produce identical pairs")
  }

  test("d4 MinHash+LSH finds exactly the brute-force pairs at j >= 0.8") {
    val brute = Dedup.queries("d3_dedup_ngram_jaccard")(spark, dir)
      .filter("jaccard >= 0.8")
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.queries("d4_dedup_minhash_lsh")(spark, dir)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == brute) // recall 1 − (1−j²)¹⁶ ≈ 1 at j≥0.8; precision via exact verify
    assert(brute.nonEmpty)  // fixture really contains near-dups
  }

  test("optimized shingle pipeline equals the HOF spec form") {
    import org.apache.spark.sql.functions._
    // Dedup.shingleRows (posexplode + window leads, codegen'd) must
    // produce exactly the shingle set of the readable HOF specification.
    val spec = Dedup.docShingles(spark, dir)
      .select(col("doc_id"), explode(col("shingles")).as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val fast = Dedup.shingleRows(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(fast == spec)
    assert(spec.nonEmpty)
  }

  test("hashed-shingle kernel equals xxhash64 over the HOF spec shingles") {
    import org.apache.spark.sql.functions._
    // docShingleHashes computes XXH64 inside the map kernel; it must
    // produce exactly the sorted xxhash64 values Spark's builtin computes
    // over the spec form's shingle strings (same seed-42 UTF-8 kernel).
    val spec = Dedup.docShingles(spark, dir)
      .select(col("doc_id"),
        sort_array(transform(col("shingles"), s => xxhash64(s))).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val fast = Dedup.docShingleHashes(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fast == spec)
    assert(spec.values.exists(_.nonEmpty))
  }

  test("dedup_normalize kernel is byte-equal to the two-regex normalize pipeline (fixture + adversarial strings)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // Adversarial shapes: multi-byte UTF-8 (each byte is a separator
    // under the kernel, each CHAR one under the regex — collapse makes
    // them equal), punctuation runs, leading/trailing noise, empties,
    // digit/letter boundaries, all-separator strings.
    val adversarial = Seq(
      "", "   ", "!!!", "a", "A.b,C  d!", "  leading and trailing  ",
      "héllo wörld — naïve café", "日本語テキスト mixed ascii 123",
      "tabs\tand\nnewlines\r\nandvt", "0a1b2c3", "---a---", "𝔘𝔫𝔦𝔠𝔬𝔡𝔢",
      "a  b   c", "ALL CAPS 42!").toDF("text")
    val sample = Tables(spark, dir).documents.select($"text").limit(300)
      .unionByName(adversarial)
    val regexForm = trim(regexp_replace(
      regexp_replace(lower($"text"), "[^a-z0-9\\s]", " "), "\\s+", " "))
    val diff = sample.select(
        graft.functions.TextNormalizeFunctions
          .dedupNormalize(spark, lower($"text")).as("kernel"),
        regexForm.as("regex"))
      .filter($"kernel" =!= $"regex")
    assert(diff.isEmpty, s"kernel/regex divergence: ${diff.take(3).toSeq}")
  }

  test("token_stats kernel is count-equal to the three regex forms (fixture + adversarial strings)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val adversarial = Seq(
      "", "   ", "!!!", "a", "A.b,C  d!", "  leading and trailing  ",
      "héllo wörld — naïve café", "日本語テキスト mixed ascii 123",
      "tabs\tand\nnewlines\r\nandvt", "0a1b2c3", "---a---", "𝔘𝔫𝔦𝔠𝔬𝔡𝔢",
      "a  b   c", "ALL CAPS 42!", "abc123def", "1a1", "x—y").toDF("text")
    val sample = Tables(spark, dir).documents.select($"text").limit(300)
      .unionByName(adversarial)
    val diff = sample
      .select($"text",
        graft.functions.TokenStatsFunctions.tokenStats(spark, $"text").as("ts"),
        regexp_count($"text", lit("""\S+""")).cast("long").as("r_ws"),
        regexp_count($"text", lit("""[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"""))
          .cast("long").as("r_bpe"),
        regexp_count($"text", lit("""[^A-Za-z0-9\s]""")).cast("long").as("r_punct"))
      .filter($"ts.n_ws_tokens" =!= $"r_ws"
        || $"ts.n_bpe_tokens" =!= $"r_bpe"
        || $"ts.n_punct" =!= $"r_punct")
    assert(diff.isEmpty, s"kernel/regex count divergence: ${diff.take(3).toSeq}")
  }

  test("t4 in-task fingerprint kernel equals the windowed min-of-md5 construction") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // The r12 rewrite moved t4's 5-gram min-md5 from a posexplode +
    // per-doc window + join to a compiled per-partition closure; this
    // pins result equality against the original windowed form on the
    // fixture PLUS the boundary docs (under 5 words -> whole-text md5
    // fallback; exactly 5; leading/trailing/multi whitespace; unicode).
    val adversarial = Seq(
      900001L -> "", 900002L -> "   ", 900003L -> "one two three four",
      900004L -> "one two three four five", 900005L -> "  a  b\tc\nd e f  ",
      900006L -> "héllo wörld — naïve café tokens six", 900007L -> "solo",
      900008L -> (null: String)) // null text -> null fingerprint (r12 ADVICE)
      .toDF("doc_id", "text")
    val sample = Tables(spark, dir).documents.select($"doc_id", $"text")
      .unionByName(adversarial)
    val wordsCol = filter(split($"text", "\\s+"), w => w =!= lit(""))
    val wn = Window.partitionBy($"doc_id").orderBy($"pos")
    val fp5 = sample
      .select($"doc_id", posexplode(wordsCol).as(Seq("pos", "w")))
      .select($"doc_id", $"w",
        lead($"w", 1).over(wn).as("w1"), lead($"w", 2).over(wn).as("w2"),
        lead($"w", 3).over(wn).as("w3"), lead($"w", 4).over(wn).as("w4"))
      .filter($"w4".isNotNull)
      .select($"doc_id",
        md5(concat_ws(" ", $"w", $"w1", $"w2", $"w3", $"w4")).as("h"))
      .groupBy($"doc_id").agg(min($"h").as("fp5"))
    val windowed = sample
      .join(fp5, Seq("doc_id"), "left_outer")
      .select($"doc_id", coalesce($"fp5", md5($"text")).as("fingerprint"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // Kernel replay of the shipped query body over the same sample
    // (the catalog query reads the fixture alone, so the adversarial
    // rows are pushed through the same mapPartitions closure here).
    val kernel = graft.operators.TextAnalysis.t4KernelForTest(sample)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kernel.keySet == windowed.keySet)
    val diff = kernel.collect { case (k, v) if windowed(k) != v => (k, v, windowed(k)) }
    assert(diff.isEmpty, s"fingerprint divergence: ${diff.take(3)}")
    // And the shipped catalog query itself agrees on the fixture rows.
    val shipped = graft.operators.TextAnalysis.queries("t4_fingerprint")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    shipped.foreach { case (k, v) => assert(windowed(k) == v, s"doc $k") }
  }

  test("sorted_intersect_count equals size(array_intersect) on sorted arrays") {
    import org.apache.spark.sql.functions._
    import graft.functions.ArrayFunctions.sortedIntersectCount
    val arr = Dedup.docShingleHashes(spark, dir)
    val pairs = arr.select(col("doc_id").as("i"), col("hs").as("hi"))
      .crossJoin(arr.select(col("doc_id").as("j"), col("hs").as("hj")))
      .filter(col("i") < col("j")).limit(5000)
    val diff = pairs.select(
        sortedIntersectCount(spark, col("hi"), col("hj")).as("merge"),
        size(array_intersect(col("hi"), col("hj"))).cast("long").as("hashset"))
      .filter(col("merge") =!= col("hashset")).count()
    assert(diff == 0)
  }

  test("prefix-filtered jaccardPairs equals the unfiltered co-occurrence form") {
    import org.apache.spark.sql.functions._
    // Completeness of the prefix filter (Bayardo et al.): the filtered
    // pipeline must find every pair the exhaustive co-occurrence join
    // finds at the same threshold, for a LOW tau where prefixes are long
    // and a HIGH tau where they are short.
    val e = Dedup.shingleRows(spark, dir)
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
    val sizes = Dedup.docShingleHashes(spark, dir)
      .select(col("doc_id"), size(col("hs")).cast("long").as("n"))
    for (tau <- Seq(0.3, 0.5, 0.8)) {
      val brute = e.select(col("doc_id").as("i"), col("h"))
        .join(e.select(col("doc_id").as("j"), col("h")), Seq("h"))
        .filter(col("i") < col("j"))
        .groupBy("i", "j").agg(count(lit(1)).as("c"))
        .join(sizes.select(col("doc_id").as("i"), col("n").as("na")), Seq("i"))
        .join(sizes.select(col("doc_id").as("j"), col("n").as("nb")), Seq("j"))
        .select(col("i"), col("j"),
          (col("c").cast("double") / (col("na") + col("nb") - col("c"))).as("jacc"))
        .filter(col("jacc") >= tau)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val filtered = Dedup.jaccardPairs(spark, dir, tau)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(filtered == brute, s"tau=$tau")
    }
    spark.catalog.clearCache()
  }

  test("union-find CC equals HashMin CC (crafted graph + real pair graph)") {
    import spark.implicits._
    // Chain (diameter > 1 forces HashMin to iterate), triangle with a
    // redundant edge, isolated pair, self-loop-free.
    val crafted = Seq(
      (5L, 6L), (6L, 7L), (7L, 8L),       // chain 5-6-7-8 → min 5
      (1L, 2L), (2L, 3L), (1L, 3L),       // triangle → min 1
      (10L, 11L))                          // pair → min 10
      .toDF("i", "j")
    val uf = Dedup.ccUnionFind(spark, crafted).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hm = Dedup.ccHashMin(spark, crafted).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(uf == hm)
    assert(uf == Map(5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 5L,
      1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    // And on the real sf0.001 near-dup pair graph.
    val pairs = Dedup.jaccardPairs(spark, dir, 0.5).select("i", "j")
    val ufR = Dedup.ccUnionFind(spark, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hmR = Dedup.ccHashMin(spark, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ufR == hmR)
    assert(ufR.nonEmpty)
    spark.catalog.clearCache()
  }

  test("simhash kernel fingerprints equal the declarative spec form") {
    val docs = Tables(spark, dir).documents
    val spec = Dedup.simhashFingerprints(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = Dedup.simhashFingerprintsKernel(spark, docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == spec)
    assert(spec.nonEmpty)
  }

  test("d5b md5-simhash kernel fingerprints equal the declarative spec form") {
    val docs = Tables(spark, dir).documents
    val spec = Dedup.md5SimhashFingerprints(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = Dedup.md5SimhashFingerprintsKernel(spark, docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == spec)
    assert(spec.nonEmpty)
  }

  test("s10 PC1: unit norm, eigen residual tiny, beats every axis variance") {
    val d = 64
    val cov = Similarity.queries("s9_embedding_covariance")(spark, dir).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    def c(i: Int, j: Int): Double = cov((math.min(i, j), math.max(i, j)))
    val out = Similarity.queries("s10_pca_power")(spark, dir).collect()
    assert(out.length == d)
    val v = out.sortBy(_.getInt(0)).map(_.getDouble(1))
    val lambda = out.head.getDouble(2)
    val share = out.head.getDouble(3)
    assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-6, "unit norm")
    // Eigen residual: ||Cv - λv||∞ small relative to λ.
    val resid = (0 until d).map { i =>
      math.abs((0 until d).map(j => c(i, j) * v(j)).sum - lambda * v(i))
    }.max
    assert(resid <= 1e-4 * lambda, s"residual $resid vs lambda $lambda")
    // PC1 variance dominates every coordinate axis; share in (0, 1].
    val maxDiag = (0 until d).map(i => c(i, i)).max
    assert(lambda >= maxDiag - 1e-9, s"lambda $lambda < max axis var $maxDiag")
    assert(share > 0 && share <= 1.0 + 1e-9)
    // Sign convention: the largest-|loading| coordinate is positive.
    assert(v(v.indices.maxBy(i => math.abs(v(i)))) > 0)
  }

  test("d1 exact-dedup groups cover every document exactly once") {
    val total = Tables(spark, dir).documents.count()
    val d1 = Dedup.queries("d1_dedup_exact_groups")(spark, dir)
    assert(d1.agg(org.apache.spark.sql.functions.sum("n_copies"))
      .head().getLong(0) == total)
  }

  test("d5 SimHash: identical docs collide at hamming 0") {
    import spark.implicits._
    // Two identical texts, one unrelated: the pair (0,1) must surface
    // at hamming 0; the unrelated doc must not pair with either.
    val docs = Seq(
      (0L, "spark join filter window agg sort merge hash scan table"),
      (1L, "spark join filter window agg sort merge hash scan table"),
      (2L, "completely different words entirely unrelated content here now"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(spark, docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs.get((0L, 1L)).contains(0))
    assert(!pairs.contains((0L, 2L)) && !pairs.contains((1L, 2L)))
    // The kernel-fingerprint path (what d5 ships) agrees on the fixture.
    val fastPairs = Dedup.simhashPairsFrom(spark,
        Dedup.simhashFingerprintsKernel(spark, docs)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(fastPairs == pairs)
    // And on the real fixture, every emitted pair is within the band bound.
    Dedup.queries("d5_dedup_simhash")(spark, dir).collect()
      .foreach(r => assert(r.getInt(2) >= 0 && r.getInt(2) <= 3))
  }

  test("approx percentiles certify their own rank-error bound per group") {
    // The catalog row now carries the certification directly: per
    // group, the sketch value's true rank interval must cover the
    // target rank within ±N·ε (ε = 10× the sketch guarantee). The
    // booleans being TRUE on every group is exactly what the DuckDB
    // oracle hash-pins; here we assert it independently plus group
    // completeness vs the exact tier.
    val exactGroups = graft.operators.StarSchema.queries("olap_percentiles")(spark, dir)
      .collect().map(_.getString(0)).toSet
    val rows = graft.operators.Olap.queries("olap_approx_percentiles")(spark, dir)
      .collect()
    assert(rows.map(_.getString(0)).toSet == exactGroups)
    rows.foreach { r =>
      assert(r.getLong(1) > 0, s"${r.getString(0)}: empty group")
      assert(r.getBoolean(2), s"${r.getString(0)}: p50 outside rank bound")
      assert(r.getBoolean(3), s"${r.getString(0)}: p90 outside rank bound")
    }
  }

  test("t7 stratified sample respects per-language proportions") {
    import org.apache.spark.sql.functions._
    val totals = Tables(spark, dir).documents
      .groupBy("lang").agg(count(lit(1)).as("n_total"))
    val sampled = graft.operators.TextAnalysis.t7Sampled(spark, dir)
    val joined = sampled.join(totals, "lang").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val frac = r.getAs[Long]("n_sampled").toDouble / r.getAs[Long]("n_total")
      assert(frac > 0.05 && frac <= 1.0, s"${r.getAs[String]("lang")}: $frac")
    }
    // The catalog row's binomial certification holds on every stratum —
    // the fact the DuckDB oracle hash-pins.
    val cert = graft.operators.TextAnalysis.queries("t7_stratified_sample")(spark, dir)
      .collect()
    assert(cert.nonEmpty)
    cert.foreach(r => assert(r.getBoolean(2),
      s"${r.getString(0)}: sample count outside the 5-sigma binomial bound"))
  }

  test("s2 blocked kernel is bit-identical to the declarative spec form") {
    val spec = Similarity.s2Spec(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val fast = Similarity.queries("s2_embedding_near_dup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(fast.toSeq == spec.toSeq) // same pairs, same rounded sims, same order
    assert(spec.nonEmpty)
  }

  test("s3 LSH ANN returns verified-correct similarities, subset of s1 ranking") {
    val exact = Similarity.queries("s1_ann_bruteforce_topk")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val approx = Similarity.queries("s3_ann_lsh_bucketed")(spark, dir).collect()
    assert(approx.nonEmpty, "SRP params must yield candidates on this corpus")
    // Every (query, neighbor, sim) the ANN emits must carry the same
    // similarity the exact path computes (when that neighbor is in the
    // exact top-10) — the ANN never invents scores.
    approx.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      exact.get(key).foreach(s => assert(math.abs(s - r.getDouble(3)) < 1e-9))
    }
  }

  test("s13 filtered ANN: predicate exact, recall 1 within it, post-filtering would lose most of it") {
    val got = Similarity.queries("s13_filtered_ann")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getDouble(4)))
    assert(got.nonEmpty)
    import org.apache.spark.sql.functions._
    val labels = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // (a) The predicate is exact: every neighbor shares its query's label.
    got.foreach { case (q, _, nb, lbl, _) =>
      assert(lbl == labels(q) && labels(nb) == labels(q), s"query $q neighbor $nb")
    }
    // (b) Recall 1 within the predicate: per query, the result is the
    // label-restricted slice of a FULL exact ranking (driver recompute
    // via the unfiltered s1-style scores is overkill — instead check
    // ranks are 1..k dense and sims non-increasing, and that the
    // neighbor set equals the top-k of the label slice computed from
    // s2-style exact sims is covered by the DuckDB oracle gate).
    got.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq, s"query $q ranks")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._5 >= b._5, s"query $q sim order")
        case _ => ()
      }
    }
    // (c) The operator's reason to exist: post-filtering a GLOBAL
    // top-10 would MISS most of these results (the filtered winners
    // rank far below global rank 10 when the predicate is selective).
    val globalTop = Similarity.queries("s1_ann_bruteforce_topk")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val missed = got.count { case (q, _, nb, _, _) => !globalTop((q, nb)) }
    assert(missed > got.length / 2,
      s"expected a real recall gap, post-filter would find all but $missed")
  }

  test("s6 persistent-index ANN serves the EXACT s3 result from the bucketed table") {
    // Same SRP family, same candidate semantics (union of bucket
    // matches over 8 tables, dedup, exact re-rank): the served path
    // must be row-identical to the in-query path — proving the
    // driver-side payload hashing (srpBucketLocal) matches the indexed
    // srpBucket bit-for-bit, and the index lost nothing in the write.
    val inQuery = Similarity.queries("s3_ann_lsh_bucketed")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val served = Similarity.queries("s6_ann_persistent_index")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(served == inQuery)
    assert(served.nonEmpty)
  }

  test("d10 served from the persisted index equals d4's pairs restricted to batch x history") {
    // d4 computes all (i < j) near-dup pairs in-query; d10 must return
    // exactly its mixed-parity subset — same signatures, same bands,
    // same verify kernel, only the INDEX half persisted — with
    // bit-identical jaccard values (proving the table round-trip lost
    // nothing and yesterday's index matches today's signatures).
    val full = Dedup.queries("d4_dedup_minhash_lsh")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = full.collect {
      case (i, j, jac) if i % 2 != j % 2 =>
        val (batch, hist) = if (i % 2 == 1) (i, j) else (j, i)
        (batch, hist, jac)
    }.toSet
    val served = Dedup.queries("d10_incremental_neardup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(served == expected)
    assert(served.nonEmpty) // the fixture plants cross-parity near-dups
  }

  test("pipe2 funnel equals a driver-side recompute from the standalone stages") {
    val r = Dedup.queries("pipe2_incremental_ingest")(spark, dir).head()
    val funnel = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(row => (row.getLong(0), row.getString(1)))
    val history = docs.filter(_._1 % 2 == 0).map(_._2).toSet
    val batch = docs.filter(_._1 % 2 == 1).sortBy(_._1)
    // Exact stage: first occurrence within batch AND text not in history.
    val seen = scala.collection.mutable.Set.empty[String]
    val exactSurv = batch.filter { case (_, t) =>
      !history.contains(t) && seen.add(t)
    }.map(_._1).toSet
    // Near stage: remove d10's batch-side hits.
    val nearIds = Dedup.queries("d10_incremental_neardup")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    val nearSurv = exactSurv -- nearIds
    // Quality stage: t5's score, recomputed with BigDecimal HALF_UP.
    val stop = Set("the", "a", "of", "and", "is", "to", "in")
    def q(t: String): Double = {
      val w = t.split("\\s+").filter(_.nonEmpty)
      val raw = if (w.isEmpty) 0.0 else w.count(stop).toDouble / w.length
      new java.math.BigDecimal(java.lang.Double.toString(raw))
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    }
    val ingested = batch.filter { case (id, t) => nearSurv(id) && q(t) >= 0.04 }
    assert(funnel == ((batch.length.toLong, exactSurv.size.toLong,
      nearSurv.size.toLong, ingested.length.toLong)))
    // Every stage is a real gate somewhere across the SFs; locally at
    // least the near-dup and quality stages must bite.
    assert(funnel._3 < funnel._2 && funnel._4 < funnel._3)
  }

  test("s8 Lloyd iteration partitions the corpus and improves the k-means objective") {
    import org.apache.spark.sql.functions._
    val res = Similarity.queries("s8_kmeans_iteration")(spark, dir).collect()
    val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val dim = corpus.head._2.length
    // Shape: k cells × d dims, every dim of a cell carrying the same count.
    assert(res.length == 8 * dim)
    val counts = res.map(r => (r.getLong(0), r.getLong(3))).distinct
    assert(counts.length == 8) // one count per cell
    assert(counts.map(_._2).sum == corpus.length) // assignment is a partition

    // Lloyd's guarantee (for the spherical/cosine variant): one
    // assign+recompute pass never worsens the mean best-cosine
    // objective. Evaluate both centroid sets locally (fixture-sized).
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dt = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dt += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dt / math.sqrt(na * nb)
    }
    val init = corpus.filter(_._1 < 8).sortBy(_._1).map(_._2)
    val learned = res.groupBy(_.getLong(0)).toSeq.sortBy(_._1).map { case (_, rows) =>
      rows.sortBy(_.getLong(1)).map(_.getDouble(2)).toArray
    }.toArray
    def objective(cents: Array[Array[Double]]): Double =
      corpus.map { case (_, e) => cents.map(c => cos(e, c)).max }.sum / corpus.length
    assert(objective(learned) >= objective(init) - 1e-9)
  }

  test("d11 substring spans equal a driver-side suffix-style recompute; spans maximal") {
    val K = 8
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    // Ground truth the paper's way, feasible at fixture scale: a
    // position is covered iff its K-window occurs in another doc.
    val byKg = scala.collection.mutable.Map.empty[String, scala.collection.mutable.Set[Long]]
    for ((id, w) <- docs; i <- 0 to w.length - K)
      byKg.getOrElseUpdate(w.slice(i, i + K).mkString(" "),
        scala.collection.mutable.Set.empty) += id
    val expected = (for {
      (id, w) <- docs.toSeq
      positions = (0 to w.length - K).filter { i =>
        byKg(w.slice(i, i + K).mkString(" ")).size >= 2
      }
      if positions.nonEmpty
      span <- positions.foldLeft(List.empty[(Long, Long)]) {
        case ((s, e) :: t, p) if p <= e + 1 => (s, math.max(e, p + K - 1L)) :: t
        case (acc, p) => (p.toLong, p + K - 1L) :: acc
      }.reverse
    } yield (id, span._1, span._2, span._2 - span._1 + 1)).toSet
    val got = Dedup.queries("d11_substring_spans")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
    assert(got.nonEmpty) // the fixture genuinely contains copied spans
    // Maximality: spans of one doc never overlap and never merge — a
    // gap of at least K-1 uncovered... strictly: next start > end + 1.
    for ((id, spans) <- got.groupBy(_._1)) {
      val sorted = spans.toSeq.sortBy(_._2)
      for (Seq(a, b) <- sorted.sliding(2) if sorted.length > 1)
        assert(b._2 > a._3 + 1, s"doc $id: spans $a and $b should have merged")
    }
  }

  test("d12 cut is exactly d11's spans excised: token accounting and surviving text agree") {
    val spans = Dedup.queries("d11_substring_spans")(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1)).toMap
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val cut = Dedup.queries("d12_substring_cut")(spark, dir).collect()
    assert(cut.length == docs.size) // every doc surfaces, touched or not
    var touched = 0
    for (r <- cut) {
      val (id, nTok, nCut, clean) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
      val w = docs(id).split(" ", -1)
      assert(nTok == w.length, s"doc $id token count")
      val ss = spans.getOrElse(id, Array.empty)
      assert(nCut == ss.map { case (s, e) => e - s + 1 }.sum, s"doc $id cut count")
      val keep = w.indices.filterNot(i => ss.exists { case (s, e) => i >= s && i <= e })
      assert(clean == keep.map(w).mkString(" "), s"doc $id surviving text")
      if (nCut > 0) touched += 1
    }
    assert(touched > 0) // the fixture genuinely loses spans
  }

  test("j10 deletion-neighborhood blocking has recall 1 on crafted ins/del/sub cases") {
    import spark.implicits._
    // The fixture's fixed-width names only exercise substitution; this
    // drives the other SymSpell completeness legs (insertion, deletion)
    // plus the precision leg: 'ab'/'ba' share deletion variants {a,b}
    // but sit at distance 2 — a blocked candidate the exact verify
    // must kill.
    val names = Seq(
      (1L, "graft"), (2L, "grafts"), // insertion at the end
      (3L, "grat"),                  // deletion inside (graft minus f)
      (4L, "graff"),                 // substitution (t -> f)
      (5L, "craft"),                 // substitution at position 1
      (6L, "ab"), (7L, "ba"),        // distance 2 but share deletion variants
      (8L, "zzz")                    // far from everything
    ).toDF("id", "name")
    val got = graft.operators.Joins.fuzzyPairs(names).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // Driver-side brute force is the ground truth.
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rows = Seq((1L, "graft"), (2L, "grafts"), (3L, "grat"), (4L, "graff"),
      (5L, "craft"), (6L, "ab"), (7L, "ba"), (8L, "zzz"))
    val expected = (for {
      (i, a) <- rows; (j, b) <- rows if i < j && lev(a, b) <= 1
    } yield (i, j, lev(a, b).toLong)).toSet
    assert(got == expected)
    assert(expected.exists(_._3 == 1) && expected.size >= 4) // ins+del+sub all present
    assert(!got.exists(p => p._1 == 6L && p._2 == 7L)) // ab/ba: blocked candidate, verified out
  }
}
