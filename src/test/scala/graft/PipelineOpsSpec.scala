package graft

import graft.operators.{Dedup, Events, Olap, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the round-2 pipeline additions (d7 clusters, t9 tf-idf,
  * s5 centroids, olap_histogram, w6 SCD2), on the sf0.001 fixtures. */
class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("d7 clusters: every near-dup pair is co-clustered, labels are component minima") {
    val clusters = Dedup.queries("d7_dup_clusters")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Dedup.queries("d3_dedup_ngram_jaccard")(spark, dir)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (i, j) =>
      assert(clusters(i) == clusters(j), s"pair ($i,$j) split across clusters")
    }
    // Each label is the minimum of its member set (HashMin fixpoint).
    clusters.groupBy(_._2).foreach { case (lbl, members) =>
      assert(members.keys.min == lbl, s"cluster $lbl not labeled by its min member")
    }
    // Every document appears exactly once.
    assert(clusters.size == Tables(spark, dir).documents.count())
  }

  test("d7 cluster_size: distinct cluster sizes sum to the corpus size") {
    val rows = Dedup.queries("d7_dup_clusters")(spark, dir)
      .select("cluster_id", "cluster_size").distinct().collect()
    val total = rows.map(_.getLong(1)).sum
    assert(total == Tables(spark, dir).documents.count())
  }

  test("t9 tf-idf: ranks are contiguous and scores non-increasing per doc") {
    val byDoc = TextAnalysis.queries("t9_tfidf_top_terms")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
      .groupBy(_._1)
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (doc, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq, s"doc $doc ranks")
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._3 >= b._3
        case _ => true
      }, s"doc $doc scores not non-increasing")
    }
  }

  test("s5 centroids: per-label vector counts are dim-uniform and sum to corpus size") {
    val rows = Similarity.queries("s5_embedding_centroids")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(3)))
    val perLabel = rows.groupBy(_._1).view.mapValues(_.map(_._3).distinct).toMap
    perLabel.foreach { case (lbl, ns) =>
      assert(ns.size == 1, s"label $lbl has non-uniform n_vectors across dims")
    }
    val total = perLabel.values.map(_.head).sum
    assert(total == Tables(spark, dir).embeddings.count())
  }

  test("olap_histogram: bucket counts partition the table, bounds inside buckets") {
    val rows = Olap.queries("olap_histogram")(spark, dir).collect()
    val total = rows.map(_.getLong(1)).sum
    assert(total == Tables(spark, dir).orders.count())
    rows.foreach { r =>
      val (b, lo, hi) = (r.getLong(0), r.getDouble(2), r.getDouble(3))
      assert(lo >= b * 25000.0 && hi < (b + 1) * 25000.0 && lo <= hi)
    }
  }

  test("m4 frame stats equal m3's frame list aggregated") {
    import org.apache.spark.sql.functions.{count => cnt, lit, sum => fsum}
    val fromM3 = graft.operators.Multimodal.queries("m3_frame_sample")(spark, dir)
      .groupBy("doc_id")
      .agg(cnt(lit(1)).as("n_sampled"), fsum("frame_len").as("bytes_sampled"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val m4 = graft.operators.Multimodal.queries("m4_frame_stats")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m4 == fromM3)
    assert(m4.nonEmpty)
  }

  test("pipe1 composes t5's filter and d6-style dedup: count bounds hold") {
    val total = Tables(spark, dir).documents.count()
    val survivors = TextAnalysis.queries("t5_quality_filter")(spark, dir).count()
    val rows = TextAnalysis.queries("pipe1_corpus_prep")(spark, dir).collect()
    val kept = rows.map(_.getLong(1)).sum
    assert(kept > 0 && kept <= survivors && survivors <= total)
    rows.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) > 0 && r.getLong(3) > 0)
    }
  }

  test("w6 SCD2: one open interval per user, versions chain without overlap") {
    val rows = Events.queries("w6_scd2_intervals")(spark, dir)
      .select("user_id", "valid_from", "valid_to").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1),
        Option(r.getTimestamp(2))))
    assert(rows.length == Tables(spark, dir).events.count())
    rows.groupBy(_._1).foreach { case (user, versions) =>
      assert(versions.count(_._3.isEmpty) == 1, s"user $user open intervals != 1")
      versions.foreach { case (_, from, to) =>
        to.foreach(t => assert(!t.before(from), s"user $user interval inverted"))
      }
    }
  }
}
