package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic fixture scale-up for the EMPIRICAL scaling probe
  * (SURVEY §12): replicate a source fixture R× with disjoint key
  * spaces, so catalog queries can be timed at sf0.1 / ~sf0.3 / ~sf1 and
  * per-query scaling exponents measured rather than argued.
  *
  * Replication discipline — the point is to scale VOLUME without
  * manufacturing cross-replica structure that changes a query's
  * asymptotic class:
  *   - Keys shift by `r·(max+1)` per key domain; foreign keys shift by
  *     the SAME rule, so replica r's orders reference replica r's
  *     customers — join fanout and group cardinality per key are
  *     EXACTLY the source's, while key-space cardinality grows R×.
  *   - Entity-NAME columns (`s_name`, `c_name`, replicas r>0) get a
  *     3-char repeated-digit suffix: a common suffix leaves every
  *     within-replica Levenshtein distance unchanged, while distinct
  *     replica tags differ in all 3 positions, so no cross-replica
  *     name pair lands within edit distance 1 — fuzzy-join (j10)
  *     output volume grows linearly, matching the key-space rule.
  *     (Measured before the fix: unperturbed names made every entity
  *     appear R× verbatim and j10's true answer R²-sized — 12.3× wall
  *     at 10×; the operator was output-bound, the INPUT was wrong.)
  *   - `documents.text` (replicas r>0): every WORD is suffixed with a
  *     replica tag — an injective per-replica vocabulary rename. Shingle
  *     sets rename injectively with it, so within a replica every
  *     pairwise shingle intersection/union (hence every Jaccard value,
  *     hence the whole near/exact-dup structure) is EXACTLY the
  *     source's, while any cross-replica shingle overlap is exactly
  *     zero — near-dup volume grows linearly with R, never
  *     quadratically. (A first design appended a marker token after
  *     every 4th word; ScaleUpSpec caught 41k cross-replica colliding
  *     shingles — the 3-word gaps between markers are themselves
  *     complete unmarked 3-gram windows.)
  *   - `embeddings` (replicas r>0): a seeded per-replica ORTHOGONAL
  *     transform (dimension permutation + sign flips). Within a
  *     replica all pairwise angles and norms are untouched (ANN/
  *     centroid structure replicates exactly); across replicas vectors
  *     decorrelate, so near-neighbor volume scales linearly.
  *   - `region`/`nation` are fixed dimensions — copied as-is (a bigger
  *     corpus does not grow the world's nation list).
  *
  * Usage: runMain graft.ScaleUp <srcSfDir> <outDir> <replicas> [tables]
  *
  * The optional 4th arg (comma list) restricts REPLICATION to a table
  * subset — the remaining tables are copied verbatim at 1× so every
  * catalog query still finds its inputs. This is the disk-budget lever
  * for the deep probes: a 100× replica of documents/embeddings/events
  * is ~340 MB where a full-fixture 100× would be ~1.6 GB dominated by
  * lineitem no deep-probe query touches at that scale. Full-fixture
  * mode scales to 999 replicas: customer/supplier name tags are
  * zero-padded constant-width suffixes (injective to 999), and the
  * documents `_r<N>` vocabulary tags and the seeded orthogonal
  * embedding transforms are injective at any replica count. */
object ScaleUp {

  private def shifted(df: DataFrame, rep: Int, keys: (String, Long)*): DataFrame =
    keys.foldLeft(df) { case (d, (k, domain)) =>
      d.withColumn(k, col(k) + lit(rep * domain))
    }

  private val AllTables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args match {
      case Array(src, out, repStr) => run(spark, src, out, repStr.toInt)
      case Array(src, out, repStr, tablesCsv) =>
        run(spark, src, out, repStr.toInt, tablesCsv.split(",").toSet)
    }
    spark.stop()
  }

  def run(spark: SparkSession, src: String, out: String, reps: Int,
          replicate: Set[String] = AllTables.toSet): Unit = {
    // events.ts physical encoding varies by fixture generation (int64
    // NANOS or TIMESTAMP_NTZ — see Tables.events). When the source
    // footer carries NANOS, the conf surfaces it as plain INT64 and the
    // replica copies the column verbatim; scoped by the same footer
    // probe as the loader so the legacy conf never leaks onto sessions
    // whose fixtures don't need it.
    if (Tables.eventsCarriesNanos(spark, src))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import spark.implicits._

    def tbl(n: String) = spark.read.parquet(s"$src/$n.parquet")
    def domain(df: DataFrame, k: String): Long =
      df.agg(max(col(k))).head().getLong(0) + 1L
    def write(df: DataFrame, n: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$n.parquet")

    // Zero-padded replica tags are injective to 999 replicas; beyond
    // that the padding would alias and full-fixture mode must refuse.
    require(reps <= 999
        || !(replicate("customer") || replicate("supplier")),
      s"name tags support at most 999 replicas, got $reps with customer/supplier")

    // Fixed dimensions and unreplicated tables: verbatim 1× copies so
    // the out dir is a complete fixture for every catalog loader.
    (Seq("region", "nation") ++ AllTables.drop(2).filterNot(replicate))
      .foreach(n => write(tbl(n), n))

    def rep(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until reps).map(r => f(df, r)).reduce(_ unionByName _)
    // Constant-width zero-padded tag, the 3-digit field REPEATED three
    // times ("#001001001"): injective to 999 replicas (the old
    // single-digit `#rrr` capped full-fixture mode at 10), and any two
    // distinct replicas' tags differ in ≥3 positions at equal length —
    // so no cross-replica name pair can sit within Levenshtein
    // distance 1 (equal length makes lev-1 a single substitution =
    // Hamming 1, which the tripled field rules out; the fuzzy-join
    // no-cross-replica-match invariant, spec-pinned).
    def tagName(df: DataFrame, r: Int, c: String): DataFrame =
      if (r == 0) df
      else df.withColumn(c, concat(col(c), lit("#" + f"$r%03d" * 3)))

    if (replicate("customer") || replicate("orders") || replicate("lineitem")
        || replicate("supplier") || replicate("part")) {
      val (cust, supp, part, ord, li) =
        (tbl("customer"), tbl("supplier"), tbl("part"), tbl("orders"),
          tbl("lineitem"))
      val (dCust, dSupp, dPart, dOrd) =
        (domain(cust, "c_custkey"), domain(supp, "s_suppkey"),
          domain(part, "p_partkey"), domain(ord, "o_orderkey"))
      if (replicate("customer"))
        write(rep(cust)((d, r) => tagName(shifted(d, r, "c_custkey" -> dCust), r, "c_name")), "customer")
      if (replicate("supplier"))
        write(rep(supp)((d, r) => tagName(shifted(d, r, "s_suppkey" -> dSupp), r, "s_name")), "supplier")
      if (replicate("part"))
        write(rep(part)(shifted(_, _, "p_partkey" -> dPart)), "part")
      if (replicate("orders"))
        write(rep(ord)(shifted(_, _, "o_orderkey" -> dOrd, "o_custkey" -> dCust)), "orders")
      if (replicate("lineitem"))
        write(rep(li)(shifted(_, _, "l_orderkey" -> dOrd, "l_partkey" -> dPart,
          "l_suppkey" -> dSupp)), "lineitem")
    }

    if (replicate("events")) {
      val ev = tbl("events")
      val (dEv, dUser) = (domain(ev, "event_id"), domain(ev, "user_id"))
      write(rep(ev)(shifted(_, _, "event_id" -> dEv, "user_id" -> dUser)), "events")
    }

    if (replicate("documents")) {
      val doc = tbl("documents")
      val dDoc = domain(doc, "doc_id")
      write(rep(doc) { (d, r) =>
        val s = shifted(d, r, "doc_id" -> dDoc)
        if (r == 0) s
        else s
          .withColumn("text", array_join(
            transform(split($"text", " "), w => concat(w, lit(s"_r$r"))),
            " "))
          .withColumn("n_chars", length($"text"))
      }, "documents")
    }

    if (replicate("embeddings")) {
      val emb = tbl("embeddings")
      val dVec = domain(emb, "vec_id")
      val dim = emb.select(size($"embedding")).head().getInt(0)
      write(rep(emb) { (d, r) =>
        val s = shifted(d, r, "vec_id" -> dVec)
        if (r == 0) s
        else {
          val rng = new scala.util.Random(42 + r)
          val perm = rng.shuffle((0 until dim).toList)
          val sign = Array.fill(dim)(if (rng.nextBoolean()) 1.0f else -1.0f)
          s.withColumn("embedding", array((0 until dim).map(i =>
            $"embedding" (perm(i)) * lit(sign(i))): _*))
        }
      }, "embeddings")
    }

    println(s"scaled $src x$reps -> $out (${replicate.toSeq.sorted.mkString(",")})")
  }
}
