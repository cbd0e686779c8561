package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** M8 — graph analytics over the transaction graph (extension family;
  * the reference has no graph surface, but a training-data platform
  * ranks entities — sources, domains, suppliers — by link structure
  * all the time). Complements d7's connected components with the other
  * canonical iterative-graph kernel: PageRank (Brin/Page 1998).
  *
  * Graph: the bipartite customer↔supplier co-purchase graph —
  * lineitem⋈orders yields (customer, supplier, n_purchases); each pair
  * contributes BOTH directed edges, so every graph node has out-edges
  * and the dangling-mass term vanishes from the update rule.
  *
  * Determinism discipline (the t18/t19 lineage, taken to its limit):
  * the ENTIRE computation is integer arithmetic in 1e-9-unit BIGINTs —
  * transition weights `(n·1e9) div Σn`, per-edge contributions
  * `(rank·weight) div 1e9`, damping `(85·inc) div 100` — so no
  * float exists anywhere for engines or partition order to move; the
  * one IEEE division (units → presentation double) happens per output
  * row at the very end. The DuckDB oracle unrolls the three iterations
  * as a CTE chain over the same integer ops and must match bit-for-bit.
  *
  * Scale shape: per iteration, ONE shuffle join of ranks to edges on
  * the source key and ONE map-combined aggregate on the destination
  * key — the classic distributed PageRank step (Pregel's shape without
  * the framework). Edges never re-materialize; ranks are |V|-sized.
  * At 1000 executors both sides hash-partition on the node key; a
  * celebrity node costs a hot reduce key, mitigable by the j8 salting
  * pattern. Fixed 3 iterations keeps the oracle finite; convergence
  * tuning is a knob, not a semantics change. */
object Graph extends QueryModule {

  private val Iterations = 3

  /** Weighted edge list + node set, persisted ONCE per (session, dir):
    * the loop references them in Iterations+1 plan subtrees of ONE
    * query, and repeated catalog passes must reuse the same cache
    * entries rather than accumulate duplicates (the ADVICE-r5 memo
    * pattern; plan builds stay job-free — persist is lazy, the first
    * execution materializes it).
    *
    * Both directed edges come from ONE pairs aggregate via an in-task
    * `explode(array(...))` — the first (union-of-two-selects) form
    * executed the pairs subtree twice, because Spark does not
    * common-subexpression-eliminate across union legs: the plan showed
    * two full lineitem⋈orders scans + two 587k-row aggregate
    * exchanges where one suffices (measured: edge build halves). The
    * out-degree sums group 1.17M exploded rows map-side down to |V|
    * partials, and the |V|-row result broadcasts back — the corpus
    * aggregate shuffles once, total. */
  private val edgeMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, String), (DataFrame, DataFrame)]()
  private def graphFrames(spark: SparkSession, dir: String): (DataFrame, DataFrame) =
    edgeMemo.computeIfAbsent((spark.sparkContext.applicationId, dir), _ => {
      import spark.implicits._
      val t = Tables(spark, dir)
      val pairs = t.lineitem.join(t.orders, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_custkey", $"l_suppkey").agg(count(lit(1)).as("n"))
      val edges = pairs.select(explode(array(
          struct(concat(lit("C"), $"o_custkey").as("src"),
            concat(lit("S"), $"l_suppkey").as("dst")),
          struct(concat(lit("S"), $"l_suppkey").as("src"),
            concat(lit("C"), $"o_custkey").as("dst")))).as("e"), $"n")
        .select($"e.src", $"e.dst", $"n")
      val out = edges.groupBy($"src").agg(sum($"n").as("tot"))
      // No broadcast hint: |V| fits locally (AQE broadcasts), but at
      // cluster scale the node table can exceed broadcast size and the
      // src-partitioned SMJ is the right fallback — Catalyst decides.
      val w = edges.join(out, Seq("src"))
        .select($"src", $"dst", expr("(n * 1000000000L) div tot").as("w9"))
        .persist()
      // `out` is the distinct node set (every node has out-edges by the
      // bipartite both-directions construction); carrying |V| on each
      // row keeps the init and the damping term join-free.
      val nodes = out.select($"src".as("node"))
        .crossJoin(broadcast(out.agg(count(lit(1)).as("nn"))))
        .persist()
      (w, nodes)
    })

  private def g1(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (w, nodes) = graphFrames(spark, dir)
    var ranks = nodes.select($"node", expr("1000000000L div nn").as("r9"), $"nn")
    for (_ <- 1 to Iterations) {
      ranks = w.join(ranks, $"src" === $"node")
        .select($"dst", expr("(r9 * w9) div 1000000000L").as("c9"), $"nn")
        .groupBy($"dst", $"nn").agg(sum($"c9").as("inc"))
        .select($"dst".as("node"),
          expr("150000000L div nn + (85L * inc) div 100L").as("r9"), $"nn")
    }
    val topN = ranks
      .orderBy($"r9".desc, $"node").limit(100)
      .select($"node", $"r9".as("rank_units"),
        ($"r9".cast("double") / 1e9).as("rank"))
    presentSorted(topN, col("rank_units").desc, col("node"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g1_pagerank" -> (g1 _))

  /** The oracle unrolls the 3 iterations as a CTE chain over the same
    * 1e-9-unit integer arithmetic (// is DuckDB's integer division —
    * identical to Spark's `div` on the all-positive operands here). */
  val oracles: Map[String, String] = Map(
    "g1_pagerank" -> {
      def step(prev: String, cur: String) =
        s"""$cur AS (
           |  SELECT w.dst AS node,
           |         (SELECT 150000000 // count(*) FROM nodes)
           |           + (85 * CAST(sum((p.r9 * w.w9) // 1000000000) AS BIGINT)) // 100 AS r9
           |  FROM w JOIN $prev p ON w.src = p.node
           |  GROUP BY w.dst)""".stripMargin
      s"""WITH pairs AS (
         |  SELECT o.o_custkey AS ck, l.l_suppkey AS sk, count(*) AS n
         |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  GROUP BY 1, 2),
         |edges AS (
         |  SELECT 'C' || ck AS src, 'S' || sk AS dst, n FROM pairs
         |  UNION ALL
         |  SELECT 'S' || sk AS src, 'C' || ck AS dst, n FROM pairs),
         |w AS (
         |  SELECT src, dst,
         |         (n * 1000000000) // sum(n) OVER (PARTITION BY src) AS w9
         |  FROM edges),
         |nodes AS (SELECT DISTINCT src AS node FROM edges),
         |r0 AS (SELECT node, (SELECT 1000000000 // count(*) FROM nodes) AS r9
         |       FROM nodes),
         |${step("r0", "r1")},
         |${step("r1", "r2")},
         |${step("r2", "r3")}
         |SELECT node, r9 AS rank_units, CAST(r9 AS DOUBLE) / 1e9 AS rank
         |FROM r3 ORDER BY rank_units DESC, node LIMIT 100""".stripMargin
    })
}
