package graft

import graft.streaming.StreamingAnnIngest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The living vector index served over the wire: POST /ann/query (the
  * façade's one engine-extension route) must answer exactly what the
  * direct `StreamingAnnIngest.topK` call answers for the same payload
  * — including STREAMED vectors, proving the wire path reads the
  * living state, not just the offline history — with the 400 contract
  * for malformed payloads and the extension absent unless the façade
  * was started with a statePath. */
class RestAnnSpec extends AnyFunSuite with RestHttp
    with org.scalatest.BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  // A living index with real stream content: one batch of odd fixture
  // vectors plus a crafted exact-direction twin of odd vec 3 (id far
  // above the corpus) — the twin can only be found via the STREAM.
  private lazy val statePath: String = {
    import spark.implicits._
    val sp = Scratch.tempDir("rest_ann") + "/state"
    val b0 = Tables(spark, dir).embeddings
      .filter($"vec_id" % 2 === 1 && $"vec_id" < 200).localCheckpoint(true)
    StreamingAnnIngest.processBatch(dir, sp)(b0, 0L)
    val seed = b0.filter($"vec_id" === 3)
      .select($"embedding").as[Seq[Float]].head()
    val b1 = spark.createDataFrame(Seq((9300001L, seed.map(_ * 2.0f))))
      .toDF("vec_id", "embedding").localCheckpoint(true)
    StreamingAnnIngest.processBatch(dir, sp)(b1, 1L)
    sp
  }

  private lazy val started =
    RestServe.startWithStore(spark, dir, 0, annStatePath = Some(statePath))
  private lazy val server = started._1
  override lazy val base = s"http://127.0.0.1:${server.getAddress.getPort}"

  override def afterAll(): Unit = {
    server.stop(0)
    server.getExecutor match {
      case es: java.util.concurrent.ExecutorService => es.shutdown()
      case _ => ()
    }
  }

  private def vecJson(xs: Seq[Float]): String = xs.mkString("[", ",", "]")

  test("POST /ann/query answers byte-equal to the direct serve call, row-equal to topK, and sees streamed vectors") {
    import spark.implicits._
    val qv = Tables(spark, dir).embeddings
      .filter($"vec_id" === 3).select($"embedding").as[Seq[Float]].head()
    val (code, body) = post("/ann/query", s"""{"embedding":${vecJson(qv)}}""")
    assert(code == 200, body)
    // The wire rides serve() — the CACHED view — with the -1L sentinel
    // (a corpus id would hide its own vector via self-exclusion, the
    // r9 ADVICE finding, pinned below with history vec 0).
    val direct = StreamingAnnIngest.serve(spark, dir, statePath, qv.toArray)
      .orderBy($"rank")
      .select($"rank", $"neighbor_id", $"sim_r")
      .toJSON.collect().mkString("[", ",", "]")
    assert(body == direct, "wire response must be byte-equal to the engine call")
    // And serve() itself must be row-identical to the uncached batch
    // form — the cache changes the plan, never the answer.
    val cached = StreamingAnnIngest.serve(spark, dir, statePath, qv.toArray)
      .orderBy($"rank").collect().toSeq
    val uncached = StreamingAnnIngest.topK(spark, dir, statePath,
        Seq((-1L, qv)).toDF("query_id", "embedding"))
      .orderBy($"rank").collect().toSeq
    assert(cached == uncached, "cached serving view must equal the uncached path")
    // The payload IS vec 3's own vector: both vec 3 (streamed, batch 0)
    // and its crafted twin (streamed, batch 1) score exactly 1.0 — a
    // history-only index could return neither.
    val ids = spark.read.json(Seq(body).toDS()).select($"neighbor_id")
      .as[Long].collect().toSet
    assert(ids.contains(3L) && ids.contains(9300001L),
      s"the wire path must read the LIVING index: $ids")
  }

  test("k clamps and bounds the render") {
    import spark.implicits._
    val qv = Tables(spark, dir).embeddings
      .filter($"vec_id" === 3).select($"embedding").as[Seq[Float]].head()
    val (code, body) = post("/ann/query", s"""{"embedding":${vecJson(qv)},"k":2}""")
    assert(code == 200)
    assert(spark.read.json(Seq(body).toDS()).count() == 2)
  }

  test("history vector 0 is servable: the wire query_id is a non-colliding sentinel") {
    import spark.implicits._
    // Query WITH history vec 0's own embedding: neighbor 0 scores
    // cosine 1.0 and must head the response. Before the sentinel fix
    // the wire payload rode query_id = 0 and topK's self-exclusion
    // silently dropped vector 0 from every response whose true top-k
    // contained it (r9 ADVICE, medium).
    val v0 = Tables(spark, dir).embeddings
      .filter($"vec_id" === 0).select($"embedding").as[Seq[Float]].head()
    val (code, body) = post("/ann/query", s"""{"embedding":${vecJson(v0)},"k":3}""")
    assert(code == 200, body)
    val top = spark.read.json(Seq(body).toDS())
      .orderBy($"rank").select($"neighbor_id").as[Long].head()
    assert(top == 0L, s"history vector 0 must be retrievable over the wire: $body")
  }

  test("k coercion: whole floating and numeric-string k land; non-integral k is the 400 shape") {
    import spark.implicits._
    val qv = Tables(spark, dir).embeddings
      .filter($"vec_id" === 3).select($"embedding").as[Seq[Float]].head()
    val e = vecJson(qv)
    val (c1, b1) = post("/ann/query", s"""{"embedding":$e,"k":2.0}""")
    assert(c1 == 200 && spark.read.json(Seq(b1).toDS()).count() == 2,
      s"whole floating k must coerce losslessly: $c1 $b1")
    val (c2, b2) = post("/ann/query", s"""{"embedding":$e,"k":"2"}""")
    assert(c2 == 200 && spark.read.json(Seq(b2).toDS()).count() == 2,
      s"numeric-string k must coerce: $c2 $b2")
    assert(post("/ann/query", s"""{"embedding":$e,"k":2.5}""")._1 == 400,
      "fractional k must be rejected, not silently defaulted")
    assert(post("/ann/query", s"""{"embedding":$e,"k":"x"}""")._1 == 400)
    assert(post("/ann/query", s"""{"embedding":$e,"k":true}""")._1 == 400)
  }

  test("serving-view cache staleness pin: a vector ingested AFTER the cache warmed is visible to the very next query") {
    import spark.implicits._
    // Warm the cache through the wire (the suite's earlier tests also
    // did — this makes the ordering explicit and self-contained).
    val qv = Tables(spark, dir).embeddings
      .filter($"vec_id" === 3).select($"embedding").as[Seq[Float]].head()
    assert(post("/ann/query", s"""{"embedding":${vecJson(qv)},"k":1}""")._1 == 200)
    // A new batch lands: an exact-direction twin of vec 3 with a fresh
    // id. Its delta's _SUCCESS is the cache's invalidation signal — no
    // restart, no manual flush.
    val b2 = spark.createDataFrame(Seq((9300002L, qv.map(_ * 3.0f))))
      .toDF("vec_id", "embedding").localCheckpoint(true)
    StreamingAnnIngest.processBatch(dir, statePath)(b2, 2L)
    val (code, body) = post("/ann/query", s"""{"embedding":${vecJson(qv)},"k":3}""")
    assert(code == 200, body)
    val ids = spark.read.json(Seq(body).toDS()).select($"neighbor_id")
      .as[Long].collect().toSet
    assert(ids.contains(9300002L),
      s"the next query after an ingest must see the new vector, not a stale cache: $ids")
  }

  test("armed façade guards /ann/query like every data route; open façade stays open") {
    val secret = "ann-spec-secret"
    val (armed, _) = RestServe.startWithStore(spark, dir, 0,
      authSecret = Some(secret), annStatePath = Some(statePath))
    try {
      import spark.implicits._
      val qv = Tables(spark, dir).embeddings
        .filter($"vec_id" === 3).select($"embedding").as[Seq[Float]].head()
      val payload = s"""{"embedding":${vecJson(qv)},"k":2}"""
      val armedBase = s"http://127.0.0.1:${armed.getAddress.getPort}"
      val bare = new RestHttp { override val base = armedBase }
      assert(bare.post("/ann/query", payload)._1 == 401,
        "corpus-derived data must not be served tokenless on an armed façade")
      val (okCode, okBody) =
        bare.auth(GraftAuth.token(secret, "ann@graft.io")).post("/ann/query", payload)
      assert(okCode == 200)
      // Same engine answer as the open façade (auth gates, never alters).
      assert(okBody == post("/ann/query", payload)._2)
    } finally armed.stop(0)
  }

  test("400 contract: missing, non-array, non-numeric, wrong-dimension embeddings; 405 on GET; 404 without statePath") {
    assert(post("/ann/query", """{}""")._1 == 400)
    assert(post("/ann/query", """{"embedding":"xx"}""")._1 == 400)
    assert(post("/ann/query", """{"embedding":[1,"a",2]}""")._1 == 400)
    assert(post("/ann/query", """{"embedding":[0.5,0.5]}""")._1 == 400)
    assert(post("/ann/query", """not json""")._1 == 400)
    assert(get("/ann/query")._1 == 405)
    // A façade started WITHOUT a statePath does not register the route.
    val (plain, _) = RestServe.startWithStore(spark, dir, 0)
    try {
      val r = java.net.http.HttpClient.newHttpClient().send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(
            s"http://127.0.0.1:${plain.getAddress.getPort}/ann/query"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString("{}")).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(r.statusCode() == 404, "extension route must be absent by default")
    } finally plain.stop(0)
  }
}
