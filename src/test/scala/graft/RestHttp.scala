package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** Shared HTTP driver for the façade specs: verbs with JSON bodies
  * against a live RestServe instance. */
trait RestHttp {
  def base: String
  private val client = HttpClient.newHttpClient()

  def get(path: String): (Int, String) = send("GET", path, None)

  def send(method: String, path: String, body: Option[String],
           headers: Map[String, String] = Map.empty): (Int, String) = {
    val b = HttpRequest.newBuilder(URI.create(base + path))
    headers.foreach { case (k, v) => b.header(k, v) }
    val req = body match {
      case Some(s) => b.method(method, HttpRequest.BodyPublishers.ofString(s))
      case None    => b.method(method, HttpRequest.BodyPublishers.noBody())
    }
    val resp = client.send(req.build(), HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  /** Verbs under a Bearer token (the auth-armed façade). */
  def auth(tok: String): RestHttp.Authed = new RestHttp.Authed {
    private val hdr = Map("Authorization" -> s"Bearer $tok")
    def get(path: String): (Int, String) = send("GET", path, None, hdr)
    def post(path: String, json: String): (Int, String) = send("POST", path, Some(json), hdr)
    def patch(path: String, json: String): (Int, String) = send("PATCH", path, Some(json), hdr)
    def put(path: String, json: String): (Int, String) = send("PUT", path, Some(json), hdr)
    def delete(path: String): (Int, String) = send("DELETE", path, None, hdr)
  }

  def post(path: String, json: String): (Int, String)   = send("POST", path, Some(json))
  def patch(path: String, json: String): (Int, String)  = send("PATCH", path, Some(json))
  def put(path: String, json: String): (Int, String)    = send("PUT", path, Some(json))
  def delete(path: String): (Int, String)                = send("DELETE", path, None)
}

object RestHttp {
  trait Authed {
    def get(path: String): (Int, String)
    def post(path: String, json: String): (Int, String)
    def patch(path: String, json: String): (Int, String)
    def put(path: String, json: String): (Int, String)
    def delete(path: String): (Int, String)
  }
}
