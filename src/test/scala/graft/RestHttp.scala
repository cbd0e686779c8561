package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** Shared HTTP driver for the façade specs: verbs with JSON bodies
  * against a live RestServe instance. */
trait RestHttp {
  def base: String
  private val client = HttpClient.newHttpClient()

  def get(path: String): (Int, String) = send("GET", path, None)

  def send(method: String, path: String, body: Option[String]): (Int, String) = {
    val b = HttpRequest.newBuilder(URI.create(base + path))
    val req = body match {
      case Some(s) => b.method(method, HttpRequest.BodyPublishers.ofString(s))
      case None    => b.method(method, HttpRequest.BodyPublishers.noBody())
    }
    val resp = client.send(req.build(), HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  def post(path: String, json: String): (Int, String)   = send("POST", path, Some(json))
  def patch(path: String, json: String): (Int, String)  = send("PATCH", path, Some(json))
  def put(path: String, json: String): (Int, String)    = send("PUT", path, Some(json))
  def delete(path: String): (Int, String)                = send("DELETE", path, None)
}
