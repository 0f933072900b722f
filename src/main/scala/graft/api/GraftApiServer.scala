package graft.api

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Graft
import graft.commands.ShowDqRecordsCommand

import java.io.OutputStream
import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._

/** REST query endpoints (reference: catalog/api/LightningEndPoints.scala,
  * LightningAPIServer.scala — Jetty+Jersey there; JDK HttpServer here, same
  * streaming contract):
  *
  *  - `POST /api/q`    body = SQL -> JSON array of rows, streamed via
  *                     `toLocalIterator` (one partition on the driver at a
  *                     time, never the whole result; :53-86)
  *  - `GET /api/qdq?name=..&table=..&validRecord=true|false&limit=n`
  *                     DQ records (:88-131)
  *  - `GET /api/edq?name=..&table=..&validRecord=..` export, no limit (:133-168)
  *
  * Row->JSON uses Spark's own JSON encoder (`Dataset.toJSON`), which covers
  * decimals, binary (base64), date/timestamp, arrays, maps, structs — the
  * encodings the reference hand-rolls at :187-254.
  */
class GraftApiServer(spark: SparkSession, port: Int = 8855) {

  private var server: HttpServer = _
  private var pool: java.util.concurrent.ExecutorService = _

  def start(): Int = {
    server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/api/q", new QueryHandler)
    server.createContext("/api/qdq", new DqRecordHandler(limited = true))
    server.createContext("/api/edq", new DqRecordHandler(limited = false))
    pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    server.setExecutor(pool)
    server.start()
    server.getAddress.getPort
  }

  /** Stops the listener AND the worker pool — the pool threads are
    * non-daemon, so leaving them running blocks JVM exit for any embedding
    * process that calls stop() and then returns from main.
    */
  def stop(): Unit = {
    if (server != null) server.stop(0)
    if (pool != null) pool.shutdown()
  }

  /** CORS headers on every response, matching the reference's filter
    * (catalog/api/CORSFilter.scala:28-37) so a browser GUI can front the API.
    */
  private def corsHeaders(ex: HttpExchange): Unit = {
    val h = ex.getResponseHeaders
    h.set("Access-Control-Allow-Origin", "*")
    h.set("Access-Control-Allow-Headers", "origin, content-type, accept, authorization")
    h.set("Access-Control-Allow-Credentials", "true")
    h.set("Access-Control-Allow-Methods", "GET, POST, PUT, DELETE, OPTIONS, HEAD")
    h.set("Access-Control-Max-Age", "1209600")
  }

  /** Browser preflight: headers only, no body. */
  private def handlePreflight(ex: HttpExchange): Boolean =
    if (ex.getRequestMethod == "OPTIONS") {
      corsHeaders(ex)
      ex.sendResponseHeaders(204, -1)
      ex.close()
      true
    } else false

  /** Missing object (table/DQ/namespace) is a 404; a malformed request stays
    * 400. Spark analysis errors carry error classes like TABLE_OR_VIEW_NOT_FOUND.
    */
  private def statusFor(e: Exception): Int = e match {
    case _: NoSuchElementException => 404
    case _ =>
      val m = String.valueOf(e.getMessage)
      if (m.contains("TABLE_OR_VIEW_NOT_FOUND") || m.contains("SCHEMA_NOT_FOUND") ||
          m.contains("not found")) 404
      else 400
  }

  private def streamJsonArray(ex: HttpExchange, df: DataFrame): Unit = {
    corsHeaders(ex)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(200, 0)
    val out: OutputStream = ex.getResponseBody
    try {
      out.write('[')
      val it = df.toJSON.toLocalIterator()
      var first = true
      while (it.hasNext) {
        if (!first) out.write(',')
        out.write(it.next().getBytes(StandardCharsets.UTF_8))
        first = false
      }
      out.write(']')
    } finally out.close()
  }

  private def sendError(ex: HttpExchange, code: Int, msg: String): Unit = {
    val body = s"""{"error": ${org.json4s.jackson.JsonMethods.compact(
      org.json4s.JString(msg))}}""".getBytes(StandardCharsets.UTF_8)
    corsHeaders(ex)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, body.length)
    val out = ex.getResponseBody
    try out.write(body) finally out.close()
  }

  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).map(_.split('&').toSeq
      .flatMap { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => Some(URLDecoder.decode(k, "UTF-8") -> URLDecoder.decode(v, "UTF-8"))
          case _ => None
        }
      }.toMap).getOrElse(Map.empty)

  private final class QueryHandler extends HttpHandler {
    override def handle(ex: HttpExchange): Unit = try {
      if (handlePreflight(ex)) return
      if (ex.getRequestMethod != "POST") { sendError(ex, 405, "POST a SQL string"); return }
      val sql = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8).trim
      if (sql.isEmpty) { sendError(ex, 400, "empty SQL body"); return }
      streamJsonArray(ex, Graft.sql(spark, sql))
    } catch { case e: Exception => sendError(ex, statusFor(e), String.valueOf(e.getMessage)) }
  }

  private final class DqRecordHandler(limited: Boolean) extends HttpHandler {
    override def handle(ex: HttpExchange): Unit = try {
      if (handlePreflight(ex)) return
      val p = queryParams(ex)
      val (name, table) = (p.get("name"), p.get("table"))
      if (name.isEmpty || table.isEmpty) { sendError(ex, 400, "name and table are required"); return }
      val valid = p.get("validRecord").forall(_.toBoolean)
      val limit = if (limited) p.get("limit").map(_.toInt).getOrElse(0) else 0
      val cmd = ShowDqRecordsCommand(name.get, table.get.split('.').toSeq, valid, limit)
      streamJsonArray(ex, cmd.recordsDf(spark))
    } catch { case e: Exception => sendError(ex, statusFor(e), String.valueOf(e.getMessage)) }
  }
}
