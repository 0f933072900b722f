package graft.api

import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets

import graft.SparkTestBase

class ApiSuite extends SparkTestBase {

  private var server: GraftApiServer = _
  private var port: Int = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = new GraftApiServer(spark, port = 0) // ephemeral port
    port = server.start()
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop()
    super.afterAll()
  }

  private def post(path: String, body: String): (Int, String) = {
    val c = new URL(s"http://localhost:$port$path").openConnection().asInstanceOf[HttpURLConnection]
    c.setRequestMethod("POST")
    c.setDoOutput(true)
    c.getOutputStream.write(body.getBytes(StandardCharsets.UTF_8))
    val code = c.getResponseCode
    val in = if (code < 400) c.getInputStream else c.getErrorStream
    (code, new String(in.readAllBytes(), StandardCharsets.UTF_8))
  }

  test("POST /api/q streams query results as a JSON array") {
    val (code, body) = post("/api/q",
      s"SELECT n_nationkey, n_name FROM parquet.`${sf()}/nation.parquet` ORDER BY n_nationkey LIMIT 2")
    assert(code == 200)
    assert(body.startsWith("[{") && body.endsWith("}]"))
    assert(body.contains("\"n_nationkey\":0") && body.contains("\"n_name\""))
  }

  test("POST /api/q accepts graft DDL statements") {
    val (code, body) = post("/api/q",
      s"REGISTER OR REPLACE PARQUET DATASOURCE apitpch OPTIONS (path '${sf()}') NAMESPACE graft.datasource.api")
    assert(code == 200 && body.contains("apitpch"))
    val (code2, body2) = post("/api/q",
      "SELECT COUNT(*) AS n FROM graft.datasource.api.apitpch.region")
    assert(code2 == 200 && body2.contains("\"n\":5"))
  }

  test("bad SQL returns a JSON error, not a 500") {
    val (code, body) = post("/api/q", "SELECT FROM WHERE")
    assert(code == 400 && body.contains("error"))
  }
}
