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

  test("missing table returns 404, malformed request 400") {
    val (code, body) = post("/api/q", "SELECT * FROM graft.datasource.api.no_such_table_xyz")
    assert(code == 404, s"expected 404 got $code: $body")
    val (code2, _) = post("/api/q", "")
    assert(code2 == 400)
  }

  test("CORS headers on success, error, and preflight responses") {
    val ok = new URL(s"http://localhost:$port/api/q").openConnection().asInstanceOf[HttpURLConnection]
    ok.setRequestMethod("POST"); ok.setDoOutput(true)
    ok.getOutputStream.write(s"SELECT 1 AS one".getBytes(StandardCharsets.UTF_8))
    assert(ok.getResponseCode == 200)
    assert(ok.getHeaderField("Access-Control-Allow-Origin") == "*")
    assert(ok.getHeaderField("Access-Control-Allow-Methods").contains("OPTIONS"))

    val err = new URL(s"http://localhost:$port/api/q").openConnection().asInstanceOf[HttpURLConnection]
    err.setRequestMethod("POST"); err.setDoOutput(true)
    err.getOutputStream.write("SELECT FROM WHERE".getBytes(StandardCharsets.UTF_8))
    assert(err.getResponseCode == 400)
    assert(err.getHeaderField("Access-Control-Allow-Origin") == "*")

    val pre = new URL(s"http://localhost:$port/api/q").openConnection().asInstanceOf[HttpURLConnection]
    pre.setRequestMethod("OPTIONS")
    assert(pre.getResponseCode == 204)
    assert(pre.getHeaderField("Access-Control-Allow-Headers").contains("authorization"))
  }

  test("a multi-MB result streams without driver materialization: later partitions compute only as the client drains") {
    ApiSuite.latePartitionRan = false
    // 2 partitions; the payload of partition 0 (~3.5 MB of JSON) dwarfs any
    // socket buffer, so a server that streams partition-at-a-time BLOCKS
    // mid-partition-0 until the client reads — partition 1 cannot have
    // computed while the client holds back. A collect-then-write (driver
    // materialization) implementation runs BOTH partitions before the
    // first byte and fails the flag assert.
    val df = spark.range(0L, 500000L, 1L, 2).as(
        org.apache.spark.sql.Encoders.scalaLong)
      .mapPartitions { it =>
        val buf = it.toArray
        if (buf.nonEmpty && buf.head >= 250000L) ApiSuite.latePartitionRan = true
        buf.iterator
      }(org.apache.spark.sql.Encoders.scalaLong).toDF("id")
    df.createOrReplaceTempView("__api_big")
    val c = new URL(s"http://localhost:$port/api/q").openConnection()
      .asInstanceOf[HttpURLConnection]
    c.setRequestMethod("POST")
    c.setDoOutput(true)
    c.getOutputStream.write("SELECT id FROM __api_big".getBytes(StandardCharsets.UTF_8))
    c.getOutputStream.close()
    assert(c.getResponseCode == 200)
    val in = c.getInputStream
    val head = new Array[Byte](256)
    var got = 0
    while (got < head.length) {
      val n = in.read(head, got, head.length - got)
      assert(n > 0, "stream ended inside the first 256 bytes"); got += n
    }
    assert(new String(head, StandardCharsets.UTF_8).startsWith("[{\"id\":"))
    assert(!ApiSuite.latePartitionRan,
      "partition 1 computed while the client had read only 256 bytes — " +
        "the response was materialized, not streamed")
    // drain the rest: the payload completes and partition 1 did run
    val rest = new String(in.readAllBytes(), StandardCharsets.UTF_8)
    assert(ApiSuite.latePartitionRan)
    val all = new String(head, StandardCharsets.UTF_8) + rest
    assert(all.endsWith("]"))
    assert(all.sliding(7).count(_ == "{\"id\":4") > 0)
    assert("\\{\"id\":".r.findAllIn(all).size == 500000, "row count mismatch")
  }

  test("concurrent streaming requests all complete with full payloads") {
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val sql = s"SELECT l_orderkey, l_quantity FROM parquet.`${sf()}/lineitem.parquet` ORDER BY l_orderkey, l_linenumber"
    val expected = post("/api/q", sql)._2
    assert(expected.length > 10000, "need a non-trivial streamed payload")
    // 8 concurrent clients against the 4-thread server pool: responses must
    // not interleave or truncate (each exchange owns its output stream)
    val results = Await.result(
      Future.sequence((1 to 8).map(_ => Future(post("/api/q", sql)))), 120.seconds)
    results.foreach { case (code, body) =>
      assert(code == 200 && body == expected, "streamed body mismatch under load")
    }
  }
}

/** Shared flag the streaming test's partition closure flips — local mode
  * runs tasks in this JVM, so the test observes compute order directly.
  */
object ApiSuite {
  @volatile var latePartitionRan: Boolean = false
}
