package graft.operators

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.HttpServer

import graft.SparkSpec

class EnrichSpec extends SparkSpec {
  import spark.implicits._

  test("withPartitionClient enriches every row and builds one client per partition") {
    val df = (1 to 10).map(i => (i, s"v$i")).toDF("id", "payload").repartition(2)
    val out = Enrich.withPartitionClient[String](df, "payload", "out",
      mkClient = () => "C",
      call = (c, s) => s"$c:$s")
    val rows = out.select("out").as[String].collect()
    assert(rows.length == 10 && rows.forall(_.startsWith("C:v")))
  }

  test("withPartitionClient falls back to onError after retries are exhausted") {
    val df = Seq((1, "boom"), (2, "fine")).toDF("id", "payload").repartition(1)
    val out = Enrich.withPartitionClient[Unit](df, "payload", "out",
      mkClient = () => (),
      call = (_, s) => if (s == "boom") throw new RuntimeException("nope") else s,
      retries = 1, retrySleepMs = 1, onError = "FALLBACK")
    val m = out.as[(Int, String, String)].collect().map(r => r._1 -> r._3).toMap
    assert(m(1) == "FALLBACK" && m(2) == "fine")
  }

  test("minIntervalMs throttles calls within a partition") {
    val df = (1 to 5).map(i => (i, s"v$i")).toDF("id", "payload").repartition(1)
    val t0 = System.nanoTime()
    Enrich.withPartitionClient[Unit](df, "payload", "out",
      mkClient = () => (),
      call = (_, s) => s,
      minIntervalMs = 40L).count()
    val elapsedMs = (System.nanoTime() - t0) / 1000000L
    // 5 calls at >= 40ms spacing: the 4 gaps alone take >= 160ms
    assert(elapsedMs >= 160L, s"elapsed ${elapsedMs}ms — throttle not applied")
  }

  test("httpTransport performs real HTTP GETs against a local server") {
    val hits = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/echo", { exchange =>
      hits.incrementAndGet()
      val q = exchange.getRequestURI.getQuery          // "v=<payload>"
      val body = s"got:${q.stripPrefix("v=")}".getBytes("UTF-8")
      exchange.sendResponseHeaders(200, body.length)
      exchange.getResponseBody.write(body)
      exchange.close()
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val df = Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "payload")
      val out = Enrich.httpTransport(df, "payload", "resp",
        urlFor = v => s"http://127.0.0.1:$port/echo?v=$v")
      val got = out.select("resp").as[String].collect().sorted.toSeq
      assert(got == Seq("got:a", "got:b", "got:c"))
      assert(hits.get() == 3)
    } finally server.stop(0)
  }

  test("httpTransport uses the onError=null fallback on persistent HTTP errors") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/fail", { exchange =>
      exchange.sendResponseHeaders(500, -1); exchange.close()
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val df = Seq((1, "x")).toDF("id", "payload")
      val out = Enrich.httpTransport(df, "payload", "resp",
        urlFor = v => s"http://127.0.0.1:$port/fail?v=$v", retries = 1)
      assert(out.select("resp").collect().head.isNullAt(0))
    } finally server.stop(0)
  }
}
