package graft.sources

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import graft.sinks.SalesforceRestClient
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

/** Offline protocol tests for the HTTP connector clients — CometD
  * long-poll (Salesforce streaming), Link-header cursor pagination
  * (Recurly scans), and REST upsert-by-external-id (Salesforce sink) —
  * against in-process JDK httpserver stubs, the same way the reference
  * tests its Kinesis election against a mock control table. */
class HttpConnectorsSpec extends AnyFunSuite {
  private implicit val fmts: Formats = DefaultFormats

  private def withServer(routes: HttpExchange => Unit)(body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => routes(ex))
    server.setExecutor(null)
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private def respond(ex: HttpExchange, code: Int, body: String,
      headers: Map[String, String] = Map.empty): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.add(k, v) }
    val b = body.getBytes(StandardCharsets.UTF_8)
    if (body.isEmpty) ex.sendResponseHeaders(code, -1)
    else { ex.sendResponseHeaders(code, b.length.toLong); ex.getResponseBody.write(b) }
    ex.close()
  }

  private def readBody(ex: HttpExchange): JValue =
    JsonMethods.parse(new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))

  // ---------------- CometD (Salesforce streaming) ----------------

  test("cometd: handshake -> subscribe -> connect yields sobject events") {
    val handshakes = new AtomicInteger(0)
    val connects = new AtomicInteger(0)
    var subscribedChannel = ""
    var subscribeClientId = ""
    withServer { ex =>
      val msg = readBody(ex)
      (msg \ "channel").extract[String] match {
        case "/meta/handshake" =>
          handshakes.incrementAndGet()
          respond(ex, 200,
            """[{"channel":"/meta/handshake","successful":true,"clientId":"client-1"}]""")
        case "/meta/subscribe" =>
          subscribedChannel = (msg \ "subscription").extract[String]
          subscribeClientId = (msg \ "clientId").extract[String]
          respond(ex, 200, """[{"channel":"/meta/subscribe","successful":true}]""")
        case "/meta/connect" =>
          val payload = if (connects.incrementAndGet() == 1)
            """[{"channel":"/meta/connect","successful":true},
               |{"channel":"/topic/Orders","data":{"sobject":{"Id":"006A","Amount":42}}},
               |{"channel":"/topic/Orders","data":{"sobject":{"Id":"006B","Amount":7}}}]""".stripMargin
          else """[{"channel":"/meta/connect","successful":true}]"""
          respond(ex, 200, payload)
      }
    } { base =>
      val queue = s"sf-stream-${System.nanoTime()}"
      val ramp = new SalesforceStreamingRamp(queue, new CometDClient(s"$base/cometd/37.0"), "Orders")
      ramp.start()
      assert(handshakes.get() == 1)
      assert(subscribedChannel == "/topic/Orders")
      assert(subscribeClientId == "client-1")

      val first = ramp.pollOnce(nowMicros = 1000L)
      assert(first.map(_.id) == Seq("006A", "006B"))
      assert(first.head.content.contains("\"Amount\":42"))
      assert(ramp.pollOnce(nowMicros = 2000L).isEmpty) // quiet poll
      // entries landed on the shared queue for the DSv2 source
      assert(QueueRamp.slice(queue, 0, 2).map(_.id) == Seq("006A", "006B"))
    }
  }

  test("cometd: unsuccessful connect with reconnect=handshake re-handshakes and re-subscribes") {
    val handshakes = new AtomicInteger(0)
    val subscribes = new AtomicInteger(0)
    withServer { ex =>
      val msg = readBody(ex)
      (msg \ "channel").extract[String] match {
        case "/meta/handshake" =>
          val n = handshakes.incrementAndGet()
          respond(ex, 200,
            s"""[{"channel":"/meta/handshake","successful":true,"clientId":"client-$n"}]""")
        case "/meta/subscribe" =>
          subscribes.incrementAndGet()
          respond(ex, 200, """[{"channel":"/meta/subscribe","successful":true}]""")
        case "/meta/connect" =>
          val cid = (msg \ "clientId").extract[String]
          if (cid == "client-1") // first session killed server-side
            respond(ex, 200,
              """[{"channel":"/meta/connect","successful":false,
                 |"advice":{"reconnect":"handshake"}}]""".stripMargin)
          else
            respond(ex, 200,
              """[{"channel":"/meta/connect","successful":true},
                 |{"channel":"/topic/T","data":{"sobject":{"Id":"X1"}}}]""".stripMargin)
      }
    } { base =>
      val client = new CometDClient(s"$base/cometd/37.0")
      client.handshake()
      client.subscribe("T")
      val events = client.connect() // triggers the re-handshake path
      assert(handshakes.get() == 2)
      assert(subscribes.get() == 2) // re-subscribed after new clientId
      assert(client.clientId.contains("client-2"))
      assert(events.map(d => (d \ "sobject" \ "Id").extract[String]) == List("X1"))
    }
  }

  // ---------------- Recurly (paginated scan) ----------------

  test("recurly: scanAll follows rel=next cursors across pages, hourly ramp enqueues by uuid") {
    withServer { ex =>
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      assert(ex.getRequestHeaders.getFirst("Authorization").startsWith("Basic "))
      val base = s"http://127.0.0.1:${ex.getHttpContext.getServer.getAddress.getPort}"
      q match {
        case "" => respond(ex, 200,
          """[{"uuid":"inv-1","total_in_cents":100},{"uuid":"inv-2","total_in_cents":200}]""",
          Map("Link" -> s"""<$base/v2/invoices?cursor=page2>; rel="next""""))
        case "cursor=page2" => respond(ex, 200,
          """[{"uuid":"inv-3","total_in_cents":300}]""",
          Map("Link" -> s"""<$base/v2/invoices?cursor=page3>; rel="next", <$base/v2/invoices>; rel="start""""))
        case "cursor=page3" => respond(ex, 200, """[{"uuid":"inv-4","total_in_cents":400}]""")
      }
    } { base =>
      val client = new RecurlyClient(base, "test-key")
      val all = client.scanAll("/v2/invoices")
      assert(all.map(i => (i \ "uuid").extract[String]) == List("inv-1", "inv-2", "inv-3", "inv-4"))

      val queue = s"recurly-${System.nanoTime()}"
      val ramp = new RecurlyInvoiceRamp(queue, client)
      val entries = ramp.pollOnce(nowMicros = 5000L)
      assert(entries.map(_.id) == Seq("inv-1", "inv-2", "inv-3", "inv-4"))
      assert(QueueRamp.slice(queue, 0, 4).map(_.id).toSet == Set("inv-1", "inv-2", "inv-3", "inv-4"))
    }
  }

  test("recurly: Link parser handles absent / multi-relation headers") {
    val c = new RecurlyClient("http://x", "k")
    assert(c.nextLink("") == None)
    assert(c.nextLink("""<http://a/next>; rel="next"""") == Some("http://a/next"))
    assert(c.nextLink("""<http://a/start>; rel="start", <http://a/n2>; rel="next"""")
      == Some("http://a/n2"))
    assert(c.nextLink("""<http://a/start>; rel="start"""") == None)
  }

  // ---------------- Salesforce REST upsert sink ----------------

  test("salesforce upsert: PATCH by external id creates then updates; replay is idempotent") {
    val store = scala.collection.mutable.Map[String, String]()
    withServer { ex =>
      val path = ex.getRequestURI.getPath
      assert(ex.getRequestHeaders.getFirst("Authorization") == "Bearer tok-1")
      val parts = path.stripPrefix("/").split("/") // services data vXX sobjects Type Field Value
      (ex.getRequestMethod, parts.length) match {
        case ("PATCH", 7) =>
          val key = parts(6)
          val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          val created = !store.contains(key)
          store(key) = body
          respond(ex, if (created) 201 else 204, if (created) """{"id":"001"}""" else "")
        case ("POST", 5) =>
          val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          store(s"created-${store.size}") = body
          respond(ex, 201, """{"id":"001new"}""")
        case other => fail(s"unexpected request $other $path")
      }
    } { base =>
      val client = new SalesforceRestClient(base, "tok-1")
      assert(client.upsert("Account", "Ext__c", "A-1", """{"Name":"n1"}""") === true)  // created
      assert(client.upsert("Account", "Ext__c", "A-1", """{"Name":"n2"}""") === false) // updated
      assert(client.upsert("Account", "Ext__c", "A-1", """{"Name":"n2"}""") === false) // replay no-op
      assert(store("A-1") == """{"Name":"n2"}""")
      client.create("Account", """{"Name":"plain"}""")
      assert(store.size == 2)
    }
  }
}
