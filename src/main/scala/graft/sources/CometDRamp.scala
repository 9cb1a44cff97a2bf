package graft.sources

import java.net.{CookieManager, URI}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Minimal CometD (Bayeux) long-polling client — the protocol the
  * reference's Salesforce Streaming API ramp speaks
  * (`contrib/salesforce/ramps.py:13-69`): handshake → subscribe →
  * repeated `/meta/connect` long-polls, all POSTs of JSON messages to
  * one endpoint, with a server-assigned `clientId` threaded through.
  *
  * Built on `java.net.http.HttpClient` (JDK 11+) with a cookie jar —
  * the reference pins a persistent `requests.Session` because the
  * Salesforce endpoint is sticky via cookies; same here.
  *
  * Re-handshake: per Bayeux, an unsuccessful `/meta/connect` whose
  * advice says `"reconnect": "handshake"` invalidates the clientId —
  * the client transparently re-handshakes, re-subscribes to every
  * channel, and resumes polling (the reference would crash and rely on
  * process restart; a Spark ramp must outlive transient resets).
  */
final class CometDClient(endpoint: String, headers: Map[String, String] = Map.empty) {
  private implicit val fmts: Formats = DefaultFormats

  private val http = HttpClient.newBuilder()
    .cookieHandler(new CookieManager())
    .build()

  private var nextId = 0
  @volatile private var clientIdOpt: Option[String] = None
  private var subscriptions: List[String] = Nil

  def clientId: Option[String] = clientIdOpt

  private def post(body: JValue): List[JValue] = {
    val b = HttpRequest.newBuilder(URI.create(endpoint))
      .header("Content-Type", "application/json")
    headers.foreach { case (k, v) => b.header(k, v) }
    val req = b.POST(HttpRequest.BodyPublishers.ofString(
      JsonMethods.compact(JsonMethods.render(body)), StandardCharsets.UTF_8)).build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() / 100 == 2, s"cometd endpoint returned ${resp.statusCode()}")
    JsonMethods.parse(resp.body()) match {
      case JArray(msgs) => msgs
      case one => List(one)
    }
  }

  private def msgId(): String = { nextId += 1; nextId.toString }

  /** `/meta/handshake` — the reference's exact message shape
    * (version/minimumVersion/supportedConnectionTypes/advice). */
  def handshake(): String = {
    val msgs = post(JObject(
      "version" -> JString("1.0"),
      "minimumVersion" -> JString("0.9"),
      "channel" -> JString("/meta/handshake"),
      "supportedConnectionTypes" -> JArray(List(JString("long-polling"))),
      "advice" -> JObject("timeout" -> JInt(2500), "interval" -> JInt(0)),
      "id" -> JString(msgId())))
    val first = msgs.headOption.getOrElse(JNothing)
    require((first \ "successful").extractOpt[Boolean].getOrElse(false),
      s"handshake rejected: ${JsonMethods.compact(JsonMethods.render(first))}")
    val id = (first \ "clientId").extract[String]
    clientIdOpt = Some(id)
    id
  }

  /** `/meta/subscribe` to `/topic/<topic>`; remembered for re-handshake. */
  def subscribe(topic: String): Unit = {
    val channel = s"/topic/$topic"
    val msgs = post(JObject(
      "channel" -> JString("/meta/subscribe"),
      "subscription" -> JString(channel),
      "clientId" -> JString(clientIdOpt.getOrElse(handshake()))))
    require(msgs.exists(m => (m \ "successful").extractOpt[Boolean].contains(true)),
      "subscribe rejected")
    if (!subscriptions.contains(channel)) subscriptions ::= channel
  }

  /** One `/meta/connect` long-poll. Returns every event payload (the
    * `data` member of non-meta messages); transparently re-handshakes
    * and re-subscribes when advised, then retries the poll once. */
  def connect(): List[JValue] = {
    val msgs = post(JObject(
      "channel" -> JString("/meta/connect"),
      "connectionType" -> JString("long-polling"),
      "clientId" -> JString(clientIdOpt.getOrElse(handshake()))))
    val meta = msgs.find(m => (m \ "channel").extractOpt[String].contains("/meta/connect"))
    val mustRehandshake = meta.exists { m =>
      !(m \ "successful").extractOpt[Boolean].getOrElse(true) &&
        (m \ "advice" \ "reconnect").extractOpt[String].contains("handshake")
    }
    if (mustRehandshake) {
      handshake()
      subscriptions.foreach(ch => subscribe(ch.stripPrefix("/topic/")))
      connect()
    } else
      msgs.collect { case m if (m \ "data") != JNothing => m \ "data" }
  }
}

/** Salesforce Streaming API ramp: CometD events → [[QueueRamp]] queue →
  * the DSv2 micro-batch source (commit-on-sink-success). Mirrors the
  * reference ramp's event filter (`contrib/salesforce/ramps.py:64-69`):
  * only updates carrying `data.sobject` yield messages, keyed by the
  * sobject `Id`. */
final class SalesforceStreamingRamp(queue: String, client: CometDClient, topic: String) {
  private implicit val fmts: Formats = DefaultFormats

  def start(): SalesforceStreamingRamp = {
    client.handshake()
    client.subscribe(topic)
    this
  }

  /** One long-poll; enqueues and returns the new entries. */
  def pollOnce(nowMicros: Long = System.currentTimeMillis() * 1000L): Seq[QueueRamp.Entry] = {
    val entries = client.connect().flatMap { data =>
      (data \ "sobject") match {
        case JNothing => None
        case sobject =>
          val id = (sobject \ "Id").extractOpt[String].getOrElse("")
          Some(QueueRamp.Entry(id,
            JsonMethods.compact(JsonMethods.render(sobject)), id, nowMicros))
      }
    }
    QueueRamp.enqueue(queue, entries)
    entries
  }
}
