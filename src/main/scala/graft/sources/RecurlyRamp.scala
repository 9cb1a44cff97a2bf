package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util.Base64

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Recurly REST scan client — the reference's hourly full-table scan
  * ramps (`contrib/recurly_integration/ramps.py:12-51`): enumerate every
  * invoice/account via the paginated collection endpoint, then sleep an
  * hour and do it again. Pagination follows the REST `Link` header
  * (`<next-url>; rel="next"`) cursor contract the Recurly collection
  * API uses; bodies are JSON here (the v2-era client wrapped XML — a
  * transport detail, not a semantic one). Auth is the API key as HTTP
  * Basic, per Recurly's API docs.
  *
  * The hourly loop is [[PollingRamp]] (`periodMillis = 3600_000`), or
  * `Trigger.AvailableNow` for run-to-completion incremental scans —
  * de-dup across scans rides on stable ids (invoice `uuid`), the same
  * at-least-once contract as the reference.
  */
final class RecurlyClient(baseUrl: String, apiKey: String) {
  private val http = HttpClient.newHttpClient()
  private val auth = "Basic " + Base64.getEncoder.encodeToString(
    (apiKey + ":").getBytes("UTF-8"))

  /** Full scan of a collection path, following `rel="next"` links. */
  def scanAll(path: String): List[JValue] = {
    var url = baseUrl + path
    val out = List.newBuilder[JValue]
    var more = true
    while (more) {
      val req = HttpRequest.newBuilder(URI.create(url))
        .header("Authorization", auth)
        .header("Accept", "application/json")
        .GET().build()
      val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
      require(resp.statusCode() == 200, s"$url returned ${resp.statusCode()}")
      JsonMethods.parse(resp.body()) match {
        case JArray(items) => out ++= items
        case one => out += one
      }
      nextLink(resp.headers().firstValue("Link").orElse("")) match {
        case Some(next) => url = next
        case None => more = false
      }
    }
    out.result()
  }

  /** Parse `<url>; rel="next"` out of a Link header (absent → None). */
  private[sources] def nextLink(header: String): Option[String] =
    header.split(",").iterator.map(_.trim).collectFirst {
      case part if part.contains("rel=\"next\"") =>
        part.substring(part.indexOf('<') + 1, part.indexOf('>'))
    }
}

/** Invoice scan ramp: every poll enumerates all invoices and enqueues
  * one message per invoice keyed by `uuid` — the reference's
  * `RecurlyInvoiceRamp` field set. */
final class RecurlyInvoiceRamp(queue: String, client: RecurlyClient) {
  private implicit val fmts: Formats = DefaultFormats

  def pollOnce(nowMicros: Long = System.currentTimeMillis() * 1000L): Seq[QueueRamp.Entry] = {
    val entries = client.scanAll("/v2/invoices").flatMap { inv =>
      (inv \ "uuid").extractOpt[String].map { uuid =>
        QueueRamp.Entry(uuid, JsonMethods.compact(JsonMethods.render(inv)), uuid, nowMicros)
      }
    }
    QueueRamp.enqueue(queue, entries)
    entries
  }

  /** The reference's hourly cadence, as a managed polling loop. */
  def hourly(): PollingRamp =
    new PollingRamp(queue, 3600L * 1000L)(_ => pollOnce()).start()
}
