package graft.sinks

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.ForeachWriter

/** Salesforce REST sink — the reference's `SalesforceInsertIntersection`
  * (`contrib/salesforce/intersections.py:13-41`): per message, either
  * upsert by external-id field (create-or-update in one call) or plain
  * create. The REST contract is public Salesforce API: upsert is
  * `PATCH /services/data/v<ver>/sobjects/<type>/<extField>/<extId>`
  * (201 = created, 204 = updated — both success), create is
  * `POST /services/data/v<ver>/sobjects/<type>/`.
  *
  * Upsert-by-default is what makes the reference's at-least-once
  * delivery safe; the same property makes this sink idempotent under
  * Spark micro-batch replay — redelivering a message PATCHes the same
  * external id to the same state.
  */
final class SalesforceRestClient(instanceUrl: String, sessionToken: String,
    apiVersion: String = "37.0") {
  private val http = HttpClient.newHttpClient()

  private def request(method: String, path: String, body: Option[String]): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(instanceUrl + path))
      .header("Authorization", s"Bearer $sessionToken")
      .header("Content-Type", "application/json")
    val req = body match {
      case Some(j) => b.method(method,
        HttpRequest.BodyPublishers.ofString(j, StandardCharsets.UTF_8)).build()
      case None => b.method(method, HttpRequest.BodyPublishers.noBody()).build()
    }
    http.send(req, HttpResponse.BodyHandlers.ofString())
  }

  /** Create-or-update by external id. Returns true if a new record was
    * created (HTTP 201), false if an existing one was updated (204). */
  def upsert(objectApiName: String, extIdField: String, extIdValue: String,
      fieldsJson: String): Boolean = {
    val resp = request("PATCH",
      s"/services/data/v$apiVersion/sobjects/$objectApiName/$extIdField/$extIdValue",
      Some(fieldsJson))
    require(resp.statusCode() == 201 || resp.statusCode() == 204,
      s"upsert failed: HTTP ${resp.statusCode()} ${resp.body()}")
    resp.statusCode() == 201
  }

  /** Plain create (the reference's `upsert = False` path). */
  def create(objectApiName: String, fieldsJson: String): Unit = {
    val resp = request("POST",
      s"/services/data/v$apiVersion/sobjects/$objectApiName/", Some(fieldsJson))
    require(resp.statusCode() == 201,
      s"create failed: HTTP ${resp.statusCode()} ${resp.body()}")
  }
}

/** Streaming writer over [[SalesforceRestClient]]: rows are
  * (external-id value, JSON fields body). Only strings cross the
  * closure boundary; the HTTP client is built per partition in
  * `open()`. */
final class SalesforceUpsertWriter(instanceUrl: String, sessionToken: String,
    objectApiName: String, extIdField: String, upsert: Boolean = true)
  extends ForeachWriter[(String, String)] {

  @transient private var client: SalesforceRestClient = _

  override def open(partitionId: Long, epochId: Long): Boolean = {
    client = new SalesforceRestClient(instanceUrl, sessionToken)
    true
  }

  override def process(value: (String, String)): Unit =
    if (upsert) client.upsert(objectApiName, extIdField, value._1, value._2)
    else client.create(objectApiName, value._2)

  override def close(errorOrNull: Throwable): Unit = ()
}
