package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths}
import java.time.LocalDate

/**
 * Driver-side control client for the Unity Raw Data Export API —
 * re-expressing the reference's request/poll/download legs
 * (ua2sql.py:95–161). Spark has no REST source and should not: export-job
 * control is a handful of tiny driver-side HTTP calls; only the staged
 * bytes are cluster work (and gzip NDJSON is read natively by the file
 * source, replacing the manual gunzip at ua2sql.py:157–158).
 *
 * Request/response handling is injected (`send`) so behavior is unit-
 * testable offline; the payload semantics are pinned to the reference:
 * `continueFrom` REPLACES `startDate` — exactly one of the two is sent
 * (ua2sql.py:101–104).
 */
final class UnityExportClient(
    projectId: String,
    apiKey: String,
    base: String = "https://analytics.cloud.unity3d.com",
    send: HttpRequest => HttpResponse[String] = UnityExportClient.defaultSend,
    sendBytes: HttpRequest => HttpResponse[Array[Byte]] =
      UnityExportClient.defaultSendBytes) {

  import UnityExportClient._

  def exportUri: URI =
    URI.create(s"$base/api/v2/projects/$projectId/rawdataexports")

  /** POST a new export job; returns its id (ua2sql.py:95–113). */
  def requestExport(endDate: LocalDate, dataset: String,
                    startDate: Option[LocalDate] = None,
                    continueFrom: Option[String] = None): Option[String] = {
    val req = HttpRequest.newBuilder(exportUri)
      .header("Authorization", authHeader(projectId, apiKey))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(
        requestBody(endDate, dataset, startDate, continueFrom)))
      .build()
    val resp = send(req)
    if (resp.statusCode() / 100 != 2) None
    else jsonField(resp.body(), "id")
  }

  /** Poll one job; ready iff status == completed; any failure → not ready
    * (ua2sql.py:117–124). */
  def isReady(jobId: String): Boolean =
    try {
      val req = HttpRequest.newBuilder(URI.create(s"$exportUri/$jobId"))
        .header("Authorization", authHeader(projectId, apiKey)).GET().build()
      val resp = send(req)
      resp.statusCode() == 200 &&
        jsonField(resp.body(), "status").contains("completed")
    } catch { case _: Exception => false }

  /** Download every result file of a completed job into `dest`
    * (ua2sql.py:128–161). Files stay gzipped — Spark's JSON source
    * decompresses on read, in parallel across files. */
  def download(jobId: String, dest: Path): Seq[Path] = {
    val req = HttpRequest.newBuilder(URI.create(s"$exportUri/$jobId"))
      .header("Authorization", authHeader(projectId, apiKey)).GET().build()
    val resp = send(req)
    if (resp.statusCode() != 200) return Nil
    if (!jsonField(resp.body(), "status").contains("completed")) return Nil
    Files.createDirectories(dest)
    fileUrls(resp.body()).zipWithIndex.map { case (url, i) =>
      val out = dest.resolve(f"part-$i%05d.json.gz")
      val fileReq = HttpRequest.newBuilder(URI.create(url)).GET().build()
      // Binary-safe: the .json.gz payload must never pass through a String
      // (UTF-8 decode would mangle arbitrary gzip bytes into U+FFFD).
      val fileResp = sendBytes(fileReq)
      // Fail at the source: an expired presigned URL returns an error body
      // that would otherwise be staged as a corrupt .json.gz and blow up
      // far away inside the Spark read.
      if (fileResp.statusCode() != 200)
        throw new IllegalStateException(
          s"export file GET returned HTTP ${fileResp.statusCode()}: $url")
      Files.write(out, fileResp.body())
      out
    }
  }
}

object UnityExportClient {

  private lazy val http = HttpClient.newHttpClient()

  def defaultSend(req: HttpRequest): HttpResponse[String] =
    http.send(req, HttpResponse.BodyHandlers.ofString())

  def defaultSendBytes(req: HttpRequest): HttpResponse[Array[Byte]] =
    http.send(req, HttpResponse.BodyHandlers.ofByteArray())

  def authHeader(projectId: String, apiKey: String): String =
    "Basic " + java.util.Base64.getEncoder
      .encodeToString(s"$projectId:$apiKey".getBytes("UTF-8"))

  /** The export-request payload. Pinned semantics (ua2sql.py:101–104):
    * `continueFrom` replaces `startDate`; exactly one of the two appears. */
  def requestBody(endDate: LocalDate, dataset: String,
                  startDate: Option[LocalDate],
                  continueFrom: Option[String]): String = {
    val window = continueFrom match {
      case Some(job) => s""""continueFrom": "$job""""
      case None =>
        val start = startDate.getOrElse(endDate.minusDays(30)) // 30-day backfill, ua2sql.py:257
        s""""startDate": "$start""""
    }
    s"""{$window, "endDate": "$endDate", "format": "json", "dataset": "$dataset"}"""
  }

  // Minimal JSON field extraction for the two control responses (flat
  // string fields + the fileList url array) — avoids a JSON dependency.
  private[sources] def jsonField(body: String, field: String): Option[String] = {
    val m = ("\"" + java.util.regex.Pattern.quote(field) + "\"\\s*:\\s*\"([^\"]*)\"").r
    m.findFirstMatchIn(body).map(_.group(1))
  }

  private[sources] def fileUrls(body: String): Seq[String] =
    "\"url\"\\s*:\\s*\"([^\"]*)\"".r.findAllMatchIn(body).map(_.group(1)).toSeq
}
