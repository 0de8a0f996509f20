package graft.api

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.DataFrame
import graft.query.{Json, Submitter}
import graft.registry.Registry

/** Read-only HTTP surface over a registry + async-style query submission —
  * the ancillary API the reference exposes via FastAPI
  * (ref: dsgrid/api/app.py:104-422). Built on the JDK's HttpServer so the
  * library stays dependency-free; a production deployment would front this
  * with spark-submit per query exactly as the reference does.
  *
  * Routes:
  *   GET  /registry/datasets              → JSON list
  *   GET  /registry/dimensions            → JSON list
  *   GET  /registry/mappings              → JSON list
  *   POST /query/project                  → run a ProjectQuery JSON document,
  *                                          respond rows as JSON (limit-capped)
  */
final class Api(registry: Registry, maxRows: Int = 10000) {

  private var server: HttpServer = _
  private lazy val submitter = new Submitter(registry)

  def start(port: Int = 0): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/registry/datasets", listHandler(() => registry.listDatasets()))
    server.createContext("/registry/dimensions", listHandler(() => registry.listDimensions()))
    server.createContext("/registry/mappings", listHandler(() => registry.listMappings()))
    server.createContext("/query/project", queryHandler())
    server.setExecutor(null)
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)

  private def listHandler(items: () => Seq[String]): HttpHandler = new HttpHandler {
    def handle(ex: HttpExchange): Unit =
      respond(ex, 200, items().map(quote).mkString("[", ",", "]"))
  }

  private def queryHandler(): HttpHandler = new HttpHandler {
    def handle(ex: HttpExchange): Unit =
      try {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val df = submitter.submit(Json.parseProjectQuery(body))
        respond(ex, 200, toJsonRows(df))
      } catch {
        case e: Exception =>
          respond(ex, 400, s"""{"error": ${quote(String.valueOf(e.getMessage))}}""")
      }
  }

  /** Rows via Spark's own JSON encoder (handles types/escaping), capped. */
  private def toJsonRows(df: DataFrame): String =
    df.limit(maxRows).toJSON.collect().mkString("[", ",", "]")

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    os.write(bytes)
    os.close()
  }
}
