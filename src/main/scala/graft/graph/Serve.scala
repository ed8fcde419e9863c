package graft.graph

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.file.{Files, Path, Paths}

/** Zero-dependency static HTTP server over a graph output directory — parity
  * for the reference's `--host PORT` mode, which serves the d3js page for the
  * just-written graphs on a local port (reference
  * arelight/run/operations.py:106-107 + backend/d3js/ui_web.py). Built on the
  * JDK's `com.sun.net.httpserver`, so it adds nothing to the dependency
  * closure; the served layout is exactly what [[D3Json.save]] +
  * [[Viewer.save]] emit (`index.html`, the `force` and `radial` JSON
  * folders, `descriptions/`).
  *
  * Request handling is driver-local and read-only: resolved paths are
  * NORMALIZED and must stay inside the root directory (traversal like
  * `/../secrets` answers 404, never escapes), directories answer their
  * `index.html`, unknown paths 404. Content types cover the layout's four
  * file kinds; everything else is served as octet-stream. */
object Serve {

  private val ContentTypes = Map(
    "html" -> "text/html; charset=utf-8",
    "json" -> "application/json; charset=utf-8",
    "js" -> "text/javascript; charset=utf-8",
    "css" -> "text/css; charset=utf-8",
    "csv" -> "text/csv; charset=utf-8",
    "nt" -> "application/n-triples; charset=utf-8",
    "txt" -> "text/plain; charset=utf-8")

  private def contentType(p: Path): String = {
    val n = p.getFileName.toString
    val ext = n.substring(n.lastIndexOf('.') + 1).toLowerCase
    ContentTypes.getOrElse(ext, "application/octet-stream")
  }

  /** Start serving `dir` on `port` (0 = ephemeral; read the bound port off
    * the returned server). Non-blocking — callers own the lifecycle.
    * Binds LOOPBACK ONLY by default: this is a local viewer parity feature,
    * and a wildcard bind would expose the artifact directory to every
    * network interface; pass `loopbackOnly = false` to serve externally. */
  def start(dir: String, port: Int, loopbackOnly: Boolean = true): HttpServer = {
    val root = Paths.get(dir).toAbsolutePath.normalize()
    require(Files.isDirectory(root), s"not a directory: $dir")
    val addr =
      if (loopbackOnly)
        new InetSocketAddress(java.net.InetAddress.getLoopbackAddress, port)
      else new InetSocketAddress(port)
    val server = HttpServer.create(addr, 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        try {
          val raw = ex.getRequestURI.getPath
          val candidate = root.resolve(raw.stripPrefix("/")).normalize()
          // normalize() does not resolve symlinks — a link inside the root
          // could point outside it, so the real (link-resolved) path must
          // ALSO stay inside the real root before anything is read
          def insideReal(f: Path): Boolean =
            f.toRealPath().startsWith(root.toRealPath())
          val target =
            if (!candidate.startsWith(root)) None // traversal — never escape root
            else if (Files.isDirectory(candidate)) {
              val idx = candidate.resolve("index.html")
              if (Files.isRegularFile(idx) && insideReal(idx)) Some(idx) else None
            } else if (Files.isRegularFile(candidate) && insideReal(candidate))
              Some(candidate)
            else None
          target match {
            case Some(f) =>
              val bytes = Files.readAllBytes(f)
              ex.getResponseHeaders.set("Content-Type", contentType(f))
              ex.sendResponseHeaders(200, bytes.length.toLong)
              ex.getResponseBody.write(bytes)
            case None =>
              val msg = "404 not found\n".getBytes("UTF-8")
              ex.sendResponseHeaders(404, msg.length.toLong)
              ex.getResponseBody.write(msg)
          }
        } finally ex.close()
      }
    })
    server.start()
    server
  }

  /** CLI mode: start, announce, and block until the process is killed —
    * the reference's `--host` behavior. */
  def serveBlocking(dir: String, port: Int): Unit = {
    val server = start(dir, port)
    println(s"""{"serving":"$dir","port":${server.getAddress.getPort}}""")
    Thread.currentThread.join()
  }
}
