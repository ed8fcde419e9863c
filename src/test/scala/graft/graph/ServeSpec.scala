package graft.graph

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

class ServeSpec extends AnyFunSuite {

  private def get(port: Int, path: String): (Int, String, String) = {
    val url = java.net.URI.create(s"http://127.0.0.1:$port$path").toURL
    val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(5000)
    val code = conn.getResponseCode
    val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = new String(stream.readAllBytes(), "UTF-8")
    (code, body, Option(conn.getContentType).getOrElse(""))
  }

  test("serves the graph artifact layout; traversal and misses answer 404") {
    val dir = Files.createTempDirectory("graft-serve")
    Files.createDirectories(dir.resolve("force"))
    val forceJson = """{"nodes":[{"id":"ORG.spark","c":1}],"links":[]}"""
    Files.write(dir.resolve("force/g.json"), forceJson.getBytes("UTF-8"))
    Files.write(dir.resolve("index.html"),
      "<!doctype html><title>t</title>".getBytes("UTF-8"))
    // a sibling file OUTSIDE the served root that traversal must never reach
    val secret = dir.getParent.resolve(s"${dir.getFileName}-secret.txt")
    Files.write(secret, "nope".getBytes("UTF-8"))
    val server = Serve.start(dir.toString, 0)
    try {
      val port = server.getAddress.getPort
      val (c1, b1, t1) = get(port, "/force/g.json")
      assert(c1 == 200 && b1 == forceJson && t1.startsWith("application/json"))
      val (c2, b2, t2) = get(port, "/")
      assert(c2 == 200 && b2.contains("<title>t</title>") && t2.startsWith("text/html"))
      val (c3, _, _) = get(port, "/nothere.json")
      assert(c3 == 404)
      // URI.getPath normalizes "..", so escaping the root resolves above it
      // and must be rejected, not served
      val (c4, b4, _) = get(port, s"/../${secret.getFileName}")
      assert(c4 == 404 && !b4.contains("nope"))
      // RAW-socket traversal: HttpURLConnection normalizes '..' client-side,
      // so the request above reaches the server pre-cleaned — send the raw
      // path over a socket so the server-side startsWith(root) guard is the
      // thing being exercised
      val rawResp = rawGet(port, s"/../${secret.getFileName}")
      assert((rawResp.startsWith("HTTP/1.1 404") ||
        rawResp.startsWith("HTTP/1.1 400")) && !rawResp.contains("nope"))
      // symlink escape: a link INSIDE the root pointing outside it must 404
      // (normalize() alone cannot see it — the real-path guard must)
      val link = dir.resolve("leak.txt")
      try {
        Files.createSymbolicLink(link, secret)
        val (c5, b5, _) = get(port, "/leak.txt")
        assert(c5 == 404 && !b5.contains("nope"))
      } catch { case _: UnsupportedOperationException => () /* no symlinks */ }
    } finally server.stop(0)
  }

  /** One raw HTTP GET with the path sent verbatim (no client-side '..'
    * normalization); returns status line + headers + body as one string. */
  private def rawGet(port: Int, path: String): String = {
    val sock = new java.net.Socket("127.0.0.1", port)
    try {
      sock.setSoTimeout(5000)
      val out = sock.getOutputStream
      out.write(s"GET $path HTTP/1.1\r\nHost: 127.0.0.1\r\nConnection: close\r\n\r\n"
        .getBytes("UTF-8"))
      out.flush()
      new String(sock.getInputStream.readAllBytes(), "UTF-8")
    } finally sock.close()
  }
}
