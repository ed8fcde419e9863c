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
    } finally server.stop(0)
  }
}
