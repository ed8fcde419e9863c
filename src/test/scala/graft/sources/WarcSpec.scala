package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.gen.PageGen

class WarcSpec extends AnyFunSuite with SparkTestSession {

  private val dir = Files.createTempDirectory("warc").toString

  private def genPages(n: Int) = (0 until n).map(i => PageGen.page(7L, i.toLong))

  test("roundtrip: PageGen pages -> warc bytes -> pages, byte-identical (url/ts/html/text)") {
    val orig = genPages(5)
    val bytes = Warc.write(orig.map(p => Warc.responseRecord(p.url, p.warc_ts, p.html)))
    val back = Warc.pages(bytes)
    assert(back.size == 5)
    for ((a, b) <- orig.zip(back)) {
      assert(a.url == b.url)
      assert(a.warc_ts == b.warc_ts)
      assert(java.util.Arrays.equals(a.html, b.html))
      assert(a.text == b.text) // extractText(html) reproduces the generator text
    }
  }

  test("Content-Length-driven parse: payload containing 'WARC/1.0' does not split a record") {
    val trap = "<html><body>quoted archive: \r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\n end</body></html>"
      .getBytes(UTF_8)
    val recs = Seq(
      Warc.responseRecord("https://t/1", new Timestamp(1700000000000L), trap),
      Warc.responseRecord("https://t/2", new Timestamp(1700000001000L), "<body>two</body>".getBytes(UTF_8)))
    val back = Warc.records(Warc.write(recs))
    assert(back.size == 2)
    assert(java.util.Arrays.equals(Warc.httpResponseBody(back(0).payload), trap))
    assert(back(1).targetUri.contains("https://t/2"))
  }

  test("non-response records (warcinfo/request/metadata) are skipped; header folding works") {
    val info = Warc.Record(Vector(
      "WARC-Type" -> "warcinfo", "Content-Type" -> "application/warc-fields"),
      "software: graft\r\n".getBytes(UTF_8))
    val req = Warc.Record(Vector(
      "WARC-Type" -> "request", "WARC-Target-URI" -> "https://t/1"),
      "GET / HTTP/1.1\r\n\r\n".getBytes(UTF_8))
    val page = genPages(1).head
    val bytes = Warc.write(Seq(info, req, Warc.responseRecord(page.url, page.warc_ts, page.html)))
    val back = Warc.pages(bytes)
    assert(back.size == 1 && back.head.url == page.url)

    // folded header line (RFC-822 continuation)
    val folded = ("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://t/x\r\n" +
      "WARC-Date: 2023-01-01T00:00:00Z\r\nX-Long: part one\r\n  part two\r\n" +
      "Content-Length: 0\r\n\r\n\r\n\r\n").getBytes(UTF_8)
    val r = Warc.records(folded)
    assert(r.head.header("X-Long").contains("part one part two"))
  }

  test("truncated payload and missing Content-Length fail fast") {
    val ok = Warc.write(Seq(genPages(1).map(p => Warc.responseRecord(p.url, p.warc_ts, p.html)).head))
    intercept[IllegalArgumentException](Warc.records(ok.dropRight(10)))
    val noLen = ("WARC/1.0\r\nWARC-Type: response\r\n\r\nbody").getBytes(UTF_8)
    intercept[IllegalArgumentException](Warc.records(noLen))
  }

  test("gz member-per-record layout roundtrips through gunzipAll") {
    val orig = genPages(3)
    val gz = Warc.writeGz(orig.map(p => Warc.responseRecord(p.url, p.warc_ts, p.html)))
    val back = Warc.pages(Warc.gunzipAll(gz))
    assert(back.map(_.url) == orig.map(_.url).toVector)
    assert(back.map(_.text) == orig.map(_.text).toVector)
  }

  test("DocSources.warc reads plain and gz archives distributed; Sinks.warcGz roundtrips") {
    import spark.implicits._
    val orig = genPages(8)
    val plainPath = Paths.get(dir, "a.warc")
    Files.write(plainPath, Warc.write(orig.take(4).map(p => Warc.responseRecord(p.url, p.warc_ts, p.html))))
    val gzPath = Paths.get(dir, "b.warc.gz")
    Files.write(gzPath, Warc.writeGz(orig.drop(4).map(p => Warc.responseRecord(p.url, p.warc_ts, p.html))))

    val read = DocSources.warc(spark, s"$dir/*.warc*").collect().sortBy(_.url)
    assert(read.map(_.url).toSeq == orig.map(_.url).sorted)
    assert(read.map(_.text).toSeq == orig.sortBy(_.url).map(_.text))

    // sink: Dataset[Page] -> .warc.gz shards -> read back identical page set
    val sinkDir = s"$dir/out"
    graft.io.Sinks.warcGz(orig.toDS().repartition(3), sinkDir)
    val files = new java.io.File(sinkDir).listFiles().filter(_.getName.endsWith(".warc.gz"))
    assert(files.nonEmpty && files.length <= 3)
    val back = DocSources.warc(spark, s"$sinkDir/*.warc.gz").collect()
    assert(back.map(_.url).sorted.toSeq == orig.map(_.url).sorted)
    assert(back.sortBy(_.url).map(p => new String(p.html, UTF_8)).toSeq ==
      orig.sortBy(_.url).map(p => new String(p.html, UTF_8)))
  }
}
