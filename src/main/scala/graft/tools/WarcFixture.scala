package graft.tools

import java.nio.charset.StandardCharsets.UTF_8
import java.sql.Timestamp

import graft.sources.Warc

/** Writes a small deterministic Common-Crawl-style `.warc.gz` fixture whose
  * pages carry real `<a href>` markup — the drive input for
  * `Infer --warc ... --links ...` (warc → pages → KG triples + link graph in
  * one invocation). No Spark session: this is a plain fixture writer over
  * [[graft.sources.Warc.writeGz]].
  *
  * Usage: runMain graft.tools.WarcFixture /tmp/fixture_links.warc.gz [nPages] [nMirrors]
  *
  * Page i (url https://h{i%4}.fix.test/doc/{i}) links to doc (i*7+3) % n
  * absolutely and to /doc/{(i+1) % n} root-relatively, with one mailto decoy;
  * body text includes bracket entities so the KG pipeline emits triples from
  * the same pages. With nMirrors > 0, that many PAIRS of syndicated pages
  * with byte-identical bodies land on hosts hm{2k}/hm{2k+1} — the
  * `Infer --mirrors` drive detects exactly those host pairs.
  */
object WarcFixture {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse(sys.error("usage: WarcFixture <out.warc.gz> [nPages] [nMirrors]"))
    val n = args.lift(1).map(_.toInt).getOrElse(12)
    val nMirrors = args.lift(2).map(_.toInt).getOrElse(0)
    require(n > 0, s"nPages must be positive: $n")
    val recs = (0 until n).map { i =>
      val url = s"https://h${i % 4}.fix.test/doc/$i"
      val absDst = (i * 7 + 3) % n
      val relDst = (i + 1) % n
      val body =
        s"""<html><head><title>doc $i</title></head><body>
           |<p>[ORG:Acme] likes fast [GPE:Widgetland] today.</p>
           |<ul><li><a href="https://h${absDst % 4}.fix.test/doc/$absDst">to doc $absDst</a></li>
           |<li><a href='/doc/$relDst'>next doc $relDst</a></li>
           |<li><a href="mailto:x@y.z">mail decoy</a></li></ul>
           |</body></html>""".stripMargin
      Warc.responseRecord(url, new Timestamp(1700000000000L + i * 1000L),
        body.getBytes(UTF_8))
    } ++ (0 until 2 * nMirrors).map { j =>
      val body =
        s"""<html><head><title>wire story ${j / 2}</title></head><body>
           |<p>[ORG:Newswire] reports big [GPE:Widgetland] syndication ${j / 2}.</p>
           |</body></html>""".stripMargin
      Warc.responseRecord(s"https://hm$j.fix.test/wire/${j / 2}",
        new Timestamp(1700000100000L + j * 1000L), body.getBytes(UTF_8))
    }
    val bytes = Warc.writeGz(recs)
    java.nio.file.Files.write(java.nio.file.Paths.get(out), bytes)
    println(s"""{"warc_out":"$out","pages":${n + 2 * nMirrors},"bytes":${bytes.length}}""")
  }
}
