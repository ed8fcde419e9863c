package graft.gen

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.core.Page

/** Deterministic synthetic Common-Crawl-style page generator.
  *
  * Shape mirrors BASELINE.json input_hint: (url, warc_ts, html, text, lang).
  * Text embeds bracket-annotated `[TYPE:Value]` entity mentions — the
  * reference's own deterministic NER trick (test/utils_entity_parser.py:16-29)
  * — with a Zipfian skew over entities (hot countries/politicians dominate,
  * per north_star) and sentiment cue words so all three classes appear.
  *
  * Fully distributed and seed-stable: page i is a pure function of (seed, i),
  * generated via spark.range — no driver-side data, no shuffle, any scale.
  * html is a fixed template around the text such that
  * TextOps.extractText(html) == text byte-identically (the input_hint
  * invariant, tested in TextOpsSpec).
  */
object PageGen {

  val entities: IndexedSeq[(String, String)] = IndexedSeq(
    ("GPE", "Arland"), ("GPE", "Borduria"), ("GPE", "Carpathia"), ("GPE", "Dorne"),
    ("GPE", "Elbonia"), ("GPE", "Freedonia"), ("GPE", "Genovia"), ("GPE", "Hyrkania"),
    ("PERSON", "Ada-Lest"), ("PERSON", "Bo-Rankin"), ("PERSON", "Cy-Moler"),
    ("PERSON", "Dea-Voss"), ("PERSON", "Eli-North"), ("PERSON", "Fay-Odum"),
    ("ORG", "Acme-Council"), ("ORG", "Borax-Union"), ("ORG", "Cobalt-League"),
    ("ORG", "Delta-Fund"), ("LOC", "Eastbank"), ("LOC", "Northreach"))

  private val posCues = Vector("praised", "supported", "welcomed", "cooperation", "agreement")
  private val negCues = Vector("condemned", "attacked", "sanctions", "threat", "crisis")
  private val neuFill = Vector("yesterday", "reported", "statement", "meeting", "officials",
    "summit", "talks", "delegation", "press", "sources", "announced", "during", "regional")

  /** splitmix64 — stable cheap PRNG step. */
  private def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  private final class Rng(seed: Long) {
    private var s = seed
    def nextLong(): Long = { s = mix(s); s }
    def nextInt(n: Int): Int = ((nextLong() >>> 1) % n).toInt
    def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
  }

  /** Zipf(s=1.1) index over `n` items via inverse-CDF on precomputed weights. */
  private def zipfIndex(r: Double, cdf: Array[Double]): Int = {
    var lo = 0; var hi = cdf.length - 1
    while (lo < hi) { val mid = (lo + hi) / 2; if (cdf(mid) < r) lo = mid + 1 else hi = mid }
    lo
  }

  private lazy val entityCdf: Array[Double] = {
    val w = Array.tabulate(entities.length)(i => 1.0 / math.pow(i + 1, 1.1))
    val total = w.sum
    val cdf = new Array[Double](w.length)
    var acc = 0.0
    for (i <- w.indices) { acc += w(i) / total; cdf(i) = acc }
    cdf
  }

  /** Generate the text of page `i` (pure function of seed + i).
    * `sentsMin/sentsMax` size the page; defaults are small (test speed), the
    * bench uses Common-Crawl-realistic sizes. */
  def pageText(seed: Long, i: Long): String = pageText(seed, i, 2, 6)

  def pageText(seed: Long, i: Long, sentsMin: Int, sentsMax: Int): String = {
    val rng = new Rng(mix(seed) ^ mix(i))
    val nSents = sentsMin + rng.nextInt(math.max(1, sentsMax - sentsMin + 1))
    val sents = (0 until nSents).map { _ =>
      val nEnts = 1 + rng.nextInt(3) // 1..3 entities per sentence
      val ents = (0 until nEnts).map { _ =>
        val (t, v) = entities(zipfIndex(rng.nextDouble(), entityCdf))
        s"[$t:$v]"
      }
      val cue = rng.nextInt(3) match {
        case 0 => posCues(rng.nextInt(posCues.length))
        case 1 => negCues(rng.nextInt(negCues.length))
        case _ => neuFill(rng.nextInt(neuFill.length))
      }
      val fill = (0 until 2 + rng.nextInt(4)).map(_ => neuFill(rng.nextInt(neuFill.length)))
      // interleave: fill* ent (cue ent)* fill*
      val words = scala.collection.mutable.ArrayBuffer.empty[String]
      words ++= fill.take(2)
      words += ents.head
      ents.tail.foreach { e => words += cue; words += e }
      words ++= fill.drop(2)
      words.mkString(" ")
    }
    sents.mkString("\n")
  }

  def pageHtml(text: String): Array[Byte] = {
    val body = text.split("\n", -1).map(l => s"<p>$l</p>").mkString("")
    s"<html><head><title>t</title><script>var x=1;</script></head><body>$body</body></html>"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  def page(seed: Long, i: Long): Page = page(seed, i, 2, 6)

  def page(seed: Long, i: Long, sentsMin: Int, sentsMax: Int): Page = {
    val text = pageText(seed, i, sentsMin, sentsMax)
    Page(
      url = f"https://synthetic.test/$seed%d/page-$i%08d",
      warc_ts = new Timestamp(1700000000000L + i * 1000L),
      html = pageHtml(text),
      text = text,
      lang = "en")
  }

  /** Distributed generation: one narrow map over spark.range — partitions scale
    * with the session's parallelism, no shuffle. */
  def pages(n: Long, seed: Long = 42L, partitions: Int = 0,
      sentsMin: Int = 2, sentsMax: Int = 6)(
      implicit spark: SparkSession): Dataset[Page] = {
    import spark.implicits._
    val base = if (partitions > 0) spark.range(0L, n, 1L, partitions) else spark.range(n)
    base.map(i => page(seed, i, sentsMin, sentsMax))
  }
}
