package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class DocSourcesSpec extends AnyFunSuite with SparkTestSession {

  private val dir = Files.createTempDirectory("docsrc").toString

  private def write(name: String, content: String): String = {
    val p = Paths.get(dir, name)
    Files.write(p, content.getBytes(StandardCharsets.UTF_8))
    p.toString
  }

  test("txt: one file = one doc, rstripped, doc_id <path>:0 (S1)") {
    val p = write("a.txt", "Hello world.\nSecond line.\n\n")
    val rows = DocSources.txt(spark, p).collect()
    assert(rows.length == 1)
    assert(rows(0).getString(0).endsWith("a.txt:0"))
    assert(rows(0).getString(1) == "Hello world.\nSecond line.")
  }

  test("csv column: one row = one doc, row-ordered ids, BOM tolerated (S2)") {
    val p = write("b.csv", "﻿id,text\n1,first doc\n2,second doc\n")
    val rows = DocSources.csvColumn(spark, p, "text").collect().sortBy(_.getString(0))
    assert(rows.map(_.getString(1)).toSeq == Seq("first doc", "second doc"))
    assert(rows.map(_.getString(0)).toSeq == Seq(s"$p:0", s"$p:1"))
  }

  test("sqlite table: one row (named column) = one doc, row-ordered ids (S4)") {
    val p = "/root/reference/test/data/opennre-data-test-predict.sqlite"
    val rows = DocSources.sqliteTable(spark, p, "contents", "text_a").collect()
    assert(rows.length == 32)
    assert(rows.map(_.getString(0)).toSet == (0 until 32).map(i => s"$p:$i").toSet)
    assert(rows.forall(_.getString(1).nonEmpty))
  }

  test("jsonl: one line = one doc (S7)") {
    val p = write("c.jsonl", """{"text":"x1"}""" + "\n" + """{"text":"x2"}""" + "\n")
    val rows = DocSources.jsonl(spark, p, "text").collect().sortBy(_.getString(0))
    assert(rows.map(_.getString(1)).toSeq == Seq("x1", "x2"))
  }

  test("zip: txt + csv members dispatched per extension (S3)") {
    val zp = Paths.get(dir, "d.zip")
    val zos = new ZipOutputStream(Files.newOutputStream(zp))
    zos.putNextEntry(new ZipEntry("inner.txt"))
    zos.write("zip text doc \n".getBytes(StandardCharsets.UTF_8))
    zos.putNextEntry(new ZipEntry("inner.csv"))
    zos.write("id,text\n1,zip csv doc\n".getBytes(StandardCharsets.UTF_8))
    zos.close()
    val rows = DocSources.zip(spark, zp.toString).collect().sortBy(_.getString(0))
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(
      "inner.csv:0" -> "zip csv doc",
      "inner.txt:0" -> "zip text doc"))
  }

  test("docsLimit keeps first n per file (F2) and pages adapter feeds the pipeline") {
    val p = write("e.csv", "text\nd0\nd1\nd2\nd3\n")
    val docs = DocSources.csvColumn(spark, p, "text")
    val limited = DocSources.docsLimit(docs, 2).collect()
    assert(limited.map(_.getString(1)).sorted.toSeq == Seq("d0", "d1"))
    val pages = DocSources.asPages(DocSources.docsLimit(docs, 2)).collect()
    assert(pages.map(_.text).sorted.toSeq == Seq("d0", "d1"))
  }
}
