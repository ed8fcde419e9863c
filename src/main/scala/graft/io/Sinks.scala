package graft.io

import org.apache.spark.sql.DataFrame

/** Tabular sinks mirroring the reference's writers (SURVEY.md §2.2).
  *
  * K1 (sqlite with skip_existed/index) maps to [[Checkpoint]] (bucketed
  * parquet + lineage + resume); S4/S5 sqlite scans have no JDBC driver in this
  * environment — parquet is the table substrate throughout (Iceberg jars are
  * likewise absent; the layout and MERGE-shaped resume semantics are what
  * Iceberg would provide).
  */
object Sinks {

  /** K2: header csv (reference csv_native.py:31-63). */
  def csv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** K3/K4: gzipped tsv (reference csv_pd.py:22-41 / predict/writer_csv.py:19-41;
    * the reference drops its internal row_id column — callers pass the frame
    * already projected). */
  def tsvGz(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true").option("sep", "\t").option("compression", "gzip")
      .csv(path)

  /** K5 semantics (write_missed: insert rows whose id is absent from the sink)
    * without MERGE support: left-anti against the existing keys, then append. */
  def appendMissing(df: DataFrame, path: String, key: String): Long = {
    val spark = df.sparkSession
    val missing =
      try {
        val existing = spark.read.parquet(path).select(key)
        df.join(existing, Seq(key), "left_anti")
      } catch { case _: Exception => df } // first write
    val n = missing.count()
    if (n > 0) missing.write.mode("append").parquet(path)
    n
  }

  /** RDF N-Triples dump: the `line` column of [[graft.graph.Rdf.ntriples]]
    * as plain text, one statement per line — the format triple-store bulk
    * loaders stream. Writes one part file per partition (at scale, the
    * natural sharded .nt layout). */
  def ntriples(statements: DataFrame, path: String): Unit =
    statements.select("line").write.mode("overwrite").text(path)

  /** WARC export: pages out as Common-Crawl-layout `.warc.gz` shards (one
    * gzip member per record — seekable/splittable by a CDX-style member
    * index; [[graft.sources.Warc.writeGz]]). One shard per partition,
    * written executor-side through the Hadoop filesystem — no driver
    * collect, scales with the page relation's partitioning. */
  def warcGz(pages: org.apache.spark.sql.Dataset[graft.core.Page], path: String): Unit = {
    pages.rdd.mapPartitionsWithIndex { case (i, it) =>
      val recs = it.map(p => graft.sources.Warc.responseRecord(p.url, p.warc_ts, p.html)).toVector
      if (recs.isEmpty) Iterator.empty
      else {
        // executor-side Configuration: filesystem scheme resolution comes from
        // the classpath (core-site etc.) — no driver-only state needed
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(new org.apache.hadoop.conf.Configuration())
        val out = fs.create(new org.apache.hadoop.fs.Path(path, f"part-$i%05d.warc.gz"), true)
        try out.write(graft.sources.Warc.writeGz(recs)) finally out.close()
        Iterator.single(recs.size)
      }
    }.count(): Unit
  }
}
