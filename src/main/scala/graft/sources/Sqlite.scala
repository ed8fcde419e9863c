package graft.sources

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** Minimal read-only sqlite3 file parser — enough of the storage format
  * (https://www.sqlite.org/fileformat2.html) to read the reference's golden
  * fixtures byte-for-byte without a JDBC driver (reference sink:
  * arelight/data/writers/sqlite_native.py:43-111; reader:
  * arelight/third_party/sqlite3.py:27-43). Supports: table b-trees (interior +
  * leaf), all serial types, overflow-page chains, sqlite_master schema lookup.
  * Not supported (not needed for fixtures): indexes, WAL, freelist reuse,
  * pointer-map pages — files written by plain INSERTs read fine.
  *
  * A sqlite file is inherently a single-node artifact; at engine scale the
  * table substrate is parquet (COVERAGE.md S4/K1). This reader exists so
  * fixture parity is against the REAL reference bytes, not a transcription.
  */
object Sqlite {

  // ------------------------------------------------------------- file access

  final class Db private[Sqlite] (bytes: Array[Byte]) {
    private val buf = ByteBuffer.wrap(bytes)
    val pageSize: Int = {
      val raw = ((bytes(16) & 0xff) << 8) | (bytes(17) & 0xff)
      if (raw == 1) 65536 else raw
    }
    private val reserved = bytes(20) & 0xff
    private[Sqlite] val usable = pageSize - reserved

    require(new String(bytes, 0, 15, StandardCharsets.US_ASCII) == "SQLite format 3",
      "not a sqlite3 file")

    private[Sqlite] def u8(pos: Int): Int = bytes(pos) & 0xff
    private[Sqlite] def u16(pos: Int): Int = ((bytes(pos) & 0xff) << 8) | (bytes(pos + 1) & 0xff)
    private[Sqlite] def u32(pos: Int): Long =
      ((bytes(pos) & 0xffL) << 24) | ((bytes(pos + 1) & 0xffL) << 16) |
        ((bytes(pos + 2) & 0xffL) << 8) | (bytes(pos + 3) & 0xffL)
    private[Sqlite] def pageStart(page: Long): Int = ((page - 1) * pageSize).toInt
    private[Sqlite] def slice(pos: Int, len: Int): Array[Byte] =
      java.util.Arrays.copyOfRange(bytes, pos, pos + len)
    private[Sqlite] def double(pos: Int): Double = buf.getDouble(pos)

    /** (value, bytesConsumed) big-endian 7-bit varint, 9th byte full-width. */
    private[Sqlite] def varint(pos: Int): (Long, Int) = {
      var v = 0L; var i = 0
      while (i < 8) {
        val b = bytes(pos + i)
        v = (v << 7) | (b & 0x7fL)
        if ((b & 0x80) == 0) return (v, i + 1)
        i += 1
      }
      ((v << 8) | (bytes(pos + 8) & 0xffL), 9)
    }
  }

  def open(path: String): Db = new Db(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))

  // ------------------------------------------------------------- record decode

  /** Decode one record payload into column values
    * (null | Long | Double | String | Array[Byte]). */
  private def decodeRecord(payload: Array[Byte]): Seq[Any] = {
    val db = ByteBuffer.wrap(payload)
    def varint(pos: Int): (Long, Int) = {
      var v = 0L; var i = 0
      while (i < 8) {
        val b = payload(pos + i)
        v = (v << 7) | (b & 0x7fL)
        if ((b & 0x80) == 0) return (v, i + 1)
        i += 1
      }
      ((v << 8) | (payload(pos + 8) & 0xffL), 9)
    }
    val (headerLen, h0) = varint(0)
    var hp = h0
    val types = Seq.newBuilder[Long]
    while (hp < headerLen) { val (t, n) = varint(hp); types += t; hp += n }
    var dp = headerLen.toInt
    types.result().map { t =>
      def int(n: Int): Long = { // big-endian two's complement
        var v = if ((payload(dp) & 0x80) != 0) -1L else 0L
        (0 until n).foreach(i => v = (v << 8) | (payload(dp + i) & 0xffL))
        dp += n; v
      }
      t match {
        case 0 => null
        case 1 => int(1)
        case 2 => int(2)
        case 3 => int(3)
        case 4 => int(4)
        case 5 => int(6)
        case 6 => int(8)
        case 7 => val v = db.getDouble(dp); dp += 8; v
        case 8 => 0L
        case 9 => 1L
        case n if n >= 13 && n % 2 == 1 =>
          val len = ((n - 13) / 2).toInt
          val s = new String(payload, dp, len, StandardCharsets.UTF_8); dp += len; s
        case n if n >= 12 =>
          val len = ((n - 12) / 2).toInt
          val b = java.util.Arrays.copyOfRange(payload, dp, dp + len); dp += len; b
        case n => throw new IllegalStateException(s"reserved serial type $n")
      }
    }
  }

  /** Payload bytes of a table-leaf cell, following the overflow chain when the
    * record does not fit the local cell (format doc §B-tree Pages). */
  private def cellPayload(db: Db, cellPos: Int): (Seq[Any], Long) = {
    val (payloadLen, n1) = db.varint(cellPos)
    val (rowid, n2) = db.varint(cellPos + n1)
    val contentPos = cellPos + n1 + n2
    val u = db.usable
    val x = u - 35
    val payload: Array[Byte] =
      if (payloadLen <= x) db.slice(contentPos, payloadLen.toInt)
      else {
        val m = ((u - 12) * 32 / 255) - 23
        val k = m + ((payloadLen - m) % (u - 4)).toInt
        val local = if (k <= x) k else m
        val out = new java.io.ByteArrayOutputStream(payloadLen.toInt)
        out.write(db.slice(contentPos, local), 0, local)
        var next = db.u32(contentPos + local)
        var remaining = payloadLen - local
        while (next != 0 && remaining > 0) {
          val p = db.pageStart(next)
          val take = math.min(remaining, (u - 4).toLong).toInt
          out.write(db.slice(p + 4, take), 0, take)
          remaining -= take
          next = db.u32(p)
        }
        out.toByteArray
      }
    (decodeRecord(payload), rowid)
  }

  /** In-order walk of a table b-tree rooted at `page` (1-based). */
  private def walkTable(db: Db, page: Long): Seq[(Seq[Any], Long)] = {
    val start = db.pageStart(page)
    val headerOff = if (page == 1) start + 100 else start
    val pageType = db.u8(headerOff)
    val nCells = db.u16(headerOff + 3)
    pageType match {
      case 0x0d => // leaf
        (0 until nCells).map { i =>
          cellPayload(db, start + db.u16(headerOff + 8 + 2 * i))
        }
      case 0x05 => // interior
        val children = (0 until nCells).map { i =>
          db.u32(start + db.u16(headerOff + 12 + 2 * i))
        } :+ db.u32(headerOff + 8) // rightmost pointer
        children.flatMap(walkTable(db, _))
      case t => throw new IllegalStateException(f"unexpected page type 0x$t%02x (index b-trees unsupported)")
    }
  }

  // ------------------------------------------------------------- schema layer

  final case class Table(name: String, columns: Seq[String], declaredTypes: Seq[String],
      rootPage: Long, sql: String, rowidAlias: Option[Int] = None)

  private[sources] final case class ColDef(name: String, tpe: String, inlinePk: Boolean)

  private def unquote(s: String): String =
    s.stripPrefix("\"").stripSuffix("\"").stripPrefix("`").stripSuffix("`")
      .stripPrefix("[").stripSuffix("]")

  /** Column defs from a CREATE TABLE statement — top-level comma split,
    * mirroring the reference's dynamically generated DDL shape
    * (sqlite_native.py:43-60). Returns column defs plus the single-column
    * table-level PRIMARY KEY target, if any (both feed rowid-alias detection). */
  private[sources] def parseColumns(sql: String): (Seq[ColDef], Option[String]) = {
    val body = sql.substring(sql.indexOf('(') + 1, sql.lastIndexOf(')'))
    val parts = Seq.newBuilder[String]
    var depth = 0; val cur = new StringBuilder
    body.foreach {
      case ',' if depth == 0 => parts += cur.toString; cur.clear()
      case c =>
        if (c == '(') depth += 1 else if (c == ')') depth -= 1
        cur += c
    }
    parts += cur.toString
    val defs = parts.result().map(_.trim).filter(_.nonEmpty)
    val constraintHeads = Set("PRIMARY", "UNIQUE", "CHECK", "FOREIGN", "CONSTRAINT")
    // table-level `PRIMARY KEY(col)` with ONE column: also a rowid alias
    // candidate per the sqlite rule (when that column is INTEGER)
    val tablePk = defs
      .find(_.takeWhile(!_.isWhitespace).equalsIgnoreCase("PRIMARY"))
      .flatMap { d =>
        val inner = d.substring(d.indexOf('(') + 1, d.lastIndexOf(')'))
        val cols = inner.split(",").map(c => unquote(c.trim.split(raw"\s+")(0)))
        if (cols.length == 1) Some(cols(0)) else None
      }
    val cols = defs
      .filterNot(c => constraintHeads.contains(c.takeWhile(!_.isWhitespace).toUpperCase(java.util.Locale.ROOT)))
      .map { colDef =>
        val toks = colDef.split(raw"\s+", 2)
        val name = unquote(toks(0))
        val rest = if (toks.length > 1) toks(1) else ""
        val tpe = rest.takeWhile(_.isLetter).toUpperCase(java.util.Locale.ROOT)
        // inline `PRIMARY KEY` on the column def — detected on the PARSED def
        // (quoted/bracketed names included), not by substring-matching raw DDL.
        // `INTEGER PRIMARY KEY DESC` inline is NOT a rowid alias per the
        // sqlite file-format quirk (only the table-level PRIMARY KEY(x DESC)
        // form is); `ASC` and `AUTOINCREMENT` still qualify.
        ColDef(name, tpe,
          rest.toUpperCase(java.util.Locale.ROOT).matches(raw"(?s).*\bPRIMARY\s+KEY\b(?!\s+DESC\b).*"))
      }
    (cols, tablePk)
  }

  /** The rowid-alias column index per the sqlite rule: a column declared
    * INTEGER that is the (inline or single-column table-level) PRIMARY KEY of
    * a rowid table. Such columns store null in the record body and take the
    * cell's rowid. */
  private[sources] def rowidAliasIndex(sql: String): Option[Int] = {
    if (sql.toUpperCase(java.util.Locale.ROOT).matches(raw"(?s).*\bWITHOUT\s+ROWID\b.*")) return None
    val (cols, tablePk) = parseColumns(sql)
    cols.zipWithIndex.collectFirst {
      case (c, i) if c.tpe == "INTEGER" &&
        (c.inlinePk || tablePk.exists(_.equalsIgnoreCase(c.name))) => i
    }
  }

  def tables(path: String): Seq[Table] = tables(open(path))

  private def tables(db: Db): Seq[Table] =
    walkTable(db, 1).flatMap { case (row, _) =>
      // sqlite_master: (type, name, tbl_name, rootpage, sql)
      (row.lift(0), row.lift(1), row.lift(3), row.lift(4)) match {
        case (Some("table"), Some(name: String), Some(root: Long), Some(sql: String)) =>
          val (cols, _) = parseColumns(sql)
          Some(Table(name, cols.map(_.name), cols.map(_.tpe), root, sql, rowidAliasIndex(sql)))
        case _ => None
      }
    }

  /** All rows of `table` as decoded values, with the rowid. Column order is
    * DDL order; missing trailing columns (older-schema rows) come back null. */
  def readRows(path: String, table: String): (Table, Seq[Seq[Any]]) = {
    val db = open(path) // one read: schema walk and row walk share the buffer
    val t = tables(db).find(_.name == table)
      .getOrElse(throw new NoSuchElementException(s"table $table not in $path"))
    val rows = walkTable(db, t.rootPage).map { case (row, rowid) =>
      // INTEGER PRIMARY KEY columns store null and alias the rowid; fixtures
      // have no such alias but the substitution is part of the format. The
      // alias is detected from the PARSED column defs (rowidAliasIndex), so
      // quoted/bracketed column names substitute correctly too.
      val padded = row.padTo(t.columns.length, null)
      t.rowidAlias match {
        case Some(i) if padded(i) == null => padded.updated(i, rowid: Any)
        case _                            => padded
      }
    }
    (t, rows)
  }

  /** DataFrame view (S4 sqlite table scan): declared INTEGER -> long, REAL ->
    * double, everything else string. The file is read driver-side (a sqlite
    * file is a single-node artifact by construction; scale substrate is
    * parquet/Iceberg — COVERAGE.md). */
  def table(spark: org.apache.spark.sql.SparkSession, path: String, tableName: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types._
    val (t, rows) = readRows(path, tableName)
    val fields = t.columns.zip(t.declaredTypes).map { case (c, tp) =>
      StructField(c, tp match {
        case "INTEGER" | "INT" => LongType
        case "REAL" | "FLOAT" | "DOUBLE" => DoubleType
        case _ => StringType
      })
    }
    val data = rows.map { r =>
      org.apache.spark.sql.Row.fromSeq(r.zip(fields).map {
        case (null, _) => null
        case (v: Long, StructField(_, LongType, _, _)) => v
        case (v: Long, StructField(_, DoubleType, _, _)) => v.toDouble
        case (v: Double, StructField(_, DoubleType, _, _)) => v
        case (v: Array[Byte], StructField(_, StringType, _, _)) => new String(v, StandardCharsets.UTF_8)
        case (v, StructField(_, StringType, _, _)) => v.toString
        case (v, f) => throw new IllegalStateException(s"cannot adapt $v to ${f.dataType}")
      })
    }
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](scala.jdk.CollectionConverters.SeqHasAsJava(data).asJava),
      StructType(fields))
  }
}
