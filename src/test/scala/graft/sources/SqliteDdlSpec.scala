package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Rowid-alias detection on PARSED column defs (round-2 ADVICE: the previous
  * raw-substring match missed quoted/bracketed column names, returning null
  * where the rowid substitution belongs). */
class SqliteDdlSpec extends AnyFunSuite {

  test("inline INTEGER PRIMARY KEY aliases the rowid — bare, quoted, bracketed, backticked") {
    assert(Sqlite.rowidAliasIndex("CREATE TABLE t(id INTEGER PRIMARY KEY, x TEXT)").contains(0))
    assert(Sqlite.rowidAliasIndex("CREATE TABLE t(\"id\" INTEGER PRIMARY KEY, x TEXT)").contains(0))
    assert(Sqlite.rowidAliasIndex("CREATE TABLE t([id] INTEGER PRIMARY KEY, x TEXT)").contains(0))
    assert(Sqlite.rowidAliasIndex("CREATE TABLE t(`id` INTEGER PRIMARY KEY, x TEXT)").contains(0))
    assert(Sqlite.rowidAliasIndex("CREATE TABLE t(x TEXT, id integer primary key autoincrement)").contains(1))
  }

  test("single-column table-level PRIMARY KEY on an INTEGER column also aliases") {
    assert(Sqlite.rowidAliasIndex("CREATE TABLE t(id INTEGER, x TEXT, PRIMARY KEY(id))").contains(0))
    assert(Sqlite.rowidAliasIndex("CREATE TABLE t(id INTEGER, x TEXT, PRIMARY KEY(\"id\"))").contains(0))
  }

  test("non-aliasing shapes: non-INTEGER pk, composite pk, WITHOUT ROWID, no pk") {
    assert(Sqlite.rowidAliasIndex("CREATE TABLE t(id TEXT PRIMARY KEY, x TEXT)").isEmpty)
    assert(Sqlite.rowidAliasIndex("CREATE TABLE t(a INTEGER, b INTEGER, PRIMARY KEY(a, b))").isEmpty)
    assert(Sqlite.rowidAliasIndex(
      "CREATE TABLE t(id INTEGER PRIMARY KEY, x TEXT) WITHOUT ROWID").isEmpty)
    assert(Sqlite.rowidAliasIndex("CREATE TABLE t(id INTEGER, x TEXT)").isEmpty)
    // INT (not exactly INTEGER) never aliases per the sqlite rule
    assert(Sqlite.rowidAliasIndex("CREATE TABLE t(id INT PRIMARY KEY, x TEXT)").isEmpty)
  }

  test("PRIMARY KEY DESC: inline form is NOT a rowid alias, table-level form IS") {
    // sqlite file-format quirk: `x INTEGER PRIMARY KEY DESC` inline does NOT
    // alias the rowid; only the table-level `PRIMARY KEY(x DESC)` form does.
    assert(Sqlite.rowidAliasIndex("CREATE TABLE t(id INTEGER PRIMARY KEY DESC, x TEXT)").isEmpty)
    assert(Sqlite.rowidAliasIndex("CREATE TABLE t(id integer primary key desc, x TEXT)").isEmpty)
    // ASC and AUTOINCREMENT still alias
    assert(Sqlite.rowidAliasIndex("CREATE TABLE t(id INTEGER PRIMARY KEY ASC, x TEXT)").contains(0))
    // table-level DESC aliases
    assert(Sqlite.rowidAliasIndex("CREATE TABLE t(id INTEGER, x TEXT, PRIMARY KEY(id DESC))").contains(0))
    assert(Sqlite.rowidAliasIndex("CREATE TABLE t(id INTEGER, x TEXT, PRIMARY KEY(\"id\" DESC))").contains(0))
  }

  test("a PRIMARY KEY mention inside another column's CHECK never misfires") {
    assert(Sqlite.rowidAliasIndex(
      "CREATE TABLE t(a TEXT CHECK(a <> 'PRIMARY KEY'), id INTEGER PRIMARY KEY)").contains(1))
  }
}
