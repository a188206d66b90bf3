package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.MiniSql
import graft.write.DialectSql
import graft.write.DialectSql.MergeSpec

/** EXECUTES the rendered dialect merge statements (DialectSql) against
  * the MiniSql store — golden-string renders become executed semantics:
  * ANSI/Oracle/DB2/Exasol/T-SQL MERGE, redshift's DELETE USING,
  * mariadb's alias-free EXISTS delete, starrocks/clickhouse tuple-IN
  * deletes (incl. the ALTER TABLE … DELETE mutation form), the
  * postgres/sqlite ON CONFLICT and mysql ON DUPLICATE KEY upserts, and
  * the base anti-join insert / UPDATE…FROM shapes. */
class DialectExecSpec extends AnyFunSuite {

  private val spec = MergeSpec("dst", "stg", Seq("k"), Seq("k", "v"))

  /** dst = {1→old1, 2→old2, 3→old3}; stg = {2→new2, 3→new3, 4→new4}. */
  private def store(): MiniSql.Store = {
    val st = new MiniSql.Store(
      numeric = Set(20), typeOf = _ => (25, -1), textCode = 25,
      countCode = 20)
    st.define("dst", Seq(MiniSql.Col("k", 20), MiniSql.Col("v", 25)))
    st.define("stg", Seq(MiniSql.Col("k", 20), MiniSql.Col("v", 25)))
    st.definePk("dst", Seq("k"))
    val d = st.resolve("dst"); val s = st.resolve("stg")
    Seq("1" -> "old1", "2" -> "old2", "3" -> "old3").foreach { case (k, v) =>
      st.appendText(d, Seq(Some(k), Some(v)), Seq(0, 1)) }
    Seq("2" -> "new2", "3" -> "new3", "4" -> "new4").foreach { case (k, v) =>
      st.appendText(s, Seq(Some(k), Some(v)), Seq(0, 1)) }
    st
  }

  private def result(st: MiniSql.Store): Seq[(String, String)] =
    st.textRows("dst").map(r => (r(0).get, r(1).get)).sortBy(_._1)

  private val merged = Seq("1" -> "old1", "2" -> "new2", "3" -> "new3",
    "4" -> "new4")

  private val upserts: Seq[(String, MergeSpec => Seq[String])] = Seq(
    "oracle MERGE (subquery USING)" ->
      (s => Seq(DialectSql.oracleUpsert(s))),
    "exasol MERGE (table USING)" -> (s => Seq(DialectSql.exasolUpsert(s))),
    "db2 MERGE (table USING)" -> (s => Seq(DialectSql.db2Upsert(s))),
    "sqlserver MERGE (HOLDLOCK + ';')" ->
      (s => Seq(DialectSql.sqlserverUpsert(s))),
    "azuresql/fabric MERGE" -> (s => Seq(DialectSql.tsqlCloudUpsert(s))),
    "postgres ON CONFLICT" -> (s => Seq(DialectSql.postgresUpsert(s))),
    "sqlite ON CONFLICT (WHERE true)" ->
      (s => Seq(DialectSql.sqliteUpsert(s))),
    "mysql ON DUPLICATE KEY" -> (s => Seq(DialectSql.mysqlUpsert(s))),
    "ansi base MERGE" -> (s => Seq(DialectSql.mergeUpdateInsert(s))),
    "base delete_insert (EXISTS)" -> (s => DialectSql.mergeDeleteInsert(s)),
    "sqlserver delete_insert (DELETE alias FROM)" ->
      (s => DialectSql.sqlserverDeleteInsert(s)),
    "redshift delete_insert (DELETE USING)" ->
      (s => DialectSql.redshiftDeleteInsert(s)),
    "mariadb delete_insert (alias-free EXISTS)" ->
      (s => DialectSql.mariadbDeleteInsert(s)),
    "starrocks delete_insert (tuple IN)" ->
      (s => DialectSql.starrocksDeleteInsert(s)),
    "clickhouse delete_insert (ALTER TABLE DELETE mutation)" ->
      (s => DialectSql.clickhouseDeleteInsert(s)))

  upserts.foreach { case (name, render) =>
    test(s"executed upsert semantics: $name") {
      val st = store()
      render(spec).foreach(st.run)
      assert(result(st) == merged, name)
    }
  }

  test("executed insert-missing semantics: base NOT EXISTS, clickhouse " +
      "tuple NOT IN, athena") {
    Seq(DialectSql.mergeInsert(spec),
      DialectSql.clickhouseInsertMissing(spec),
      DialectSql.athenaInsertMissing(spec)).foreach { sql =>
      val st = store()
      st.run(sql)
      assert(result(st) == Seq("1" -> "old1", "2" -> "old2",
        "3" -> "old3", "4" -> "new4"), sql.take(40))
    }
  }

  test("executed merge_update semantics: UPDATE … FROM touches matches " +
      "only") {
    val st = store()
    st.run(DialectSql.mergeUpdate(spec))
    assert(result(st) ==
      Seq("1" -> "old1", "2" -> "new2", "3" -> "new3"))
  }

  test("executed append semantics: proton plain INSERT…SELECT") {
    val st = store()
    st.run(DialectSql.protonInsert(spec))
    assert(st.textRows("dst").size == 6) // 3 existing + 3 appended
  }

  test("multi-column pk and extra value columns merge by name") {
    val st = new MiniSql.Store(
      numeric = Set(20), typeOf = _ => (25, -1), textCode = 25,
      countCode = 20)
    val cols = Seq(MiniSql.Col("k1", 20), MiniSql.Col("k2", 25),
      MiniSql.Col("a", 25), MiniSql.Col("b", 25))
    st.define("dst", cols); st.define("stg", cols)
    val d = st.resolve("dst"); val s = st.resolve("stg")
    st.appendText(d, Seq(Some("1"), Some("x"), Some("a1"), Some("b1")),
      Seq(0, 1, 2, 3))
    st.appendText(s, Seq(Some("1"), Some("x"), Some("A1"), Some("B1")),
      Seq(0, 1, 2, 3))
    st.appendText(s, Seq(Some("1"), Some("y"), Some("A2"), Some("B2")),
      Seq(0, 1, 2, 3))
    val sp = MergeSpec("dst", "stg", Seq("k1", "k2"),
      Seq("k1", "k2", "a", "b"))
    st.run(DialectSql.oracleUpsert(sp))
    assert(st.textRows("dst").map(_.map(_.get)).sortBy(_(1)) == Seq(
      Seq("1", "x", "A1", "B1"), Seq("1", "y", "A2", "B2")))
  }
}
