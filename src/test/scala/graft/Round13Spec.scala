package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 additions. First family: the DSv2 write path — native SQL
  * MERGE INTO / UPDATE / DELETE through the WorkspaceCatalog
  * (SupportsRowLevelOperations, group-based copy-on-write), pinned
  * against the store-level invariants the reference's versioning model
  * promises: every mutation lands as a NEW content-addressed snapshot,
  * `latest` advances, and every previously-pinned version remains
  * byte-identical readable.
  */
class Round13Spec extends AnyFunSuite {
  import SparkFixture.spark

  private def mountCatalog(name: String) = {
    val store = graft.operators.WorkspaceQueries.fixture()
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sources.WorkspaceCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root",
      store.mountPath.toString)
    store
  }

  private def kv(sql: String): Seq[(String, String)] =
    spark.sql(sql).collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq

  test("native MERGE INTO commits a new snapshot version; old pins intact") {
    val store = mountCatalog("wsm")
    import spark.implicits._
    Seq(("2", "222"), ("9", "90")).toDF("k", "v")
      .createOrReplaceTempView("merge_updates")
    val beforeIds = store.versionIds("demo").toSet
    spark.sql(
      """MERGE INTO wsm.demo.`data.csv` t USING merge_updates s
        |ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)
        |""".stripMargin)
    // merged table state: 2 updated, 9 inserted, 1/3 carried over
    assert(kv("SELECT k, v FROM wsm.demo.`data.csv`") ==
      Seq("1" -> "10", "2" -> "222", "3" -> "30", "9" -> "90"))
    // a new content-addressed version exists and latest moved to it
    val newIds = store.versionIds("demo").toSet -- beforeIds
    assert(newIds.size == 1)
    assert(store.refs("demo")("latest") == newIds.head)
    // prior pins are untouched: stable (v1) and the old latest (v2 id)
    assert(kv("SELECT k, v FROM wsm.demo.`data.csv` VERSION AS OF 'stable'")
      == Seq("1" -> "10", "2" -> "20"))
    assert(kv("SELECT k, v FROM wsm.demo.`data.csv` " +
      "VERSION AS OF 'bbbb2222c0ffee'")
      == Seq("1" -> "10", "2" -> "20", "3" -> "30"))
    // non-table files rode along into the new snapshot (copy-on-write
    // copies the whole tree, one file replaced)
    val snap = store.query("demo", newIds.head, "docs/readme.txt")
    assert(snap.exists {
      case graft.core.Workspace.FileResult(_, c) => c == "version two readme"
      case _ => false
    })
  }

  test("native UPDATE and DELETE ride the same copy-on-write path") {
    val store = mountCatalog("wsu")
    spark.sql("UPDATE wsu.demo.`data.csv` SET v = '77' WHERE k = '1'")
    assert(kv("SELECT k, v FROM wsu.demo.`data.csv`") ==
      Seq("1" -> "77", "2" -> "20", "3" -> "30"))
    spark.sql("DELETE FROM wsu.demo.`data.csv` WHERE k = '2'")
    assert(kv("SELECT k, v FROM wsu.demo.`data.csv`") ==
      Seq("1" -> "77", "3" -> "30"))
    // three versions now: the fixture's two plus one per mutation
    assert(store.versionIds("demo").size == 4)
    assert(kv("SELECT k, v FROM wsu.demo.`data.csv` VERSION AS OF 'stable'")
      == Seq("1" -> "10", "2" -> "20"))
  }

  test("identical logical state commits to the identical version id") {
    // content-addressing: two stores, same mutation → same new id
    val ids = Seq("wsa", "wsb").map { name =>
      val store = mountCatalog(name)
      spark.sql(s"UPDATE $name.demo.`data.csv` SET v = '55' WHERE k = '2'")
      store.refs("demo")("latest")
    }
    assert(ids.distinct.size == 1)
  }
}
