package graft

import org.scalatest.funsuite.AnyFunSuite

/** One spec per declared operator (SURVEY.md §2.2): every SparkEntry query
  * must run end-to-end on the smallest corpus. Queries whose result is
  * legitimately empty at sf0.001 are allowlisted; everything else must
  * return rows. Exact values are pinned by the DuckDB oracle gate
  * (tools/check_oracle.py) and by the targeted suites in this package.
  */
class QueryCorpusSpec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}

  private val mayBeEmptyAtSf0001 = Set("q_anti_join", "q_self_join")

  test("oracle entries reference declared queries only") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracle without query: $unknown")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      val n = df.count()
      if (!mayBeEmptyAtSf0001(name))
        assert(n > 0, s"$name returned no rows")
    }
  }
}
