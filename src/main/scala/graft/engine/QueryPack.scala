package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of declared queries (SURVEY.md §2.2) plus their DuckDB
  * oracle SQL. The driver's correctness gate runs every `queries` entry at
  * sf0.01 and hash-compares against `oracle` run in DuckDB over the same
  * parquet files. Queries without an oracle entry get a weaker rows-only
  * check (used for approximate / hash-seeded operators whose exact output
  * is engine-specific by design).
  *
  * Contract discipline (drives the whole repo):
  *  - identical column NAMES in both sides (driver sorts columns by name);
  *  - a deterministic total ORDER BY (unique key suffix) on both sides;
  *  - every ARITHMETIC double is rounded (2dp money, 6dp ratios) so
  *    float summation-order noise cannot flip a hash; raw stored doubles
  *    pass through unrounded (bit-exact in parquet on both engines);
  *  - BIGINT casts where DuckDB widens (sum(int) → HUGEINT).
  *
  * Packs declare Seqs, not Maps: a Map literal silently collapses a
  * duplicated key (last-wins), which once shadowed a live operator
  * (q_cohens_kappa, r13). QueryCorpusSpec asserts `declared` /
  * `declaredOracle` names are distinct within every pack AND across
  * packs; `queries` / `oracle` are the deduplicating views the engine
  * and driver consume.
  */
trait QueryPack {
  def declared: Seq[(String, (SparkSession, String) => DataFrame)]
  def declaredOracle: Seq[(String, String)]

  final def queries: Map[String, (SparkSession, String) => DataFrame] =
    declared.toMap
  final def oracle: Map[String, String] = declaredOracle.toMap
}
