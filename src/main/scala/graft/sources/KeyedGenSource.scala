package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Storage-partitioned-join (SPJ) exemplar source: a deterministic
  * generated table `(key BIGINT, v BIGINT)` whose scan REPORTS its
  * key-grouped layout to Catalyst (`SupportsReportPartitioning` +
  * `KeyGroupedPartitioning` over the identity transform of `key`, one
  * input split per key value via `HasPartitionKey`).
  *
  * This is the DSv2 machinery behind shuffle-free fact-fact joins at
  * 100 TB (Iceberg/Delta bucketed tables do exactly this): when BOTH join
  * sides report compatible key-grouped layouts and
  * `spark.sql.sources.v2.bucketing.enabled` is on, EnsureRequirements
  * plans the join with ZERO ShuffleExchange — the single biggest cost on
  * a petabyte join. Round16Spec pins the no-shuffle plan and result
  * equality with the shuffled plan; q_spj_join carries the oracle.
  *
  * Rows are a pure function of the options (`n` rows, `k` key groups,
  * `mult` value multiplier): row i has key = i % k,
  * v = (i * mult) % 1000003 — exactly replayable in the DuckDB oracle
  * from range(n), and exact in BIGINT for n·mult < 2^63.
  */
class KeyedGenSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KeyedGenSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    def opt(name: String, default: Long): Long =
      Option(properties.get(name)).map(_.toLong).getOrElse(default)
    new KeyedGenTable(opt("n", 1000L), opt("k", 8L).toInt,
      opt("mult", 2654435761L))
  }
}

private[graft] object KeyedGenSource {
  val schema: StructType = StructType(Seq(
    StructField("key", LongType), StructField("v", LongType)))
  val MOD = 1000003L
  /** Last runtime-filter survivor set, for spec observability only (the
    * driver and executors share this JVM in local mode). */
  val lastRuntimeKeptKeys =
    new java.util.concurrent.atomic.AtomicReference[Array[Int]](Array.empty)
}

private[sources] class KeyedGenTable(n: Long, k: Int, mult: Long)
  extends Table with SupportsRead {

  override def name(): String = s"keyed_gen(n=$n,k=$k,mult=$mult)"
  override def schema(): StructType = KeyedGenSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  // table-level layout declaration, same shape a bucketed/partitioned
  // catalog table advertises
  override def partitioning(): Array[Transform] =
    Array(Expressions.identity("key"))

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder = new ScanBuilder {
    override def build(): Scan = new Scan
        with SupportsReportPartitioning
        with SupportsReportOrdering
        with SupportsRuntimeV2Filtering {
      // keys surviving runtime filtering; starts as all k groups
      private var keptKeys: Seq[Int] = 0 until k

      override def readSchema(): StructType = KeyedGenSource.schema
      override def description(): String = name()
      // the scan-level promise EnsureRequirements matches against the
      // other join side: rows are clustered by identity(key) across
      // exactly k input splits
      override def outputPartitioning(): Partitioning =
        new KeyGroupedPartitioning(
          Array(Expressions.identity("key")), keptKeys.length)

      // per-partition order promise: every split holds a SINGLE key value,
      // so rows are trivially sorted by key — combined with the
      // partitioning report, a sort-merge join over two such scans plans
      // with NO Sort either (SupportsReportOrdering kills the last
      // per-partition pass a 100 TB co-located join would pay)
      override def outputOrdering():
          Array[org.apache.spark.sql.connector.expressions.SortOrder] =
        Array(Expressions.sort(Expressions.column("key"),
          org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING))

      // Runtime (dynamic) partition pruning, the DSv2 half of DPP: after
      // the dimension side of a join executes, Spark hands the observed
      // join-key values here as an IN predicate and the scan drops whole
      // key-group splits BEFORE reading them. At 100 TB this is the
      // difference between scanning every partition of a fact table and
      // scanning the three the dimension filter selects.
      override def filterAttributes():
          Array[org.apache.spark.sql.connector.expressions.NamedReference] =
        Array(Expressions.column("key"))

      override def filter(predicates: Array[
          org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit =
        predicates.foreach { p =>
          if (p.name() == "IN" && p.children().nonEmpty) {
            val vals = p.children().drop(1).flatMap {
              case l: org.apache.spark.sql.connector.expressions.Literal[_]
                  if l.value != null =>
                Some(l.value.toString.toLong)
              case _ => None
            }.toSet
            keptKeys = keptKeys.filter(key => vals.contains(key.toLong))
            KeyedGenSource.lastRuntimeKeptKeys.set(keptKeys.toArray)
          }
        }

      override def toBatch: Batch = new Batch {
        override def planInputPartitions(): Array[InputPartition] =
          keptKeys.map(key => KeyedGenPartition(key, n, k, mult)
            : InputPartition).toArray
        override def createReaderFactory(): PartitionReaderFactory =
          new KeyedGenReaderFactory
      }
    }
  }
}

/** One split per key value; `partitionKey` is what Spark lines up across
  * the two join sides. */
private[sources] case class KeyedGenPartition(key: Int, n: Long, k: Int,
                                              mult: Long)
  extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(key.toLong)
}

private[sources] class KeyedGenReaderFactory extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[KeyedGenPartition]
    new PartitionReader[InternalRow] {
      private var i = p.key.toLong - p.k // first row of this key group - k
      override def next(): Boolean = { i += p.k; i < p.n }
      override def get(): InternalRow =
        InternalRow(p.key.toLong, (i * p.mult) % KeyedGenSource.MOD)
      override def close(): Unit = ()
    }
  }
}
