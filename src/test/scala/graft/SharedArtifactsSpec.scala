package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.SharedArtifacts
import graft.functions.{TextDedup, Vectors}

/** Session-scoped index memo (graft/engine/SharedArtifacts.scala): the
  * ANN/dedup family shares one IVF index and one signature table per
  * session instead of rebuilding them per query. The contract under test:
  * same (plan, params) => the SAME cached frame; different params => a
  * miss; and a hit is answer-identical to a fresh build.
  */
class SharedArtifactsSpec extends AnyFunSuite {
  import SparkFixture.spark
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id").as("id"),
      Vectors.asDouble(col("embedding")).as("v"))
    .withColumn("nrm", Vectors.norm(col("v")))

  test("memo: same key returns the identical cached frame; different key misses") {
    val base = Seq((1L, "a b c")).toDF("doc_id", "text")
    val k1 = SharedArtifacts.keyFor(base, "spec-probe", 7)
    val k2 = SharedArtifacts.keyFor(base, "spec-probe", 8)
    assert(k1 != k2, "params must discriminate keys")
    val first = SharedArtifacts.memo(k1)(base.select(col("doc_id")))
    val again = SharedArtifacts.memo(k1)(base.select(col("doc_id")))
    assert(first eq again, "same key must return the cached object")
    val other = SharedArtifacts.memo(k2)(base.select(col("doc_id")))
    assert(!(first eq other), "different key must build fresh")
  }

  test("ivfIndex2 + ivfAssign2 are shared across calls and answer-identical") {
    val nlist = Vectors.deriveNlist(emb.count())
    val i1 = Vectors.ivfIndex2(emb, nlist)
    val i2 = Vectors.ivfIndex2(emb, nlist)
    assert(i1.l1C eq i2.l1C, "l1 centroid table must be the cached frame")
    assert(i1.fineWithL1 eq i2.fineWithL1,
      "fine-centroid table must be the cached frame")
    val a1 = Vectors.ivfAssign2(emb, i1, 1)
    val a2 = Vectors.ivfAssign2(emb, i2, 1)
    // the Sim-frame underneath is memoized; the (id, cid) projections on
    // top are cheap and must agree row-for-row
    assert(a1.collect().toSeq.sortBy(_.getLong(0)) ==
      a2.collect().toSeq.sortBy(_.getLong(0)))
    // a different nprobe is a different artifact
    val p2 = Vectors.ivfAssign2(emb, i1, 2)
    assert(p2.count() > a1.count(), "nprobe=2 must emit more assignments")
  }

  test("minHashSignatures is shared and stable across calls") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val s1 = TextDedup.minHashSignatures(docs, 16)
    val s2 = TextDedup.minHashSignatures(docs, 16)
    assert(s1 eq s2, "same (docs, numPerms) must return the cached frame")
    val s3 = TextDedup.minHashSignatures(docs, 8)
    assert(!(s1 eq s3), "different numPerms must build fresh")
    assert(s1.head().getSeq[Long](s1.head().fieldIndex("sig")).size == 16)
  }
}
