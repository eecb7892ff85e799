package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** SemDeDup contract (Abbas et al. 2023): coarse-cluster the embedding
  * space, mark any vector with a lower-id same-cluster neighbor above
  * the cosine threshold as a duplicate of the LOWEST such id. Planted
  * positive-scaled copies share their source's direction exactly —
  * cosine is scale-invariant — so they must land in the source's
  * cluster and dedup against it.
  */
class SemanticDedupSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("planted scaled copies dedup to their source; representatives keep") {
    val emb0 = spark.read.parquet(s"$dir/embeddings.parquet")
    val base = emb0.select($"vec_id".cast("long").as("vec_id"), $"embedding")
    val planted = emb0.filter($"vec_id" % 5 === 0)
      .select(($"vec_id" + 100000L).as("vec_id"),
        transform($"embedding", x => x * lit(2.0f)).as("embedding"))
    val emb = base.unionByName(planted)

    val out = Similarity.semanticDedup(emb, nlist = 32, minCos = 0.95)
    val rows = out.collect()
    rows.length shouldBe emb.count() // one verdict per input vector

    val byId = rows.map(r => r.getLong(0) ->
      (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getBoolean(3))).toMap

    // every planted copy is marked a duplicate, and its cluster matches
    // its source's (scale-invariance of the coarse quantizer)
    val plantedIds = byId.keys.filter(_ >= 100000L)
    plantedIds should not be empty
    plantedIds.foreach { p =>
      val src = p - 100000L
      byId(p)._1 shouldBe byId(src)._1
      withClue(s"planted $p should be a dup:") { byId(p)._3 shouldBe false }
      byId(p)._2.get should be <= src // dup_of is the lowest qualifying id
    }

    // keep <=> dup_of is null, and the lowest id of every cluster keeps
    rows.foreach { r => r.getBoolean(3) shouldBe r.isNullAt(2) }
    byId.groupBy(_._2._1).foreach { case (_, members) =>
      val lowest = members.keys.min
      withClue(s"cluster representative $lowest:") { byId(lowest)._3 shouldBe true }
    }

    // dup_of always names a kept (or transitively lower) member of the
    // same cluster with a strictly lower id
    rows.filterNot(_.isNullAt(2)).foreach { r =>
      val (id, dupOf) = (r.getLong(0), r.getLong(2))
      dupOf should be < id
      byId(dupOf)._1 shouldBe r.getLong(1)
    }
  }

  test("two-level assignment keeps the contract (and stays scale-invariant)") {
    val emb0 = spark.read.parquet(s"$dir/embeddings.parquet")
    val base = emb0.select($"vec_id".cast("long").as("vec_id"), $"embedding")
    val planted = emb0.filter($"vec_id" % 5 === 0)
      .select(($"vec_id" + 100000L).as("vec_id"),
        transform($"embedding", x => x * lit(2.0f)).as("embedding"))
    val emb = base.unionByName(planted)

    // hierarchicalAbove = superList forces the two-level path at nlist=64
    val out = Similarity.semanticDedup(emb, nlist = 64, minCos = 0.95,
      superList = 8, hierarchicalAbove = 8)
    val rows = out.collect()
    rows.length shouldBe emb.count()
    val byId = rows.map(r => r.getLong(0) ->
      (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getBoolean(3))).toMap
    // both quantizer levels are scale-invariant (cosine): a planted
    // positive-scaled copy lands in its source's cell and cluster and
    // dedups against it
    byId.keys.filter(_ >= 100000L).foreach { p =>
      byId(p)._1 shouldBe byId(p - 100000L)._1
      byId(p)._3 shouldBe false
    }
    // centroid ids assigned through the tree are real centroids, and
    // every cluster's lowest member keeps
    rows.foreach(r => r.getLong(1) should be < 64L)
    byId.groupBy(_._2._1).foreach { case (_, members) =>
      byId(members.keys.min)._3 shouldBe true
    }
  }
}
