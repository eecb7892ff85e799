package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Count-min sketch contract: the sketch never undercounts
  * (est >= exact for every term), the sketch table is dim-bounded, and
  * heavy hitters by estimate are a superset of heavy hitters by exact
  * count (the one-sided-error guarantee that makes CM a safe
  * pre-filter).
  */
class CmSketchSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("est >= exact everywhere; heavy-hitter superset; bounded sketch") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sketch = TextIndex.cmSketch(docs, "text", depth = 4, width = 1024)
    sketch.count() should be <= (4L * 1024L)

    val hh = TextIndex.cmHeavyHitters(docs, "text", minCount = 1L,
        depth = 4, width = 1024)
      .select("term", "est", "exact", "overcount")
      .as[(String, Long, Long, Long)].collect()
    hh.foreach { case (t, est, exact, over) =>
      withClue(t) {
        est should be >= exact
        over shouldBe est - exact
      }
    }
    // superset: every term with exact >= thr appears with est >= thr
    val thr = 500L
    val exactHeavy = hh.filter(_._3 >= thr).map(_._1).toSet
    val estHeavy = hh.filter(_._2 >= thr).map(_._1).toSet
    exactHeavy.subsetOf(estHeavy) shouldBe true
    exactHeavy should not be empty
  }
}
