package graft.functions

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck invariants for the round-3 kernels: the BPE-ish token
  * scanner against the reference regex it replaces, the sorted-merge
  * intersection count against set algebra, and the n-D local DBSCAN's
  * index-invariance.
  */
object KernelPropertiesSpec extends Properties("graft.functions.kernels") {

  // mixed text: words, digits, punctuation, whitespace runs
  private val genChunk: Gen[String] = Gen.oneOf(
    Gen.alphaStr.map(_.take(8)),
    Gen.numStr.map(_.take(6)),
    Gen.oneOf("...", "-", "!?", "(", ")", ",", "'s"),
    Gen.oneOf(" ", "  ", "\t", "\n", " \t "))
  private val genText: Gen[String] =
    Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n, genChunk)).map(_.mkString)

  private val refPattern = java.util.regex.Pattern.compile(
    " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\f\r]+")

  property("bpeTokenCount == reference regex scan") = forAll(genText) { text =>
    val m = refPattern.matcher(text)
    var n = 0L
    while (m.find()) n += 1
    TextKernels.bpeTokenCount(text) == n
  }

  // the SQL surface (graft_minhash_sig, per-row kernel) must agree with
  // the Scala API's distributive MinHashAgg aggregate bit-for-bit —
  // d11 and d04 share one oracle on exactly this equivalence
  property("minhashSig kernel == MinHashAgg over the shingle stream") =
    forAll(genText) { text =>
      val k = 8
      val kernel = TextKernels.minhashSig(text, k, 3).toSeq
      val agg = new MinHashAgg(k, 1000000007L)
      val viaAgg = TextKernels.shingleHashes(text, 3)
        .foldLeft(agg.zero)((buf, sh) => agg.reduce(buf, sh))
      kernel == agg.finish(viaAgg)
    }

  private val genSortedSet: Gen[Array[Long]] =
    Gen.chooseNum(0, 60).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-100L, 100L))).map(_.distinct.sorted.toArray)

  property("SortedIntersectCount == set intersection size") =
    forAll(genSortedSet, genSortedSet) { (a, b) =>
      val spark = graft.operators.TestSpark.spark
      import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
      val got = Seq((a, b)).toDF("a", "b")
        .select(Exprs.sortedIntersectCount(
          org.apache.spark.sql.functions.col("a"),
          org.apache.spark.sql.functions.col("b")))
        .head().getLong(0)
      got == a.toSet.intersect(b.toSet).size.toLong
    }
}
