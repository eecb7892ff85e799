package graft.functions

import graft.operators.{Similarity, TestSpark}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class VectorExpressionsSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("a", ArrayType(DoubleType, containsNull = true), nullable = true),
    StructField("b", ArrayType(DoubleType, containsNull = true), nullable = true)))

  private def df(rows: Seq[Row]) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)

  test("dot product: well-formed arrays fold sequentially") {
    val rows = Seq(Row(Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)))
    val got = df(rows).select(Similarity.dot(col("a"), col("b"))).head.getDouble(0)
    got shouldBe 32.0
  }

  test("dot product: null array, ragged lengths, and null elements yield NULL") {
    val rows = Seq(
      Row(null, Seq(1.0)),
      Row(Seq(1.0, 2.0), Seq(1.0)),
      Row(Seq(1.0, null, 3.0), Seq(1.0, 2.0, 3.0)))
    val got = df(rows).select(Similarity.dot(col("a"), col("b"))).collect()
    got.foreach(r => r.isNullAt(0) shouldBe true)
  }

  test("hyperplane bucket: null element yields NULL, null-free is deterministic") {
    val rows = Seq(
      Row(Seq(1.0, -2.0, 0.5), null),
      Row(Seq(1.0, null), null))
    val got = df(rows)
      .select(Similarity.hyperplaneBucket(col("a"), 8)).collect()
    got(0).isNullAt(0) shouldBe false
    got(1).isNullAt(0) shouldBe true
  }
}
