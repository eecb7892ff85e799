package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.TestSpark

/** Schema-drift tripwire for the documents and embeddings tables —
  * the companion of [[TsEncodingSpec]] for the other two stream
  * sources.
  *
  * The regression class: file streams need an explicit schema, an
  * explicit schema asserts a physical encoding, and the upstream
  * writer is free to re-encode between data generations (events.ts
  * did exactly that in r8). These tests read the REAL testdata and
  * assert (a) the stream sources deliver the canonical schema
  * whatever the footer says, and (b) stream and batch reads agree on
  * content — so a width/type drift in documents or embeddings fails
  * one pointed test instead of silently corrupting 40 downstream
  * queries.
  */
class SchemaDriftSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  private val sfDir = "/root/testdata/sf0.001"

  private def streamToTable(df: DataFrame, name: String): DataFrame = {
    val q = df.writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
  }

  test("documents stream: canonical schema and batch-identical content") {
    val stream = Sources.documentsStream(spark, sfDir)
    stream.schema shouldBe Sources.documentsStreamSchema

    val got = streamToTable(stream, "drift_docs")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("chars"),
        sum(crc32(col("text"))).as("text_crc"),
        countDistinct("lang").as("langs")).head()
    val want = spark.read.parquet(s"$sfDir/documents.parquet")
      .agg(count(lit(1)), sum(col("n_chars").cast("long")),
        sum(crc32(col("text"))), countDistinct("lang")).head()
    got shouldBe want
    got.getLong(0) should be > 0L
  }

  test("embeddings stream: canonical schema and batch-identical content") {
    val stream = Sources.embeddingsStream(spark, sfDir)
    stream.schema shouldBe Sources.embeddingsStreamSchema
    stream.schema("embedding").dataType shouldBe ArrayType(FloatType)

    val got = streamToTable(stream, "drift_embs")
      .select(col("vec_id"), col("label"),
        aggregate(col("embedding"), lit(0.0d), (acc, x) => acc + x).as("s"))
      .agg(count(lit(1)).as("n"), sum("label").as("lbl"),
        sum(round(col("s"), 4).cast("decimal(18,4)")).as("vsum")).head()
    val want = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("label").cast("int").as("label"),
        aggregate(col("embedding").cast("array<float>"), lit(0.0d),
          (acc, x) => acc + x).as("s"))
      .agg(count(lit(1)), sum("label"),
        sum(round(col("s"), 4).cast("decimal(18,4)"))).head()
    got shouldBe want
    got.getLong(0) should be > 0L
  }

  test("batch tables: canonical column types hold on the live footer") {
    // the batch path takes the footer schema as-is; pin the invariants
    // downstream queries actually rely on, so a re-type trips here
    val docs = Sources.table(spark, sfDir, "documents")
    docs.schema("doc_id").dataType shouldBe LongType
    docs.schema("text").dataType shouldBe StringType
    Seq(LongType, IntegerType, ShortType) should contain(
      docs.schema("n_chars").dataType)

    val embs = Sources.table(spark, sfDir, "embeddings")
    embs.schema("vec_id").dataType shouldBe LongType
    embs.schema("embedding").dataType match {
      case ArrayType(et, _) =>
        (et == FloatType || et == DoubleType) shouldBe true
      case other => fail(s"embedding is $other, not an array")
    }
  }
}
