package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Central source layer: every table the engine reads, with its quirks
  * handled in one place. The reference's only source is a text file of
  * comma-separated points (reference: README.md:73-75,
  * DBSCANSuite.scala:32-34); this engine reads the driver's parquet
  * tables plus CSV for the golden fixture.
  */
object Sources {

  /** TPC-H-ish tables: plain parquet scans (schema from the footer;
    * filters/pruning push down — PLANS.md shows `PushedFilters`).
    */
  def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** events.parquet carries TIMESTAMP(NANOS), which Spark's reader
    * rejects; read `ts` as epoch-nano long (SPARK-40819 legacy switch).
    * Keep all ts arithmetic in exact integer division.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$dir/events.parquet")
  }

  /** The events schema as the file stream source needs it (explicit
    * schema is mandatory for streams; ts as epoch-nano long).
    */
  val eventsStreamSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming read of the events table (file source; glob-filtered so
    * the directory's other tables are ignored).
    */
  def eventsStream(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.readStream.schema(eventsStreamSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
  }

  /** The documents schema for the file stream source. */
  val documentsStreamSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Streaming read of the documents table (file source). */
  def documentsStream(s: SparkSession, dir: String): DataFrame =
    s.readStream.schema(documentsStreamSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)

  /** The embeddings schema for the file stream source. */
  val embeddingsStreamSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** Streaming read of the embeddings table (file source). */
  def embeddingsStream(s: SparkSession, dir: String): DataFrame =
    s.readStream.schema(embeddingsStreamSchema)
      .option("pathGlobFilter", "embeddings.parquet")
      .parquet(dir)

  /** Headerless x,y[,label] points CSV (the reference's input format). */
  def pointsCsv(s: SparkSession, path: String): DataFrame =
    s.read.csv(path).select(
      col("_c0").cast("double").as("x"),
      col("_c1").cast("double").as("y"))
}
