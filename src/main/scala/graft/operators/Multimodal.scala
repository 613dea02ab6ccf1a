package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (builder brief): media as opaque `binary`
  * columns plus typed metadata, with decode/feature-extraction staged as
  * per-partition batch functions.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic fake; what is real and tested is the
  * Spark-side shape: the schema, the binary column, the mapPartitions batch
  * boundary (the Scala analogue of `mapInPandas` batches), and the
  * partition-preserving, shuffle-free plan.
  */
object Multimodal {

  /** Typed metadata emitted by the (stubbed) decoder. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  /** STUB decoder: a real pipeline would decode image bytes here (e.g. via a
    * JNI codec or, in PySpark, a pandas batch UDF). Deterministic fake:
    * dimensions derived from byte length so tests and the oracle can verify
    * the plumbing end-to-end. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int) = {
    val n = bytes.length
    (16 + n % 32, 16 + (n / 32) % 32, 1 + n % 8)
  }

  /** Binary "media" table synthesized from documents (UTF-8 payload standing
    * in for image bytes), then decoded per partition — no shuffle, batch
    * shape identical to a real decode stage. */
  def mediaMeta(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val binDf = docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("media_bytes"))
    import spark.implicits._
    binDf.as[(Long, Array[Byte])].mapPartitions { it =>
      it.map { case (id, bytes) =>
        val (w, h, f) = decodeStub(bytes)
        (id, bytes.length.toLong, w, h, f)
      }
    }.toDF("doc_id", "n_bytes", "width", "height", "n_frames")
  }

  /** Oracle-checked metadata query: pure-expression twin of the stub decode
    * so DuckDB can replay it (the mapPartitions path is covered by the
    * ScalaTest spec asserting both paths agree). */
  val mmMeta = QueryDef("mm_media_meta",
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST(16 + octet_length(encode(text)) % 32 AS INTEGER) AS width,
      |  CAST(16 + (octet_length(encode(text)) // 32) % 32 AS INTEGER) AS height,
      |  CAST(1 + octet_length(encode(text)) % 8 AS INTEGER) AS n_frames
      |FROM documents""".stripMargin) { (spark, d) =>
    val nb = length(encode(col("text"), "UTF-8"))
    Tables.documents(spark, d).select(
      col("doc_id"),
      nb.cast("long").as("n_bytes"),
      (lit(16) + nb % 32).cast("int").as("width"),
      (lit(16) + floor(nb / lit(32)).cast("long") % 32).cast("int").as("height"),
      (lit(1) + nb % 8).cast("int").as("n_frames"))
  }

  val all: Seq[QueryDef] = Seq(mmMeta)
}
