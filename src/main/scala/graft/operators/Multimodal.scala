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

  /** Frame sampling over the media column: slice each payload into the
    * stub-decoded n_frames equal chunks, keep every 2nd frame, digest each.
    * The Spark shape is the point: metadata-driven explode (generator) of a
    * binary payload into per-frame rows with no shuffle — what a video
    * pipeline does between decode and per-frame featurization. Framing is
    * character-based in the oracle-checked query (both engines' substring
    * is character-indexed; the byte-exact path is [[frameSampleBatch]]). */
  val mmFrameSample = QueryDef("mm_frame_sample",
    """WITH m AS (
      |  SELECT doc_id, text,
      |    CAST(1 + octet_length(encode(text)) % 8 AS INTEGER) AS n_frames
      |  FROM documents),
      |s AS (SELECT doc_id, text, n_frames, length(text) // n_frames AS fs FROM m),
      |f AS (SELECT doc_id, fs, unnest(generate_series(0, n_frames - 1)) AS frame_idx, text FROM s)
      |SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
      |  CAST(fs AS BIGINT) AS frame_chars,
      |  md5(substring(text, CAST(frame_idx * fs + 1 AS INTEGER), CAST(fs AS INTEGER))) AS frame_md5
      |FROM f WHERE frame_idx % 2 = 0 AND fs > 0""".stripMargin) { (spark, d) =>
    Tables.documents(spark, d)
      .select(col("doc_id"), col("text"),
        (lit(1) + length(encode(col("text"), "UTF-8")) % 8).cast("int").as("n_frames"))
      .withColumn("fs", expr("length(text) div n_frames"))
      .select(col("doc_id"), col("fs"), col("text"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
      .filter(col("frame_idx") % 2 === 0 && col("fs") > 0)
      .select(col("doc_id"), col("frame_idx").cast("int").as("frame_idx"),
        col("fs").cast("long").as("frame_chars"),
        md5(encode(expr("substring(text, cast(frame_idx * fs + 1 as int), cast(fs as int))"),
          "UTF-8")).as("frame_md5"))
  }

  /** Byte-exact frame sampling as a per-partition batch stage (the shape a
    * real codec integration uses; STUB framing = equal byte chunks from the
    * stub metadata). Equality with the expression path on ASCII payloads is
    * asserted by spec. */
  def frameSampleBatch(docs: DataFrame, every: Int = 2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("media_bytes"))
      .as[(Long, Array[Byte])].mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val nFrames = decodeStub(bytes)._3
          val fs = bytes.length / nFrames
          if (fs == 0) Iterator.empty
          else (0 until nFrames by every).iterator.map { i =>
            val frame = java.util.Arrays.copyOfRange(bytes, i * fs, i * fs + fs)
            val digest = java.security.MessageDigest.getInstance("MD5").digest(frame)
            (id, i, fs.toLong, digest.map("%02x".format(_)).mkString)
          }
        }
      }.toDF("doc_id", "frame_idx", "frame_chars", "frame_md5")
  }

  /** Resize planning: aspect-preserving scale of each media item to a max
    * side of 224 px, from the stub-decoded dimensions. All-integer inputs,
    * one double division (both engines IEEE-identical), integral floor
    * dims; out_bytes = out_w*out_h*3 (RGB) — the buffer size a real
    * resizer would allocate. */
  val mmResize = QueryDef("mm_resize",
    """WITH m AS (
      |  SELECT doc_id,
      |    CAST(16 + octet_length(encode(text)) % 32 AS INTEGER) AS w,
      |    CAST(16 + (octet_length(encode(text)) // 32) % 32 AS INTEGER) AS h
      |  FROM documents),
      |s AS (SELECT doc_id, w, h,
      |  round(224.0 / CASE WHEN w > h THEN w ELSE h END, 6) AS scale FROM m)
      |SELECT doc_id, w, h, scale,
      |  CAST(floor(w * scale) AS INTEGER) AS out_w,
      |  CAST(floor(h * scale) AS INTEGER) AS out_h,
      |  CAST(CAST(floor(w * scale) AS BIGINT) * CAST(floor(h * scale) AS BIGINT) * 3 AS BIGINT) AS out_bytes
      |FROM s""".stripMargin) { (spark, d) =>
    val nb = length(encode(col("text"), "UTF-8"))
    Tables.documents(spark, d)
      .select(col("doc_id"),
        (lit(16) + nb % 32).cast("int").as("w"),
        (lit(16) + floor(nb / lit(32)).cast("long") % 32).cast("int").as("h"))
      .withColumn("scale", round(lit(224.0) / greatest(col("w"), col("h")), 6))
      .select(col("doc_id"), col("w"), col("h"), col("scale"),
        floor(col("w") * col("scale")).cast("int").as("out_w"),
        floor(col("h") * col("scale")).cast("int").as("out_h"),
        (floor(col("w") * col("scale")) * floor(col("h") * col("scale")) * 3L)
          .cast("long").as("out_bytes"))
  }

  /** Byte-level resize as a batch stage: allocates the out_w*out_h*3 RGB
    * buffer a real resampler would fill (STUB fill: repeating source bytes).
    * Buffer shapes are spec-checked against the expression plan above. */
  def resizeBatch(docs: DataFrame, maxSide: Int = 224): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("media_bytes"))
      .as[(Long, Array[Byte])].mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (w, h, _) = decodeStub(bytes)
          // same rounding as the expression side (Spark round = HALF_UP)
          val scale = BigDecimal(maxSide.toDouble / math.max(w, h))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          val (ow, oh) = (math.floor(w * scale).toInt, math.floor(h * scale).toInt)
          val out = new Array[Byte](ow * oh * 3)
          var i = 0
          while (i < out.length && bytes.nonEmpty) { out(i) = bytes(i % bytes.length); i += 1 }
          (id, ow, oh, out)
        }
      }.toDF("doc_id", "out_w", "out_h", "resized")
  }

  val all: Seq[QueryDef] = Seq(mmMeta, mmFrameSample, mmResize)
}
