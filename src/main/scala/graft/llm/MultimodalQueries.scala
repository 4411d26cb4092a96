package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque BINARY columns with a
  * typed metadata struct, plus a partition-wise feature-extraction
  * stage.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * deterministic stub ([[StubDecoder]]) — but everything Spark-side is
  * real and tested: the binary column, the metadata schema, the
  * mapPartitions batch shape (the Scala analog of a `mapInPandas`
  * batch UDF: one iterator in, one iterator out, zero per-row JVM
  * boundary crossings), and the partitioning story (features computed
  * partition-local, no shuffle).
  */
object MultimodalQueries {
  import graft.Tables.documents

  /** Deterministic stand-in for a media decoder: byte-level features
    * that a real implementation would replace with pixel/sample data.
    */
  object StubDecoder {
    /** "Decode" a payload into (n_bytes, first, last, checksum mod 1e6). */
    def features(payload: Array[Byte]): (Long, Int, Int, Long) = {
      if (payload.isEmpty) (0L, -1, -1, 0L)
      else {
        var sum = 0L
        var i = 0
        while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
        (payload.length.toLong, payload(0) & 0xff,
          payload(payload.length - 1) & 0xff, sum % 1000000L)
      }
    }
  }

  private val featureSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("first_byte", IntegerType),
    StructField("last_byte", IntegerType),
    StructField("checksum", LongType)))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // M1 — binary payload + typed metadata struct, all columnar
    // expressions (octet length, digest, format tag).
    "m1_multimodal_meta" -> ((s, d) =>
      documents(s, d)
        .withColumn("payload", col("text").cast("binary"))
        .select(col("doc_id"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          md5(col("payload")).as("digest"),
          when(col("doc_id") % 3 === 0, "image/jpeg")
            .when(col("doc_id") % 3 === 1, "audio/wav")
            .otherwise("video/mp4").as("media_type"))
        .orderBy("doc_id")),

    // M3 — frame sampling + resize over the binary payload: every
    // `stride` bytes take a `frameLen`-byte frame, right-pad short
    // frames to the fixed size (the resize analog). Pure columnar
    // array expressions — the batch shape a video pipeline needs
    // (payload → bounded frame list → per-frame features).
    "m3_frame_sample" -> ((s, d) =>
      documents(s, d)
        .withColumn("frames", expr(
          """transform(sequence(0, CAST(greatest(length(text) - 1, 0) / 64 AS INT)),
            |  i -> rpad(substring(text, i * 64 + 1, 16), 16, '.'))"""
            .stripMargin))
        .select(col("doc_id"),
          size(col("frames")).as("n_frames"),
          md5(concat_ws("", col("frames"))).as("frames_digest"),
          expr("frames[0]").as("first_frame"))
        .orderBy("doc_id")),

    // M2 — partition-wise feature extraction through the stub decoder:
    // the mapPartitions batch shape of a media pipeline (real plumbing,
    // fake decode).
    "m2_multimodal_features" -> ((s, d) => {
      val enc = org.apache.spark.sql.Encoders.row(featureSchema)
      documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .mapPartitions { it =>
          it.map { r =>
            val (n, f, l, c) = StubDecoder.features(r.getAs[Array[Byte]]("payload"))
            Row(r.getAs[Long]("doc_id"), n, f, l, c)
          }
        }(enc)
        .orderBy("doc_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "m1_multimodal_meta" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes,
        |  md5(text) AS digest,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image/jpeg'
        |       WHEN doc_id % 3 = 1 THEN 'audio/wav'
        |       ELSE 'video/mp4' END AS media_type
        |FROM documents ORDER BY doc_id""".stripMargin,
    "m3_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    [rpad(substr(text, i * 64 + 1, 16), 16, '.')
        |     FOR i IN range(CAST(greatest(length(text) - 1, 0) // 64 AS BIGINT) + 1)]
        |      AS frames
        |  FROM documents)
        |SELECT doc_id, len(frames) AS n_frames,
        |  md5(list_reduce(frames, (a, b) -> a || b)) AS frames_digest,
        |  frames[1] AS first_frame
        |FROM f ORDER BY doc_id""".stripMargin,
    // ASCII text: bytes == chars, so the stubbed byte features are
    // recomputable from the text column.
    "m2_multimodal_features" ->
      """WITH b AS (
        |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes,
        |    ascii(substr(text, 1, 1)) AS first_byte,
        |    ascii(substr(text, -1, 1)) AS last_byte,
        |    list_reduce(list_transform(range(length(text)),
        |      i -> CAST(ascii(substr(text, i + 1, 1)) AS BIGINT)),
        |      (a, c) -> a + c) % 1000000 AS checksum
        |  FROM documents)
        |SELECT doc_id, n_bytes, first_byte, last_byte, checksum
        |FROM b ORDER BY doc_id""".stripMargin
  )
}
