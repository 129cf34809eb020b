package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted per partition.
  *
  * The decode step is a clearly-marked deterministic STUB (no image/audio
  * libs in this container); everything around it — schema, batch shape,
  * partition-wise execution, fan-out — is real and tested. Swap
  * [[fakeDecode]] for a JNI/javacv decoder without touching the plumbing.
  *
  * Scale: media bytes never shuffle — features are computed partition-local
  * (`mapPartitions`), and only the (id, features) projection moves.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, mime: String, media: Array[Byte])
  final case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Long,
      features: Array[Float])

  /** Attach a synthetic binary media column to a (doc_id, text) table —
    * the fixture path standing in for real blob ingestion.
    */
  def withFakeMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      element_at(typedLit(Seq("image/png", "audio/wav", "video/mp4")),
        (col("doc_id") % 3 + 1).cast("int")).as("mime"),
      struct(
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        md5(col("text")).as("content_hash")).as("meta"))

  /** Raw media ingestion: Spark's `binaryFile` source reads a directory
    * of image/audio/video files as (path, modificationTime, length,
    * content) rows — the real on-ramp from an object store full of media
    * to the opaque-binary column the pipeline operates on. MIME derives
    * from the extension here (a 100 TB ingest sniffs magic bytes inside
    * the per-partition decode instead — one more reason decode is
    * partition-local). Media files are unsplittable, so parallelism =
    * file count; `pathGlobFilter` prunes non-media files at listing time,
    * before any bytes are read.
    */
  def ingestBinaryFiles(spark: SparkSession, path: String,
      glob: String = "*"): DataFrame = {
    val ext = regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1)
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
      .select(
        col("path").as("media_uri"),
        col("length").as("n_bytes"),
        col("content").as("media"),
        coalesce(element_at(typedLit(Map(
          "png" -> "image/png", "jpg" -> "image/jpeg",
          "jpeg" -> "image/jpeg", "gif" -> "image/gif",
          "wav" -> "audio/wav", "mp3" -> "audio/mpeg",
          "mp4" -> "video/mp4", "mkv" -> "video/x-matroska")),
          lower(ext)), lit("application/octet-stream")).as("mime"))
  }

  /** STUB decoder — deterministic 8-dim byte histogram standing in for a
    * real image/audio decode. Replace with the actual decoder at
    * deployment; the signature (bytes → float features) is the contract.
    */
  private[operators] def fakeDecode(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](8)
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) >> 5) += 1f
      i += 1
    }
    val n = math.max(bytes.length, 1).toFloat
    hist.map(_ / n)
  }

  /** Partition-wise feature extraction: one decoder instance per partition
    * (the expensive init amortizes across the batch), rows streamed —
    * the `mapInPandas`-equivalent shape in Scala.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // decoder/model init would happen here, once per partition
      rows.map { r =>
        MediaFeatures(r.doc_id, r.mime, r.media.length.toLong,
          fakeDecode(r.media))
      }
    }
  }

  /** Frame sampling fan-out for video rows: each video expands to
    * `framesPerDoc` (doc_id, frame_idx, frame_bytes) rows via a generator —
    * the explode is the plan-level shape real frame extraction needs.
    */
  def sampleFrames(media: DataFrame, framesPerDoc: Int): DataFrame = {
    // sequence(0, -1) defaults to step -1 and yields [0, -1]: a caller
    // disabling sampling with framesPerDoc = 0 would get TWO bogus
    // frames per video (the second substring counting from the blob's
    // END) instead of none
    require(framesPerDoc >= 0, s"framesPerDoc must be >= 0: $framesPerDoc")
    if (framesPerDoc == 0)
      return media.select(col("doc_id"), lit(0).as("frame_idx"),
        col("media").as("frame_bytes")).limit(0)
    // any video/* container: [[ingestBinaryFiles]] itself emits
    // video/x-matroska for .mkv — an mp4-only equality filter would
    // silently skip every mkv document's frames
    media.filter(col("mime").startsWith("video/"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(framesPerDoc - 1)),
          i => substring(col("media"), (i * 16 + 1).cast("int"), lit(16)))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame_bytes")
  }
}
