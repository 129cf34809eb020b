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
  def sampleFrames(media: DataFrame, framesPerDoc: Int): DataFrame =
    media.filter(col("mime") === "video/mp4")
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(framesPerDoc - 1)),
          i => substring(col("media"), (i * 16 + 1).cast("int"), lit(16)))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame_bytes")
}
