package graft.operators

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned embedding index with a building→active→retired generation
  * lifecycle (reference: internal/vector/sqlitevec/schema.sql:8-29 +
  * backend.go:102-435 — unique active generation, fingerprint for change
  * detection) re-expressed as versioned Parquet directories:
  *
  *   <dir>/gen=<n>/  — (message_id, embedding float[]) rows
  *   <dir>/_index.json — {"active": n, "fingerprint": "..."}
  *
  * Spark-first reasoning: a generation is immutable columnar data; "switch
  * active" is a metadata pointer flip, so readers never see a half-built
  * index; retired generations are just unreferenced directories. At scale
  * a generation can be written by a full cluster job while the previous
  * stays live.
  */
object VectorIndex {

  final case class IndexState(active: Long, fingerprint: String)

  private def metaPath(dir: String) = Paths.get(dir, "_index.json")

  def readState(dir: String): Option[IndexState] = {
    val p = metaPath(dir)
    if (!Files.exists(p)) None
    else {
      val s = new String(Files.readAllBytes(p), "UTF-8")
      val gen = """"active"\s*:\s*(\d+)""".r.findFirstMatchIn(s).map(_.group(1).toLong)
      val fp = """"fingerprint"\s*:\s*"([^"]*)"""".r.findFirstMatchIn(s).map(_.group(1))
      for (g <- gen; f <- fp) yield IndexState(g, f)
    }
  }

  private def writeState(dir: String, st: IndexState): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(metaPath(dir),
      s"""{"active":${st.active},"fingerprint":"${st.fingerprint}"}""".getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }

  /** Build the next generation from (id, embedding) rows and atomically
    * activate it. Returns the new generation number.
    */
  def buildGeneration(vectors: DataFrame, dir: String,
      fingerprint: String): Long = {
    val next = readState(dir).map(_.active + 1).getOrElse(0L)
    vectors.write.mode(SaveMode.Overwrite)
      .option("compression", "zstd").parquet(s"$dir/gen=$next")
    writeState(dir, IndexState(next, fingerprint))
    next
  }

  /** The active generation's vectors; None before any build completes. */
  def active(spark: SparkSession, dir: String): Option[DataFrame] =
    readState(dir).map(st => spark.read.parquet(s"$dir/gen=${st.active}"))

  /** Rebuild needed iff the corpus fingerprint changed (reference
    * backend.go fingerprint check).
    */
  def needsRebuild(dir: String, fingerprint: String): Boolean =
    !readState(dir).exists(_.fingerprint == fingerprint)

  /** find_similar_messages (reference mcp/server.go:342-358 +
    * backend.go:606-626): the seed message's stored vector becomes the
    * query; the seed itself is excluded from results. A seed with no
    * stored vector (embedded in a later generation, or a bad id) returns
    * an empty result, not a crash — this is an API-facing path.
    */
  def findSimilar(vectors: DataFrame, seedId: Long, k: Int): DataFrame =
    vectors.filter(col("message_id") === seedId)
      .select(col("embedding")).head(1).headOption match {
      case Some(row) =>
        val seed = row.getAs[scala.collection.Seq[Float]](0).toSeq
        Similarity.bruteForceKnn(
          vectors.filter(col("message_id") =!= seedId),
          col("message_id"), col("embedding"), seed, k)
      case None =>
        vectors.select(col("message_id").as("vec_id"),
          org.apache.spark.sql.functions.lit(0.0).as("score")).limit(0)
    }
}
