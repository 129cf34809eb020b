package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.TextFunctions
import graft.operators.{Dedup, Multimodal, Similarity}
import graft.search.SearchParser
import graft.streaming.EventsStreaming

/** SURVEY §2.9-2.13 + LLM-pipeline operators instantiated over the
  * documents / embeddings / events tables. Entries without an oracle are
  * algorithms DuckDB can't replicate bit-for-bit (xxhash64-seeded MinHash/
  * SimHash, LSH probing) — the driver records rows-only checks for those;
  * their correctness is covered by ScalaTest specs instead.
  */
object DocQueries {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // --- §2.13 text analysis ------------------------------------------------

  def textTokenCount(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars_measured"))
      .orderBy(col("doc_id").asc)

  val textTokenCountSql: String =
    """SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
      |       CAST(length(text) AS BIGINT) AS n_chars_measured
      |FROM documents ORDER BY doc_id ASC""".stripMargin

  def textQuality(s: SparkSession, dir: String): DataFrame = {
    val toks = TextFunctions.wsTokens(col("text"))
    t(s, dir, "documents")
      .select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct"),
        TextFunctions.stopwordCount(toks).cast("long").as("n_stopwords"),
        (size(array_distinct(toks)).cast("double") /
          size(toks).cast("double")).as("distinct_ratio"))
      .orderBy(col("doc_id").asc)
  }

  val textQualitySql: String =
    """SELECT doc_id,
      |       len(string_split(text, ' ')) AS n_tokens,
      |       len(list_distinct(string_split(text, ' '))) AS n_distinct,
      |       len(list_filter(string_split(text, ' '),
      |           t -> t IN ('the','a','an','and','or','of','to','in','is','it'))) AS n_stopwords,
      |       CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) /
      |         CAST(len(string_split(text, ' ')) AS DOUBLE) AS distinct_ratio
      |FROM documents ORDER BY doc_id ASC""".stripMargin

  def textFingerprint(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id").asc)

  val textFingerprintSql: String =
    "SELECT doc_id, md5(lower(text)) AS fp FROM documents ORDER BY doc_id ASC"

  /** Heuristic language ID — algorithm-specific, spec-tested; rows-only.
    * Interpreted HOF profile-scoring is the cost → spread across cores
    * first (single-file scans otherwise run it on one core).
    */
  def textLangId(s: SparkSession, dir: String): DataFrame =
    Tables.spread(t(s, dir, "documents"))
      .select(col("doc_id"), TextFunctions.langId(col("text")).as("lang_pred"))
      .orderBy(col("doc_id").asc)

  // --- §2.9 search over documents (SearchParser-compiled terms) -----------

  def searchDocs(s: SparkSession, dir: String): DataFrame = {
    val q = SearchParser.parse("spark \"window\"")
    val pred = q.textTerms
      .map(term => lower(col("text")).contains(term.toLowerCase))
      .reduce(_ && _) // AND across dimensions (reference sqlite.go:1466-1469)
    t(s, dir, "documents")
      .filter(pred)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id").asc)
  }

  val searchDocsSql: String =
    """SELECT doc_id, lang, source FROM documents
      |WHERE contains(lower(text), 'spark') AND contains(lower(text), 'window')
      |ORDER BY doc_id ASC""".stripMargin

  // --- §2.11 dedup ----------------------------------------------------------

  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exactGroups(t(s, dir, "documents"), col("doc_id"), col("text"))
      .orderBy(col("content_hash").asc)

  val dedupExactSql: String =
    """SELECT sha256(text) AS content_hash, COUNT(*) AS dup_count,
      |       MIN(doc_id) AS winner_id,
      |       list(doc_id ORDER BY doc_id) AS member_ids
      |FROM documents GROUP BY sha256(text) HAVING COUNT(*) > 1
      |ORDER BY content_hash ASC""".stripMargin

  def dedupSurvivor(s: SparkSession, dir: String): DataFrame =
    Dedup.survivorPairs(t(s, dir, "documents"), col("doc_id"),
      md5(col("text")), Nil)
      .orderBy(col("loser_id").asc)

  val dedupSurvivorSql: String =
    """SELECT doc_id AS loser_id, winner_id FROM (
      |  SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(text)) AS winner_id
      |  FROM documents)
      |WHERE doc_id != winner_id
      |ORDER BY loser_id ASC""".stripMargin

  /** MinHash-LSH near-dup candidates — xxhash64-based, spec-tested.
    * Tiny result set: total order via a single-partition sort —
    * `orderBy` would add a range exchange whose partitioner SAMPLING
    * re-executes the upstream pipeline (measured +1.2s for ≤300 rows).
    */
  def dedupMinhash(s: SparkSession, dir: String): DataFrame =
    Dedup.nearDuplicates(t(s, dir, "documents"), col("doc_id"), col("text"),
      threshold = 0.5)
      .coalesce(1)
      .sortWithinPartitions(col("id_a").asc, col("id_b").asc)

  /** SimHash signatures — xxhash64-based, spec-tested. */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashSignatures(t(s, dir, "documents"), col("doc_id"),
      TextFunctions.tokens(col("text")))
      .orderBy(col("doc_id").asc)

  /** Exact n-gram Jaccard on a deterministic pair set (adjacent doc ids) —
    * oracle-able twin of the LSH re-rank step.
    */
  def dedupJaccardPairs(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val a = docs.select(col("doc_id").as("id_a"), col("text").as("__ta"))
    val b = docs.select((col("doc_id") - 1).as("id_a"), col("text").as("__tb"),
      col("doc_id").as("id_b"))
    a.join(b, "id_a")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(
          array_distinct(TextFunctions.wsTokens(col("__ta"))),
          array_distinct(TextFunctions.wsTokens(col("__tb"))))).cast("double") /
          size(array_union(
            array_distinct(TextFunctions.wsTokens(col("__ta"))),
            array_distinct(TextFunctions.wsTokens(col("__tb"))))).cast("double"))
          .as("jaccard"))
      .orderBy(col("id_a").asc)
  }

  val dedupJaccardPairsSql: String =
    """SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |       CAST(len(list_intersect(list_distinct(string_split(a.text,' ')),
      |                               list_distinct(string_split(b.text,' ')))) AS DOUBLE) /
      |       CAST(len(list_distinct(list_concat(list_distinct(string_split(a.text,' ')),
      |                               list_distinct(string_split(b.text,' '))))) AS DOUBLE) AS jaccard
      |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      |ORDER BY id_a ASC""".stripMargin

  // --- §2.10 vector similarity ---------------------------------------------

  private def queryVector(s: SparkSession, dir: String): Seq[Float] =
    t(s, dir, "embeddings").filter(col("vec_id") === 0)
      .select(col("embedding")).head()
      .getAs[scala.collection.Seq[Float]](0).toSeq

  def vectorKnnBrute(s: SparkSession, dir: String): DataFrame =
    Similarity.bruteForceKnn(t(s, dir, "embeddings"), col("vec_id"),
      col("embedding"), queryVector(s, dir), k = 10)

  // double-precision left-fold on both sides → bit-identical scores
  val vectorKnnBruteSql: String =
    """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      |scored AS (
      |  SELECT vec_id,
      |    list_reduce(list_transform(list_zip(embedding, qv),
      |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (a,b) -> a+b) /
      |    (sqrt(list_reduce(list_transform(list_zip(embedding, embedding),
      |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (a,b) -> a+b)) *
      |     sqrt(list_reduce(list_transform(list_zip(qv, qv),
      |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (a,b) -> a+b)))
      |    AS score
      |  FROM embeddings, q)
      |SELECT vec_id, score FROM scored
      |ORDER BY score DESC, vec_id ASC LIMIT 10""".stripMargin

  /** LSH-bucketed ANN — probe-set algorithm, spec-tested vs brute force. */
  def vectorKnnLsh(s: SparkSession, dir: String): DataFrame =
    Similarity.lshKnn(t(s, dir, "embeddings"), col("vec_id"),
      col("embedding"), queryVector(s, dir), k = 10, nBits = 8)

  /** Embedding-cosine near-dup: exact twin on a deterministic pair set
    * (adjacent vec_ids, double-fold arithmetic mirrored in the oracle);
    * the LSH-bucketed scale variant is
    * [[Similarity.embeddingNearDupPairs]], spec-tested.
    */
  def dedupEmbeddingPairs(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("__ea"))
    val b = e.select((col("vec_id") - 1).as("id_a"), col("vec_id").as("id_b"),
      col("embedding").as("__eb"))
    a.join(b, "id_a")
      .select(col("id_a"), col("id_b"),
        Similarity.cosine(col("__ea"), col("__eb")).as("cosine"))
      .orderBy(col("cosine").desc, col("id_a").asc)
      .limit(100)
  }

  val dedupEmbeddingPairsSql: String =
    """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  list_reduce(list_transform(list_zip(a.embedding, b.embedding),
      |    x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (p,q) -> p+q) /
      |  (sqrt(list_reduce(list_transform(list_zip(a.embedding, a.embedding),
      |    x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (p,q) -> p+q)) *
      |   sqrt(list_reduce(list_transform(list_zip(b.embedding, b.embedding),
      |    x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (p,q) -> p+q)))
      |  AS cosine
      |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
      |ORDER BY cosine DESC, id_a ASC LIMIT 100""".stripMargin

  // --- §2.10 RRF fusion (on orders: price-rank × recency-rank) ------------

  def rrfFusion(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val byPrice = orders
      .withColumn("rank", row_number().over(
        Window.orderBy(col("o_totalprice").desc, col("o_orderkey").asc)))
      .filter(col("rank") <= 100).select(col("o_orderkey"), col("rank"))
    val byDate = orders
      .withColumn("rank", row_number().over(
        Window.orderBy(col("o_orderdate").desc, col("o_orderkey").asc)))
      .filter(col("rank") <= 100).select(col("o_orderkey"), col("rank"))
    Similarity.rrfFuse(byPrice, byDate, "o_orderkey", "rank", k = 60, limit = 50)
  }

  val rrfFusionSql: String =
    """WITH by_price AS (
      |  SELECT o_orderkey, ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS r
      |  FROM orders QUALIFY r <= 100),
      |by_date AS (
      |  SELECT o_orderkey, ROW_NUMBER() OVER (ORDER BY o_orderdate DESC, o_orderkey ASC) AS r
      |  FROM orders QUALIFY r <= 100)
      |SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
      |       COALESCE(1.0 / (60 + a.r), 0.0) + COALESCE(1.0 / (60 + b.r), 0.0) AS rrf_score
      |FROM by_price a FULL OUTER JOIN by_date b USING (o_orderkey)
      |ORDER BY rrf_score DESC, o_orderkey ASC LIMIT 50""".stripMargin

  // --- §2.12 streaming (batch twins; true streaming spec-tested) ----------

  def streamTumbling(s: SparkSession, dir: String): DataFrame =
    EventsStreaming.tumblingCounts(t(s, dir, "events"))
      .orderBy(col("bucket").asc, col("event_type").asc)

  val streamTumblingSql: String =
    """SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP) AS bucket,
      |       event_type, COUNT(*) AS cnt,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY bucket ASC, event_type ASC""".stripMargin

  /** Gap-based sessionization (30 min), lag + cumulative-sum construction —
    * identical formulation on both engines.
    */
  def streamSessionize(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ns").asc)
    t(s, dir, "events")
      .withColumn("__prev_ns", lag(col("ts_ns"), 1).over(w))
      .withColumn("__new_session",
        when(col("__prev_ns").isNull ||
          col("ts_ns") - col("__prev_ns") > 30L * 60 * 1000000000L, 1L)
          .otherwise(0L))
      .groupBy(col("user_id"))
      .agg(sum(col("__new_session")).as("session_cnt"),
        count(lit(1)).as("event_cnt"))
      .orderBy(col("user_id").asc)
  }

  val streamSessionizeSql: String =
    """SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS session_cnt,
      |       COUNT(*) AS event_cnt
      |FROM (
      |  SELECT user_id,
      |         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC) IS NULL
      |                OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC)
      |                   > INTERVAL '30 minutes'
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM events)
      |GROUP BY user_id ORDER BY user_id ASC""".stripMargin

  /** Sliding (overlapping) windows — each event lands in width/slide
    * buckets; the oracle reconstructs the same assignment with an offset
    * join (no native sliding windows in DuckDB).
    */
  def streamSliding(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("bucket"), col("cnt"))
      .orderBy(col("bucket").asc)

  val streamSlidingSql: String =
    """SELECT bucket, COUNT(*) AS cnt FROM (
      |  SELECT time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP))
      |           - INTERVAL (o.o * 30) MINUTE AS bucket,
      |         CAST(ts AS TIMESTAMP) AS tts
      |  FROM events, (SELECT unnest(range(2)) AS o) o)
      |WHERE tts >= bucket AND tts < bucket + INTERVAL '1 hour'
      |GROUP BY bucket ORDER BY bucket ASC""".stripMargin

  /** Composite quality score (C4/Gopher-style heuristics) — the one
    * text-analysis metric with full arithmetic mirrored in the oracle.
    */
  def textQualityScore(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), TextFunctions.qualityScore(col("text")).as("quality"))
      .orderBy(col("doc_id").asc)

  val textQualityScoreSql: String =
    """SELECT doc_id, round((
      |  least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 50.0, 1.0) +
      |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) /
      |    CAST(len(string_split(text, ' ')) AS DOUBLE) +
      |  least(CAST(len(list_filter(string_split(text, ' '),
      |      t -> t IN ('the','a','an','and','or','of','to','in','is','it'))) AS DOUBLE)
      |    / CAST(len(string_split(text, ' ')) AS DOUBLE) * 5.0, 1.0) +
      |  (1.0 - least(CAST(length(text) - length(regexp_replace(text, '\p{P}', '', 'g')) AS DOUBLE)
      |    / CAST(length(text) AS DOUBLE) * 4.0, 1.0))
      |) / 4.0, 6) AS quality
      |FROM documents ORDER BY doc_id ASC""".stripMargin

  /** Composed curation pipeline, deterministic core: quality gate + exact
    * dedup (min-id winner) + token accounting in one pass + one window
    * shuffle ([[graft.operators.Curation]]).
    */
  def pipelineCurate(s: SparkSession, dir: String): DataFrame =
    graft.operators.Curation.curate(t(s, dir, "documents"),
      col("doc_id"), col("text"), minQuality = 0.5)
      .orderBy(col("doc_id").asc)

  val pipelineCurateSql: String =
    """WITH q AS (
      |  SELECT doc_id, text, round((
      |    least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 50.0, 1.0) +
      |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) /
      |      CAST(len(string_split(text, ' ')) AS DOUBLE) +
      |    least(CAST(len(list_filter(string_split(text, ' '),
      |        t -> t IN ('the','a','an','and','or','of','to','in','is','it'))) AS DOUBLE)
      |      / CAST(len(string_split(text, ' ')) AS DOUBLE) * 5.0, 1.0) +
      |    (1.0 - least(CAST(length(text) - length(regexp_replace(text, '\p{P}', '', 'g')) AS DOUBLE)
      |      / CAST(length(text) AS DOUBLE) * 4.0, 1.0))
      |  ) / 4.0, 6) AS quality FROM documents),
      |w AS (
      |  SELECT doc_id, text, quality,
      |         MIN(doc_id) OVER (PARTITION BY md5(lower(text))) AS winner
      |  FROM q WHERE quality >= 0.5)
      |SELECT doc_id, quality, len(string_split(text, ' ')) AS n_tokens
      |FROM w WHERE doc_id = winner
      |ORDER BY doc_id ASC""".stripMargin

  // --- multimodal plumbing -------------------------------------------------

  def multimodalMeta(s: SparkSession, dir: String): DataFrame =
    Multimodal.withFakeMedia(t(s, dir, "documents"))
      .select(col("doc_id"), col("mime"),
        col("meta.n_bytes").as("n_bytes"),
        col("meta.content_hash").as("content_hash"))
      .orderBy(col("doc_id").asc)

  val multimodalMetaSql: String =
    """SELECT doc_id,
      |       CASE CAST(doc_id % 3 AS INT)
      |         WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
      |         ELSE 'video/mp4' END AS mime,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |       md5(text) AS content_hash
      |FROM documents ORDER BY doc_id ASC""".stripMargin

  /** Partition-wise media feature extraction (stubbed decode) — plumbing
    * demonstrated end-to-end; spec-tested.
    */
  def multimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Multimodal.withFakeMedia(t(s, dir, "documents"))
      .select(col("doc_id"), col("mime"), col("media"))
      .as[Multimodal.MediaRow]
    Multimodal.extractFeatures(media).toDF().orderBy(col("doc_id").asc)
  }

  /** Video frame-sampling fan-out — generator plumbing, spec-tested. */
  def multimodalFrames(s: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(
      Multimodal.withFakeMedia(t(s, dir, "documents")), framesPerDoc = 4)
      .select(col("doc_id"), col("frame_idx"), length(col("frame_bytes")).as("n"))
      .orderBy(col("doc_id").asc, col("frame_idx").asc)

  val all: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "multimodal_frames" -> (multimodalFrames _, None),
    "text_token_count" -> (textTokenCount _, Some(textTokenCountSql)),
    "text_quality" -> (textQuality _, Some(textQualitySql)),
    "text_fingerprint" -> (textFingerprint _, Some(textFingerprintSql)),
    "text_lang_id" -> (textLangId _, None),
    "search_docs" -> (searchDocs _, Some(searchDocsSql)),
    "dedup_exact" -> (dedupExact _, Some(dedupExactSql)),
    "dedup_survivor" -> (dedupSurvivor _, Some(dedupSurvivorSql)),
    "dedup_minhash" -> (dedupMinhash _, None),
    "dedup_simhash" -> (dedupSimhash _, None),
    "dedup_jaccard_pairs" -> (dedupJaccardPairs _, Some(dedupJaccardPairsSql)),
    "dedup_embedding_pairs" -> (dedupEmbeddingPairs _, Some(dedupEmbeddingPairsSql)),
    "vector_knn_brute" -> (vectorKnnBrute _, Some(vectorKnnBruteSql)),
    "vector_knn_lsh" -> (vectorKnnLsh _, None),
    "rrf_fusion" -> (rrfFusion _, Some(rrfFusionSql)),
    "stream_tumbling" -> (streamTumbling _, Some(streamTumblingSql)),
    "stream_sliding" -> (streamSliding _, Some(streamSlidingSql)),
    "stream_sessionize" -> (streamSessionize _, Some(streamSessionizeSql)),
    "text_quality_score" -> (textQualityScore _, Some(textQualityScoreSql)),
    "pipeline_curate" -> (pipelineCurate _, Some(pipelineCurateSql)),
    "multimodal_meta" -> (multimodalMeta _, Some(multimodalMetaSql)),
    "multimodal_features" -> (multimodalFeatures _, None))
}
