package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.TextFunctions
import graft.operators.{Decontaminate, Dedup, Sampling}

/** Training-data curation operators beyond the reference's own inventory
  * (prompt: "the operations a large-scale training-data pipeline would
  * need"): duplicate-cluster assignment (connected components over the
  * near-dup graph), deterministic stratified sampling, dataset mixture
  * weighting, PII redaction, repetition signals, and sequence packing.
  *
  * All deterministic, all fully oracled — sampling draws hash a stable id
  * through md5 (reproducible in any engine), cluster labels are min-ids,
  * packing follows a pinned (shard, doc_id) order.
  */
object PipelineQueries {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Cluster labels (doc_id → cluster_id) as a materialized snapshot
    * artifact: built once per corpus from the verified pair table (itself
    * memoized), shared by the cluster report and survivor selection —
    * a production dedup pass labels once and both consumers follow.
    */
  private def clusterLabels(s: SparkSession, dir: String): DataFrame =
    memoizedIndex(s, dir, "neardup_clusters_0.5_b32_bounded") {
      val lab = Dedup.duplicateClusters(
        DocQueries.nearDupPairs05(s, dir).select(col("id_a"), col("id_b")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      lab.count()
      lab
    }

  /** Near-dup CLUSTERS, not pairs: LSH candidate pairs ≥ 0.5 Jaccard →
    * connected components → one row per cluster. The oracle recomputes
    * the same edge set exactly (O(n²) Jaccard) and takes its transitive
    * closure with a recursive CTE. Banding is 32 bands × 2 rows so pair
    * recall at the 0.5 threshold is 1-(1-0.5²)³² ≈ 0.9999 (16×4 would be
    * ~0.64 — passing would be data luck); LSH is still probabilistic, so
    * the exact-edge oracle certifies recall on THIS corpus, not
    * universally. The extra false candidates the wider banding admits are
    * discarded by the exact-Jaccard re-rank inside nearDuplicates.
    */
  def dedupClusters(s: SparkSession, dir: String): DataFrame = {
    // probes the materialized label artifact ([[clusterLabels]], built
    // from DocQueries.nearDupPairs05) — clustering consumes the same
    // verified pair table the pair report emits, it does not re-run LSH
    orderedAtTail(
      clusterLabels(s, dir)
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("cluster_size"),
          array_join(array_sort(collect_list(col("doc_id"))), ",")
            .as("member_ids")),
      col("cluster_id").asc)
  }

  /** The exact near-dup transitive-closure construction as a DuckDB CTE
    * chain ending in `lab(doc_id, cluster_id)` — shared by the clusters
    * query and the cluster-survivor query so the oracles cannot drift.
    */
  // over DocQueries.boundedDocs' deterministic draw (the `docs` CTE):
  // the O(n²) edge recomputation is what made this oracle sf0.1's skip
  // list; mod=1 at ≤500 docs keeps sf0.001/sf0.01 bit-identical
  private val clusterLabelCte: String =
    s"""WITH RECURSIVE ${DocQueries.boundedDocsCte},
      |tok AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text),
      |           '[^\\p{L}\\p{N}]+'), t -> len(t) > 0) AS toks
      |  FROM docs),
      |sh AS (
      |  SELECT doc_id,
      |         list_distinct(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
      |              ELSE list_transform(range(len(toks) - 2),
      |                     i -> array_to_string(toks[i+1:i+3], ' ')) END) AS s
      |  FROM tok WHERE len(toks) > 0),
      |e AS (
      |  SELECT a.doc_id AS ea, b.doc_id AS eb
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
      |        CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE) >= 0.5),
      |edges AS (SELECT ea AS u, eb AS v FROM e UNION ALL SELECT eb, ea FROM e),
      |reach AS (
      |  SELECT u AS id, u AS r FROM edges
      |  UNION
      |  SELECT reach.id, edges.v FROM reach JOIN edges ON reach.r = edges.u),
      |lab AS (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id)""".stripMargin

  val dedupClustersSql: String =
    s"""$clusterLabelCte
      |SELECT cluster_id, COUNT(*) AS cluster_size,
      |       array_to_string(list(doc_id ORDER BY doc_id), ',') AS member_ids
      |FROM lab GROUP BY cluster_id ORDER BY cluster_id ASC""".stripMargin

  /** Survivor per near-dup cluster: the doc with the highest quality
    * score (ties to the lowest id) represents its cluster; everything
    * else is the drop set — the step that turns cluster labels into an
    * actual deduped corpus. One window over the cluster members only
    * (docs outside any cluster are untouched by construction).
    */
  def dedupClusterSurvivor(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    // join FIRST, score after: quality is only needed for cluster
    // members, so the regex-heavy score runs over the (small) labeled
    // set, not the corpus
    val labeled = clusterLabels(s, dir)
      .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
      .withColumn("__q", TextFunctions.qualityScore(col("text")))
      .drop("text")
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("__q").desc, col("doc_id").asc)
    orderedAtTail(
      labeled.withColumn("__rn", row_number().over(w))
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("cluster_size"),
          min(when(col("__rn") === 1, col("doc_id"))).as("survivor_id"),
          max(when(col("__rn") === 1, col("__q"))).as("survivor_quality"),
          array_join(array_sort(collect_list(
            when(col("__rn") > 1, col("doc_id")))), ",").as("dropped_ids")),
      col("cluster_id").asc)
  }

  private val qualityScoreSql: String = duckQualityScore

  val dedupClusterSurvivorSql: String =
    s"""$clusterLabelCte,
      |q AS (
      |  SELECT lab.doc_id, lab.cluster_id, $qualityScoreSql AS qs
      |  FROM lab JOIN documents d ON lab.doc_id = d.doc_id),
      |r AS (
      |  SELECT doc_id, cluster_id, qs,
      |         ROW_NUMBER() OVER (PARTITION BY cluster_id
      |                            ORDER BY qs DESC, doc_id ASC) AS rn
      |  FROM q)
      |SELECT cluster_id, COUNT(*) AS cluster_size,
      |       MIN(CASE WHEN rn = 1 THEN doc_id END) AS survivor_id,
      |       MAX(CASE WHEN rn = 1 THEN qs END) AS survivor_quality,
      |       array_to_string(list(CASE WHEN rn > 1 THEN doc_id END ORDER BY doc_id), ',')
      |         AS dropped_ids
      |FROM r GROUP BY cluster_id ORDER BY cluster_id ASC""".stripMargin

  /** Quality-quartile distribution: exact interpolated quartile
    * thresholds over the corpus score (one tiny agg, broadcast back),
    * then a bucketed rollup — the "where does the quality mass sit"
    * report that gates curation cuts. At web scale the exact percentile
    * (which buffers values per group) swaps for percentile_approx; the
    * `agg_quantiles` gate measures that sketch within 1% of exact on
    * this data.
    */
  def qualityQuartiles(s: SparkSession, dir: String): DataFrame = {
    // ONE corpus scan: fold the regex-heavy score into a (score, freq)
    // histogram first — scores round to 6 dp so the histogram is bounded
    // (≤1e6 rows) no matter the corpus size. Exact interpolated quartiles
    // come off the histogram via percentile's frequency form (identical
    // to raw-value percentile), and the bucket rollup reweights the same
    // tiny histogram instead of re-walking the corpus.
    val hist = t(s, dir, "documents")
      .select(TextFunctions.qualityScore(col("text")).as("score"))
      .groupBy(col("score")).agg(count(lit(1)).as("freq"))
    val th = hist.agg(
      percentile(col("score"), lit(0.25), col("freq")).as("t1"),
      percentile(col("score"), lit(0.5), col("freq")).as("t2"),
      percentile(col("score"), lit(0.75), col("freq")).as("t3"))
    orderedAtTail(
      hist.crossJoin(broadcast(th))
        .groupBy(when(col("score") < col("t1"), 0L)
          .when(col("score") < col("t2"), 1L)
          .when(col("score") < col("t3"), 2L)
          .otherwise(3L).as("bucket"))
        .agg(sum(col("freq")).as("n_docs"),
          min(col("score")).as("min_score"),
          max(col("score")).as("max_score")),
      col("bucket").asc)
  }

  val qualityQuartilesSql: String =
    s"""WITH s AS (SELECT doc_id, $qualityScoreSql AS score FROM documents),
      |t AS (SELECT quantile_cont(score, 0.25) AS t1,
      |             quantile_cont(score, 0.5) AS t2,
      |             quantile_cont(score, 0.75) AS t3 FROM s)
      |SELECT CAST(CASE WHEN score < t1 THEN 0 WHEN score < t2 THEN 1
      |            WHEN score < t3 THEN 2 ELSE 3 END AS BIGINT) AS bucket,
      |       COUNT(*) AS n_docs, MIN(score) AS min_score, MAX(score) AS max_score
      |FROM s, t GROUP BY 1 ORDER BY bucket ASC""".stripMargin

  /** Deterministic stratified sample: per-lang keep rates over the same
    * md5 id-draw on both engines — selects the identical subset anywhere.
    */
  def sampleStratified(s: SparkSession, dir: String): DataFrame =
    bucketOrdered(
      Sampling.stratifiedSample(t(s, dir, "documents"), col("doc_id"),
        col("lang"), Map("en" -> 0.5, "de" -> 0.25), defaultRate = 0.1)
        .select(col("doc_id"), col("lang"),
          Sampling.hashBucket(col("doc_id")).as("bucket")),
      col("doc_id"))

  val sampleStratifiedSql: String =
    s"""SELECT doc_id, lang,
      |  CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 AS bucket
      |FROM documents
      |WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000
      |      < CASE lang WHEN 'en' THEN 500 WHEN 'de' THEN 250 ELSE 100 END
      |ORDER BY ${duckBucket("doc_id")}, doc_id ASC""".stripMargin

  /** Quality-weighted (soft) sampling: keep probability = the doc's own
    * heuristic quality score, clamped to [0.1, 0.9] — the importance-
    * sampling pass between "keep everything" and a hard threshold. Same
    * md5 draw as every other sampler, so the survivor set is stable
    * across engines and re-runs. The oracle replays score, clamp, and
    * draw; the 6-dp score round pins the textual boundary and both
    * engines round the identical double, so the kept sets match exactly.
    */
  def sampleQualityWeighted(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), TextFunctions.qualityScore(col("text")).as("quality"))
    bucketOrdered(
      Sampling.qualityWeightedSample(docs, col("doc_id"), col("quality")),
      col("doc_id"))
  }

  // quality formula composed from the ONE shared definition — an inline
  // copy here drifted-by-construction from qualityScoreSql's next change
  val sampleQualityWeightedSql: String =
    s"""WITH q AS (
      |  SELECT doc_id, $qualityScoreSql AS quality
      |  FROM documents)
      |SELECT doc_id, quality FROM q
      |WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000
      |      < round(least(0.9, greatest(0.1, quality)) * 1000)
      |ORDER BY ${duckBucket("doc_id")}, doc_id ASC""".stripMargin

  /** DSIR importance resampling ([[Sampling.importanceScores]]): the
    * English slice stands in for the target distribution; every doc gets
    * the mean unigram likelihood-ratio score p_en(tok)/p_corpus(tok),
    * and the resample keeps it with probability clamp(importance) over
    * the same stable md5 draw as every other sampler — so target-like
    * docs (in any language) survive at up to 9× the rate of
    * target-alien ones, deterministically. The oracle replays the whole
    * pipeline: both unigram LMs, the exact-long-product ratios, the
    * position-sorted mean fold, and the draw.
    */
  def sampleImportance(s: SparkSession, dir: String): DataFrame = {
    val tok = t(s, dir, "documents").select(col("doc_id"),
      (col("lang") === "en").as("is_target"),
      posexplode(TextFunctions.wsTokens(col("text"))).as(Seq("pos", "tok")))
    // the likelihood-ratio table is the trained MODEL artifact (the DSIR
    // importance estimator) — memoized per corpus snapshot like the
    // bigram LM; scoring probes it, it does not re-train per query
    val ratio = memoizedIndex(s, dir, "dsir_ratio") {
      val r = Sampling.importanceRatios(tok)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      r.count()
      r
    }
    orderedAtTailExchanged(
      Sampling.qualityWeightedSample(
        Sampling.scoreWithRatios(tok, ratio), col("doc_id"),
        col("importance")),
      col("doc_id").asc)
  }

  val sampleImportanceSql: String =
    """WITH tk AS (
      |  SELECT doc_id, lang = 'en' AS is_target,
      |         string_split(text, ' ') AS toks
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, is_target,
      |         unnest(range(len(toks))) AS pos,
      |         unnest(toks) AS tok
      |  FROM tk),
      |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_r,
      |               CAST(SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS n_t
      |        FROM g),
      |c AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c_r,
      |             CAST(SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS c_t
      |      FROM g GROUP BY tok),
      |r AS (SELECT tok, CAST(c_t * n_r AS DOUBLE) / CAST(c_r * n_t AS DOUBLE) AS ratio
      |      FROM c, tot),
      |p AS (SELECT g.doc_id, g.pos, r.ratio FROM g JOIN r USING (tok)),
      |d AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
      |         list_reduce(list(ratio ORDER BY pos), (a, x) -> a + x) / COUNT(*)
      |           AS importance
      |  FROM p GROUP BY doc_id)
      |SELECT doc_id, n_tokens, importance FROM d
      |WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000
      |      < round(least(0.9, greatest(0.1, importance)) * 1000)
      |ORDER BY doc_id ASC""".stripMargin

  /** Dataset mixture weighting: per-lang token share vs a uniform target,
    * emitting the sampling weight a mixing job applies per stratum.
    */
  def mixWeights(s: SparkSession, dir: String): DataFrame =
    orderedAtTail(
      Sampling.mixtureWeights(t(s, dir, "documents"), col("lang"),
        TextFunctions.tokenCount(col("text"))),
      col("stratum").asc)

  val mixWeightsSql: String =
    """WITH a AS (
      |  SELECT lang AS stratum, COUNT(*) AS n_docs,
      |         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY lang)
      |SELECT stratum, n_docs, n_tokens,
      |  round(CAST(n_tokens AS DOUBLE) / CAST(SUM(n_tokens) OVER () AS DOUBLE), 6) AS token_share,
      |  round((CAST(SUM(n_tokens) OVER () AS DOUBLE) / CAST(COUNT(*) OVER () AS DOUBLE))
      |        / CAST(n_tokens AS DOUBLE), 6) AS weight
      |FROM a ORDER BY stratum ASC""".stripMargin

  /** PII redaction. The corpus text carries no PII, so both sides derive
    * the same deterministic PII-bearing text from (text, doc_id) — the
    * withFakeMedia pattern — then the query counts and redacts emails and
    * IPv4s; the md5 fingerprint pins the redacted output byte-for-byte.
    */
  def textPiiRedact(s: SparkSession, dir: String): DataFrame = {
    val pii = concat(col("text"), lit(" contact user"),
      col("doc_id").cast("string"), lit("@example.com or 10.0."),
      (col("doc_id") % 256).cast("string"), lit(".7"))
    // redact ONCE in a single alternation scan (redactPiiFast — the
    // regex passes are the whole cost of this query), then read the
    // counts off the redacted text as literal marker occurrences —
    // piiCounts' regexp_count formulation would traverse the text three
    // more times for the same integers (the corpus embeds no literal
    // '<EMAIL>'/'<IP>'; see piiMarkerCounts)
    val redacted = TextFunctions.redactPiiFast(pii)
    val (nEmails, nIps) = TextFunctions.piiMarkerCounts(col("__red"))
    bucketOrdered(
      t(s, dir, "documents")
        .select(col("doc_id"), redacted.as("__red"))
        .select(col("doc_id"),
          nEmails.cast("long").as("n_emails"),
          nIps.cast("long").as("n_ips"),
          md5(col("__red")).as("redacted_fp")),
      col("doc_id"))
  }

  val textPiiRedactSql: String =
    raw"""WITH p AS (
      |  SELECT doc_id,
      |         text || ' contact user' || CAST(doc_id AS VARCHAR)
      |           || '@example.com or 10.0.' || CAST(doc_id % 256 AS VARCHAR)
      |           || '.7' AS pii
      |  FROM documents),
      |r AS (
      |  SELECT doc_id,
      |         regexp_replace(regexp_replace(regexp_replace(pii,
      |           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |           '(^|[^0-9.])((?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])(?:\.(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3})([^0-9.]|$$)', '\1<IP>\3', 'g'),
      |           '(^|[^0-9.])((?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])(?:\.(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3})([^0-9.]|$$)', '\1<IP>\3', 'g') AS red
      |  FROM p)
      |SELECT doc_id,
      |  CAST((length(red) - length(replace(red, '<EMAIL>', ''))) / 7 AS BIGINT) AS n_emails,
      |  CAST((length(red) - length(replace(red, '<IP>', ''))) / 4 AS BIGINT) AS n_ips,
      |  md5(red) AS redacted_fp
      |FROM r ORDER BY ${duckBucket("doc_id")}, doc_id ASC""".stripMargin

  /** Gopher-style repetition signals: duplicate-word and duplicate-bigram
    * fractions — the boilerplate/spam gate of a curation pipeline.
    */
  def textRepetition(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), TextFunctions.wsTokens(col("text")).as("__toks"))
    bucketOrdered(
      docs.select(col("doc_id"),
        TextFunctions.dupWordFraction(col("__toks")).as("dup_word_frac"),
        TextFunctions.dupBigramFraction(col("__toks")).as("dup_bigram_frac")),
      col("doc_id"))
  }

  val textRepetitionSql: String =
    s"""WITH tks AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |b AS (SELECT doc_id, toks,
      |        list_transform(range(len(toks) - 1),
      |          i -> toks[i+1] || ' ' || toks[i+2]) AS big
      |      FROM tks)
      |SELECT doc_id,
      |  round(1.0 - CAST(len(list_distinct(toks)) AS DOUBLE)
      |            / CAST(len(toks) AS DOUBLE), 6) AS dup_word_frac,
      |  CASE WHEN len(big) < 1 THEN 0.0
      |       ELSE round(1.0 - CAST(len(list_distinct(big)) AS DOUBLE)
      |                      / CAST(len(big) AS DOUBLE), 6) END AS dup_bigram_frac
      |FROM b ORDER BY ${duckBucket("doc_id")}, doc_id ASC""".stripMargin

  /** Corpus-level boilerplate detection (the C4 "deduplicate at span
    * level" rule re-expressed for unsegmented text): a trigram occurring
    * in ≥ 1% of documents is boilerplate (navigation chrome, license
    * headers, templated spans); per flagged doc report the occurrence
    * count and the fraction of token POSITIONS covered by at least one
    * boilerplate trigram — the interval-union coverage a stripping pass
    * would remove.
    *
    * Scale shape: pass 1 is one explode+distinct+agg over (doc, trigram)
    * — the DF table a single shuffle builds. The flagged set is
    * broadcast-safe BY CONSTRUCTION at any corpus size: at DF ≥ p·N its
    * cardinality is ≤ total_positions/(p·N) = avg_doc_len/p, independent
    * of N (100 rows/doc at p=0.01). Pass 2 joins occurrences against the
    * broadcast set and aggregates per doc; coverage is array arithmetic
    * on the collected (bounded, ≤ doc length) position list. The corpus
    * is never shuffled — only its matched positions are.
    */
  def boilerplateNgrams(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(t(s, dir, "documents"))
      .select(col("doc_id"), TextFunctions.wsTokens(col("text")).as("toks"))
    val tris = docs.select(col("doc_id"), size(col("toks")).as("n_toks"),
      posexplode(TextFunctions.trigrams(col("toks"))).as(Seq("pos", "tg")))
    // the flagged lexicon is a snapshot-level artifact (like the bigram
    // LM): built once per corpus, reused by every coverage/stripping
    // pass — and bounded (≤ avg_doc_len/threshold rows), so persisting
    // it is cheap at any corpus size
    val boiler = memoizedIndex(s, dir, "boilerplate_trigrams_1pct") {
      val nDocs = docs.select(count(lit(1)).as("__nd"))
      val b = tris.select(col("doc_id"), col("tg")).distinct()
        .groupBy(col("tg")).agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(nDocs))
        .filter(col("df") >= ceil(col("__nd") * lit(0.01)))
        .select(col("tg"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      b.count()
      b
    }
    orderedAtTail(
      tris.join(broadcast(boiler), "tg")
        .groupBy(col("doc_id"))
        .agg(max(col("n_toks")).as("n_toks"),
          count(lit(1)).as("n_occ"),
          size(array_distinct(flatten(collect_list(
            array(col("pos"), col("pos") + 1, col("pos") + 2)))))
            .cast("long").as("covered"))
        .withColumn("boiler_frac",
          round(col("covered").cast("double") / col("n_toks"), 6))
        .select(col("doc_id"), col("n_occ"), col("covered"),
          col("boiler_frac")),
      col("doc_id").asc)
  }

  val boilerplateNgramsSql: String =
    """WITH tks AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |tg AS (
      |  SELECT doc_id, len(toks) AS n_toks,
      |    list_transform(range(len(toks) - 2),
      |      i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]) AS tgs
      |  FROM tks),
      |occ AS (
      |  SELECT doc_id, n_toks, generate_subscripts(tgs, 1) - 1 AS pos,
      |         unnest(tgs) AS t
      |  FROM tg),
      |boiler AS (
      |  SELECT t FROM (SELECT t, COUNT(DISTINCT doc_id) AS df FROM occ GROUP BY t)
      |  WHERE df >= ceil((SELECT COUNT(*) FROM tks) * 0.01)),
      |hit AS (SELECT o.* FROM occ o JOIN boiler b ON o.t = b.t),
      |agg AS (
      |  SELECT doc_id, MAX(n_toks) AS n_toks, COUNT(*) AS n_occ,
      |    CAST(len(list_distinct(flatten(
      |      list(ARRAY[pos, pos + 1, pos + 2])))) AS BIGINT) AS covered
      |  FROM hit GROUP BY doc_id)
      |SELECT doc_id, n_occ, covered,
      |       round(CAST(covered AS DOUBLE) / n_toks, 6) AS boiler_frac
      |FROM agg ORDER BY doc_id ASC""".stripMargin

  /** Sequence packing: per-source shards, docs in id order accumulate
    * into ~512-token chunks; one row per chunk with doc/token accounting.
    * Windows partition by shard — no global order, packs in parallel.
    */
  def packChunks(s: SparkSession, dir: String): DataFrame =
    orderedAtTail(
      Sampling.packChunks(t(s, dir, "documents"), col("source"),
        col("doc_id"), TextFunctions.tokenCount(col("text")),
        targetTokens = 512)
        .withColumnRenamed("part", "source"),
      col("source").asc, col("chunk_id").asc)

  val packChunksSql: String =
    """WITH n AS (
      |  SELECT source, doc_id,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
      |  FROM documents),
      |c AS (
      |  SELECT source, doc_id, nt,
      |         COALESCE(SUM(nt) OVER (PARTITION BY source ORDER BY doc_id ASC
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
      |  FROM n),
      |g AS (
      |  SELECT source, CAST(floor(cb / 512.0) AS BIGINT) AS raw_chunk,
      |         COUNT(*) AS n_docs, CAST(SUM(nt) AS BIGINT) AS chunk_tokens,
      |         MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      |  FROM c GROUP BY 1, 2)
      |SELECT source,
      |       CAST(dense_rank() OVER (PARTITION BY source ORDER BY raw_chunk ASC)
      |            - 1 AS BIGINT) AS chunk_id,
      |       n_docs, chunk_tokens, first_doc, last_doc
      |FROM g ORDER BY source ASC, chunk_id ASC""".stripMargin

  /** Overlapping sliding-window chunking (RAG / context-window prep):
    * each doc yields ⌈(n−size)/stride⌉+1 chunks of ≤ `size` tokens at
    * `stride` offsets, so consecutive chunks overlap by size−stride
    * tokens. Pure per-row arithmetic + explode — no shuffle at all until
    * the result-edge sort; chunk rows stay on the partition that read
    * the doc.
    */
  def chunkSliding(s: SparkSession, dir: String): DataFrame = {
    val size = 32L
    val stride = 16L
    orderedAtTail(
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long").as("__n"))
        .withColumn("__k",
          when(col("__n") <= size, lit(1L))
            .otherwise(((col("__n") - size + stride - 1) / stride)
              .cast("long") + 1))
        .select(col("doc_id"), col("__n"),
          explode(sequence(lit(0L), col("__k") - 1)).as("chunk_idx"))
        .select(col("doc_id"), col("chunk_idx"),
          (col("chunk_idx") * stride).as("start_tok"),
          least(lit(size), col("__n") - col("chunk_idx") * stride)
            .as("chunk_len")),
      col("doc_id").asc, col("chunk_idx").asc)
  }

  val chunkSlidingSql: String =
    """WITH n AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
      |  FROM documents),
      |k AS (
      |  SELECT doc_id, nt,
      |         CASE WHEN nt <= 32 THEN 1
      |              ELSE CAST((nt - 32 + 15) // 16 AS BIGINT) + 1 END AS nk
      |  FROM n)
      |SELECT doc_id, CAST(unnest(range(nk)) AS BIGINT) AS chunk_idx,
      |       CAST(unnest(range(nk)) * 16 AS BIGINT) AS start_tok,
      |       CAST(least(32, nt - unnest(range(nk)) * 16) AS BIGINT) AS chunk_len
      |FROM k ORDER BY doc_id ASC, chunk_idx ASC""".stripMargin

  /** Temperature sampling weights at α=0.5 over per-lang token mass —
    * sqrt on both engines (IEEE-exact), denominator folded in stratum
    * order on both engines (see [[Sampling.temperatureWeights]]).
    */
  def mixTemperature(s: SparkSession, dir: String): DataFrame =
    orderedAtTail(
      Sampling.temperatureWeights(t(s, dir, "documents"), col("lang"),
        TextFunctions.tokenCount(col("text")), alpha = 0.5),
      col("stratum").asc)

  val mixTemperatureSql: String =
    """WITH a AS (
      |  SELECT lang AS stratum, COUNT(*) AS n_docs,
      |         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY lang),
      |s AS (
      |  SELECT stratum, n_docs, n_tokens,
      |         CAST(n_tokens AS DOUBLE) / CAST(SUM(n_tokens) OVER () AS DOUBLE) AS share
      |  FROM a),
      |p AS (SELECT stratum, n_docs, n_tokens, share, sqrt(share) AS pp FROM s),
      |d AS (SELECT list_aggregate(list(pp ORDER BY stratum), 'sum') AS denom FROM p)
      |SELECT stratum, n_docs, n_tokens, round(share, 6) AS token_share,
      |       round(pp / denom, 6) AS sample_prob,
      |       round(pp / denom / share, 6) AS weight
      |FROM p, d ORDER BY stratum ASC""".stripMargin

  /** Deterministic train/valid/test split: 90/5/5 over the md5 id-draw,
    * reported as per-(lang, split) doc and token counts. The same doc
    * lands in the same split on any engine — the oracle recomputes the
    * assignment from the recipe, not from a row sample.
    */
  def sampleSplit(s: SparkSession, dir: String): DataFrame =
    orderedAtTail(
      t(s, dir, "documents")
        .groupBy(col("lang"),
          Sampling.splitAssign(col("doc_id"),
            Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05)).as("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextFunctions.tokenCount(col("text")).cast("long"))
            .as("n_tokens")),
      col("lang").asc, col("split").asc)

  val sampleSplitSql: String =
    """WITH a AS (
      |  SELECT lang,
      |         CASE WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 < 900 THEN 'train'
      |              WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 < 950 THEN 'valid'
      |              ELSE 'test' END AS split,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
      |  FROM documents)
      |SELECT lang, split, COUNT(*) AS n_docs, CAST(SUM(nt) AS BIGINT) AS n_tokens
      |FROM a GROUP BY lang, split ORDER BY lang ASC, split ASC""".stripMargin

  /** Leakage-safe split: the train/valid/test draw hashes the
    * DUPLICATE-GROUP key (exact-dup content hash here; any cluster label
    * works the same way) instead of the doc id, so every member of a
    * duplicate group lands in the SAME split — with an id-hash draw,
    * near-identical docs straddle train and the eval holdout and leak.
    * Same stateless splitAssign expression, different key; group
    * co-assignment is structural (one hash → one split). Output is the
    * per-split doc/group/dup-doc census; the invariant that no group
    * spans two splits is what makes n_groups sum to the corpus-wide
    * distinct-group count across splits (a property the oracle's
    * identical grouping would break if co-assignment ever broke).
    */
  def splitLeakageSafe(s: SparkSession, dir: String): DataFrame =
    orderedAtTail(
      t(s, dir, "documents")
        .withColumn("grp", md5(col("text")))
        .withColumn("split", Sampling.splitAssign(col("grp"),
          Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05)))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("grp")).as("n_groups")),
      col("split").asc)

  val splitLeakageSafeSql: String =
    """WITH a AS (
      |  SELECT md5(text) AS grp,
      |         CASE WHEN CAST(concat('0x', substr(md5(md5(text)), 1, 15)) AS BIGINT) % 1000 < 900 THEN 'train'
      |              WHEN CAST(concat('0x', substr(md5(md5(text)), 1, 15)) AS BIGINT) % 1000 < 950 THEN 'valid'
      |              ELSE 'test' END AS split
      |  FROM documents)
      |SELECT split, COUNT(*) AS n_docs, COUNT(DISTINCT grp) AS n_groups
      |FROM a GROUP BY split ORDER BY split ASC""".stripMargin

  /** Deterministic global shuffle: dense position in md5(id) order with
    * no global window (bucket ranks + broadcast cumulative offsets — see
    * [[Sampling.shufflePositions]]). The oracle IS the global window the
    * implementation avoids, so the gate proves the two are identical.
    */
  def sampleShuffle(s: SparkSession, dir: String): DataFrame =
    bucketOrdered(
      Sampling.shufflePositions(t(s, dir, "documents"), col("doc_id")),
      col("doc_id"))

  val sampleShuffleSql: String =
    s"""SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS shuffle_key,
      |       CAST(row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC)
      |            - 1 AS BIGINT) AS shuffle_pos
      |FROM documents ORDER BY ${duckBucket("doc_id")}, doc_id ASC""".stripMargin

  /** Fixed-SIZE per-stratum subsample (vs [[sampleStratified]]'s fixed
    * RATE): the k lexicographically-smallest md5 draws per lang — a
    * deterministic reservoir. The window partitions by stratum, so
    * ranking parallelizes across strata and no global order exists;
    * per-partition TOP-K pushdown (WindowGroupLimit) keeps the state
    * bounded at scale.
    */
  def sampleGroupTopk(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")).asc, col("doc_id").asc)
    orderedAtTail(
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"))
        .withColumn("draw_rank", row_number().over(w).cast("long"))
        .filter(col("draw_rank") <= 25),
      col("lang").asc, col("draw_rank").asc)
  }

  val sampleGroupTopkSql: String =
    """SELECT doc_id, lang,
      |       CAST(row_number() OVER (PARTITION BY lang
      |         ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS BIGINT)
      |         AS draw_rank
      |FROM documents
      |QUALIFY draw_rank <= 25
      |ORDER BY lang ASC, draw_rank ASC""".stripMargin

  /** URL-level dedup: canonicalize scheme/www/tracking-param variants,
    * group by canonical URL, report multi-doc groups. The corpus carries
    * no URLs, so both engines derive the same synthetic URL from
    * (source, doc_id) — the withFakeMedia pattern — with deliberate case,
    * scheme, and utm_* noise for the canonicalizer to strip.
    */
  def urlDedup(s: SparkSession, dir: String): DataFrame = {
    val url = concat(lit("HTTPS://www.Example.com/Docs/"),
      (col("doc_id") % 40).cast("string"),
      lit("/?utm_source="), col("source"), lit("&utm_campaign=sync"))
    orderedAtTail(
      t(s, dir, "documents")
        .groupBy(TextFunctions.canonicalizeUrl(url).as("canonical_url"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("first_doc"),
          array_join(array_sort(collect_list(col("doc_id"))), ",")
            .as("member_ids"))
        .filter(col("n_docs") > 1),
      col("canonical_url").asc)
  }

  val urlDedupSql: String =
    """WITH u AS (
      |  SELECT doc_id,
      |         'HTTPS://www.Example.com/Docs/' || CAST(doc_id % 40 AS VARCHAR)
      |           || '/?utm_source=' || source || '&utm_campaign=sync' AS url
      |  FROM documents),
      |c AS (
      |  SELECT doc_id,
      |         regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      |           lower(url), '^https?://', ''), '^www\.', ''),
      |           '([?&])(utm_[a-z]+=[^&]*&?)+', '\1', 'g'), '[?&]+$', ''), '/+$', '') AS canonical_url
      |  FROM u)
      |SELECT canonical_url, COUNT(*) AS n_docs, MIN(doc_id) AS first_doc,
      |       array_to_string(list(doc_id ORDER BY doc_id), ',') AS member_ids
      |FROM c GROUP BY canonical_url HAVING COUNT(*) > 1
      |ORDER BY canonical_url ASC""".stripMargin

  /** Benchmark decontamination: docs sharing any word 8-gram with the
    * "benchmark" slice (doc_id < 100 — standing in for an eval set; the
    * corpus's dup families make some of the remaining docs verbatim-ish
    * copies of it). Benchmark n-grams broadcast, corpus scanned once,
    * never shuffled — only contamination hits reach the groupBy (see
    * [[graft.operators.Decontaminate]]).
    */
  def textDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val benchGrams = Decontaminate.benchmarkNgrams(
      docs.filter(col("doc_id") < 100), col("text"), n = 8)
    orderedAtTail(
      Decontaminate.contaminatedDocs(docs.filter(col("doc_id") >= 100),
        col("doc_id"), col("text"), benchGrams, n = 8),
      col("doc_id").asc)
  }

  val textDecontaminateSql: String =
    """WITH tok AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text),
      |           '[^\p{L}\p{N}]+'), t -> len(t) > 0) AS toks
      |  FROM documents),
      |g AS (
      |  SELECT doc_id,
      |         list_distinct(CASE WHEN len(toks) < 8 THEN [array_to_string(toks, ' ')]
      |              ELSE list_transform(range(len(toks) - 7),
      |                     i -> array_to_string(toks[i+1:i+8], ' ')) END) AS grams
      |  FROM tok WHERE len(toks) > 0),
      |bench AS (SELECT DISTINCT unnest(grams) AS ngram FROM g WHERE doc_id < 100),
      |hits AS (SELECT doc_id, unnest(grams) AS ngram FROM g WHERE doc_id >= 100)
      |SELECT h.doc_id, COUNT(*) AS n_matched_ngrams
      |FROM hits h JOIN bench b USING (ngram)
      |GROUP BY h.doc_id ORDER BY doc_id ASC""".stripMargin

  val all: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "dedup_clusters" -> (dedupClusters _, Some(dedupClustersSql)),
    "dedup_cluster_survivor" -> (dedupClusterSurvivor _, Some(dedupClusterSurvivorSql)),
    "quality_quartiles" -> (qualityQuartiles _, Some(qualityQuartilesSql)),
    "text_decontaminate" -> (textDecontaminate _, Some(textDecontaminateSql)),
    "sample_stratified" -> (sampleStratified _, Some(sampleStratifiedSql)),
    "sample_split" -> (sampleSplit _, Some(sampleSplitSql)),
    "split_leakage_safe" -> (splitLeakageSafe _, Some(splitLeakageSafeSql)),
    "sample_shuffle" -> (sampleShuffle _, Some(sampleShuffleSql)),
    "sample_group_topk" -> (sampleGroupTopk _, Some(sampleGroupTopkSql)),
    "sample_quality_weighted" ->
      (sampleQualityWeighted _, Some(sampleQualityWeightedSql)),
    "sample_importance" -> (sampleImportance _, Some(sampleImportanceSql)),
    "url_dedup" -> (urlDedup _, Some(urlDedupSql)),
    "mix_weights" -> (mixWeights _, Some(mixWeightsSql)),
    "mix_temperature" -> (mixTemperature _, Some(mixTemperatureSql)),
    "text_pii_redact" -> (textPiiRedact _, Some(textPiiRedactSql)),
    "text_repetition" -> (textRepetition _, Some(textRepetitionSql)),
    "boilerplate_ngrams" -> (boilerplateNgrams _, Some(boilerplateNgramsSql)),
    "pack_chunks" -> (packChunks _, Some(packChunksSql)),
    "chunk_sliding" -> (chunkSliding _, Some(chunkSlidingSql)))
}
