package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling / mixing / packing operators for training-data curation —
  * the "decide what goes into the run" half of the pipeline, complementing
  * the dedup/quality half ([[Dedup]], [[graft.operators.Curation]]).
  *
  * Everything is DETERMINISTIC by construction: sampling decisions hash the
  * row's stable id (never `rand()`), so a re-run — or a different engine
  * replaying the recipe — selects the identical subset. That property is
  * what makes 100 TB curation auditable, and it is what the DuckDB oracles
  * verify bit-for-bit.
  *
  * Scale notes: hash-threshold sampling is a stateless per-row filter (no
  * shuffle, pushes through scans); mixture weighting aggregates to one row
  * per stratum before any windowing; packing windows are partitioned by the
  * shard column so no global sort exists anywhere.
  */
object Sampling {

  /** Uniform pseudo-random bucket in [0, buckets) from a stable id:
    * first 60 bits of md5(cast(id as string)) mod buckets. md5 (not
    * xxhash64) so any engine can reproduce the draw — the sampling
    * decision is part of the dataset's recipe, not an engine internal.
    */
  def hashBucket(id: Column, buckets: Long = 1000L): Column =
    // Long modulus: stride draws over trillion-row corpora
    // ([[Similarity.strideCentroids]] reuses this — ONE definition of the
    // cross-engine stable draw, so a recipe fix cannot drift between the
    // sampler family and the centroid picks) can exceed Int range
    conv(substring(md5(id.cast("string")), 1, 15), 16, 10)
      .cast("long") % buckets

  /** Deterministic Bernoulli sample: keep iff bucket(id) < rate·buckets. */
  def sampleByHash(df: DataFrame, id: Column, rate: Double,
      buckets: Int = 1000): DataFrame =
    df.filter(hashBucket(id, buckets) < math.round(rate * buckets))

  /** Stratified deterministic sample: per-stratum keep-rates (applied to
    * the same id-hash draw), default rate for unlisted strata. One
    * stateless filter — no shuffle, no per-stratum pass.
    */
  def stratifiedSample(df: DataFrame, id: Column, stratum: Column,
      rates: Map[String, Double], defaultRate: Double,
      buckets: Int = 1000): DataFrame = {
    val threshold = rates.foldLeft(lit(math.round(defaultRate * buckets))) {
      case (acc, (k, r)) =>
        when(stratum === k, lit(math.round(r * buckets))).otherwise(acc)
    }
    df.filter(hashBucket(id, buckets) < threshold)
  }

  /** Quality-weighted deterministic sampling — the SOFT filter of a
    * CCNet/FineWeb-style pipeline (hard thresholds discard the
    * mid-quality mass entirely; weighting by the continuous score keeps
    * it at proportional rates): each row's keep probability is its own
    * quality score clamped to [floor, ceil] (junk keeps a trace for
    * audit, gold is never certain), decided by the same stable md5 draw
    * as [[sampleByHash]] — so the SAME doc survives on every engine and
    * every re-run. Stateless per-row filter: no shuffle at any scale.
    */
  def qualityWeightedSample(df: DataFrame, id: Column, score: Column,
      floor: Double = 0.1, ceil: Double = 0.9,
      buckets: Int = 1000): DataFrame = {
    // NULL score (scorer missed the doc) keeps the floor rate EXPLICITLY
    // via coalesce — Spark's greatest happens to skip nulls, but SQL
    // engines differ on that, and the floor-trace contract ("every row
    // keeps at least a floor-rate audit trace") must not hang on
    // null-skipping trivia
    val p = least(lit(ceil), greatest(lit(floor), coalesce(score, lit(floor))))
    df.filter(hashBucket(id, buckets) < round(p * buckets))
  }

  /** DSIR-style importance scores (Data Selection via Importance
    * Resampling, Xie et al. 2023, arXiv:2302.03169): rank raw-corpus
    * documents by how target-like their token distribution is. Each
    * doc's importance is the mean over its token positions of the
    * unigram likelihood ratio p_target(tok)/p_raw(tok) — the
    * feature-space importance weight the paper resamples by (a mean of
    * ratios instead of the paper's summed log-ratio keeps the arithmetic
    * libm-free: ln() is not IEEE-correctly-rounded and would tie the
    * result to one libm build). Tokens absent from the target slice get
    * ratio 0, dragging the doc's score toward 0 exactly as the −∞ log
    * weight would. Feed the result to [[qualityWeightedSample]] to
    * complete the resample step with the same stable md5 draw as every
    * other sampler here.
    *
    * Determinism by construction: each ratio is ONE correctly-rounded
    * double division of exact long products —
    * (c_target·n_raw)/(c_raw·n_target) — and the per-doc mean folds the
    * POSITION-SORTED ratio array (the [[temperatureWeights]] trick), so
    * no float-addition-order dependence exists on any engine or
    * partitioning. The long products stay below 2⁵³ (double-exact) up to
    * ~10⁸ target × 10⁸ corpus tokens; beyond that, bucket the counts
    * (the paper's hashed-feature variant) before ratioing.
    *
    * `tok` relation: (doc_id, pos, tok, is_target) — one exploded corpus
    * feeding both the |vocab|-row count table (map-side combined: the
    * shuffle is vocab-sized, not corpus-sized) and the scoring join; the
    * ratio table rides back on an AQE broadcast while the vocabulary is
    * small. At web scale, prune to top-K features first — same effect as
    * the paper's feature hashing.
    */
  def importanceScores(tok: DataFrame): DataFrame =
    scoreWithRatios(tok, importanceRatios(tok))

  /** The trained-model half of [[importanceScores]]: the (tok, ratio)
    * likelihood-ratio table — a per-corpus-snapshot artifact (like the
    * bigram LM and the LSH/IVF indexes): build and persist once, score
    * any number of shards/queries against it.
    */
  def importanceRatios(tok: DataFrame): DataFrame = {
    val counts = tok.groupBy(col("tok")).agg(
      count(lit(1)).as("c_r"),
      sum(when(col("is_target"), lit(1L)).otherwise(lit(0L))).as("c_t"))
    // totals fold off the vocab-sized counts table — n_r = Σc_r and
    // n_t = Σc_t exactly (integer sums), so the corpus is exploded and
    // scanned ONCE, not once for counts and again for totals
    val totals = counts.agg(
      sum(col("c_r")).as("n_r"), sum(col("c_t")).as("n_t"))
    // an EMPTY target slice makes every ratio 0/0 — silent NaN scores
    // that would poison the whole resample; fail loudly instead (the
    // check rides the vocab-sized table, one branch per distinct token)
    counts.crossJoin(broadcast(totals))
      .select(col("tok"),
        when(col("n_t") === 0L, raise_error(lit(
          "importanceRatios: target slice is empty — no is_target tokens")))
          .otherwise((col("c_t") * col("n_r")).cast("double") /
            (col("c_r") * col("n_t")).cast("double")).as("ratio"))
  }

  /** The recurring half of [[importanceScores]]: per-doc mean ratio over
    * a (fresh or reopened) ratio table. The broadcast is PINNED to the
    * vocab-sized ratio table: left to AQE, the test-scale stats pick the
    * exploded corpus as the build side — right locally, impossible at
    * 100 TB where the token stream is the corpus × mean doc length.
    *
    * LEFT join + ratio-0 fill: a fresh shard scored against a reopened
    * snapshot table carries tokens the snapshot never saw; an inner join
    * would silently DROP them — inflating a mostly-novel doc's mean
    * (scored only on its known tokens) and erasing an all-novel doc from
    * the output entirely, so the downstream draw never even rejects it.
    * Out-of-vocabulary means "never seen in the target" ⇒ ratio 0, the
    * same semantics target-absent in-vocab tokens get.
    */
  def scoreWithRatios(tok: DataFrame, ratio: DataFrame): DataFrame =
    tok.join(broadcast(ratio), Seq("tok"), "left")
      .withColumn("ratio", coalesce(col("ratio"), lit(0.0)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        (aggregate(
          array_sort(collect_list(struct(col("pos"), col("ratio")))),
          lit(0.0), (acc, x) => acc + x.getField("ratio")) /
          count(lit(1)).cast("double")).as("importance"))

  /** Deterministic train/valid/test assignment: cumulative fraction
    * cut-points over the same id-hash draw as [[sampleByHash]]. Fractions
    * are applied in the given order; anything past the last cut falls in
    * the final split. Stateless per-row expression — no shuffle, and the
    * SAME doc lands in the same split on every engine and every re-run,
    * which is what keeps a 100 TB eval holdout stable across rebuilds.
    */
  def splitAssign(id: Column, splits: Seq[(String, Double)],
      buckets: Int = 1000): Column = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    // cut granularity is 1/buckets: a fraction that rounds to zero buckets
    // would silently produce an EMPTY split — fail loudly instead (raise
    // `buckets` for tiny eval holdouts). The FINAL split's width is what
    // remains after the rounded cuts, so it needs its own check: with
    // Seq(0.9996, 0.0004) at 1000 buckets the init rounds to the full
    // 1000 and the holdout would silently get zero buckets.
    val cuts = splits.scanLeft(0L) { case (acc, (_, f)) =>
      acc + math.round(f * buckets) }.tail
    val widths = cuts.zip(0L +: cuts.init).map { case (hi, lo) => hi - lo }
    val finalWidth = buckets - cuts.init.lastOption.getOrElse(0L)
    require(widths.init.forall(_ >= 1) && finalWidth >= 1,
      s"every split fraction must round to >= 1/$buckets of the bucket space")
    val b = hashBucket(id, buckets)
    splits.init.zip(cuts.init).foldRight(lit(splits.last._1): Column) {
      case (((name, _), cut), acc) => when(b < cut, name).otherwise(acc)
    }
  }

  /** Deterministic global shuffle: every row gets a dense position
    * 0..n-1 in md5(id) order — the "shuffle the corpus once, identically,
    * on any engine" step before sequence packing / epoch slicing.
    *
    * Scale shape: NO global window. Rows are bucketed by the first THREE
    * hex chars of the key (4,096 ways), ranked within their bucket in
    * parallel, and offset by the cumulative counts of the
    * lexicographically smaller buckets — a 4,096-row aggregate that is
    * windowed and broadcast back. Equivalent to row_number() over a
    * global sort, without ever moving the corpus to one partition (the
    * per-bucket rank is the only corpus-wide shuffle, and it is
    * 4,096-way parallel — at 100 TB each bucket sorts corpus/4096 rows,
    * comfortably inside one executor's memory).
    */
  def shufflePositions(df: DataFrame, id: Column): DataFrame = {
    val keyed = df.select(id.as("doc_id"),
      md5(id.cast("string")).as("shuffle_key"))
      .withColumn("__b", substring(col("shuffle_key"), 1, 3))
    val w = Window.partitionBy(col("__b"))
      .orderBy(col("shuffle_key").asc, col("doc_id").asc)
    val ranked = keyed.withColumn("__rn", row_number().over(w))
    // offsets need only bucket COUNTS — build them from the pre-window
    // frame so this branch is a plain scan-agg, not a second rank window
    val offsets = keyed.groupBy(col("__b"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off",
        coalesce(sum(col("__n")).over(Window.orderBy(col("__b").asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__b"), col("__off"))
    ranked.join(broadcast(offsets), "__b")
      .select(col("doc_id"), col("shuffle_key"),
        (col("__off") + col("__rn") - 1).cast("long").as("shuffle_pos"))
  }

  /** Mixture weighting: per-stratum token share vs a uniform target share,
    * emitting the up/down-sampling weight (target/actual) a data-mixing
    * job would apply. Aggregates to |strata| rows FIRST; the total-window
    * then runs over a handful of rows, never the corpus.
    */
  def mixtureWeights(df: DataFrame, stratum: Column,
      tokens: Column): DataFrame = {
    val agg = df.groupBy(stratum.as("stratum"))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokens.cast("long")).as("n_tokens"))
    val all = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    agg
      .withColumn("__total", sum(col("n_tokens")).over(all))
      .withColumn("__k", count(lit(1)).over(all))
      .select(col("stratum"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("__total").cast("double"),
          6).as("token_share"),
        round((col("__total").cast("double") / col("__k").cast("double")) /
          col("n_tokens").cast("double"), 6).as("weight"))
  }

  /** Temperature (α) mixture re-weighting — the multilingual sampling
    * standard (XLM-R style): sampling probability p_i ∝ share_i^α, with
    * α < 1 flattening the mix toward low-resource strata (α=1 keeps the
    * natural distribution; α→0 approaches [[mixtureWeights]]' uniform
    * target). Emits per stratum the natural token share, p_i, and the
    * weight p_i/share_i a mixing job multiplies the natural draw rate by.
    *
    * Like [[mixtureWeights]], aggregates to |strata| rows first, so the
    * windows never see the corpus. Determinism pedantry: the denominator
    * Σ_j share_j^α is a DOUBLE sum, and float addition is not
    * associative — a window SUM would fold in engine-dependent row
    * order. It is instead folded over the stratum-SORTED array
    * (collect → sort → left fold), so any engine that sorts the same
    * produces the bit-identical double. α=0.5 (the common choice) is
    * computed via sqrt, which IEEE 754 requires correctly rounded —
    * pow(x,0.5) is not so guaranteed and may differ across libm
    * implementations.
    */
  def temperatureWeights(df: DataFrame, stratum: Column, tokens: Column,
      alpha: Double): DataFrame = {
    def powA(c: Column): Column =
      if (alpha == 0.5) sqrt(c)
      else if (alpha == 1.0) c
      else pow(c, lit(alpha))
    val agg = df.groupBy(stratum.as("stratum"))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokens.cast("long")).as("n_tokens"))
    val all = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    agg
      .withColumn("__share",
        col("n_tokens").cast("double") / sum(col("n_tokens")).over(all)
          .cast("double"))
      .withColumn("__p", powA(col("__share")))
      .withColumn("__denom",
        aggregate(
          array_sort(collect_list(struct(col("stratum"), col("__p"))).over(all)),
          lit(0.0), (acc, x) => acc + x.getField("__p")))
      .select(col("stratum"), col("n_docs"), col("n_tokens"),
        round(col("__share"), 6).as("token_share"),
        round(col("__p") / col("__denom"), 6).as("sample_prob"),
        round(col("__p") / col("__denom") / col("__share"), 6).as("weight"))
  }

  /** Greedy fixed-budget sequence packing: within each shard (`part`),
    * documents in `order` accumulate into chunks of ~`targetTokens` —
    * a doc joins the chunk its running total falls in (floor(tokens-
    * before-this-doc / target)), so a chunk can OVERSHOOT the budget by
    * up to one document (a doc is never split), and a doc longer than
    * the whole budget spans several raw chunk numbers on its own.
    * Returns one row per (shard, chunk); `chunk_id` is densely
    * renumbered 0,1,2,… per shard (dense_rank over the handful of
    * chunk rows, NOT over the corpus) so downstream consumers can
    * index chunks contiguously despite the gaps oversized docs leave.
    *
    * The window partitions by shard, so packing parallelizes across
    * shards and no global order exists — the 100 TB layout (one shard
    * per input file/source) keeps every partition independent.
    */
  def packChunks(df: DataFrame, part: Column, order: Column,
      tokens: Column, targetTokens: Int): DataFrame = {
    val w = Window.partitionBy(col("__part")).orderBy(col("__ord").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val chunks = df.select(part.as("__part"), order.as("__ord"),
        tokens.cast("long").as("__n"))
      .withColumn("__before", coalesce(sum(col("__n")).over(w), lit(0L)))
      .withColumn("chunk_id",
        floor(col("__before") / lit(targetTokens.toLong)).cast("long"))
      .groupBy(col("__part").as("part"), col("chunk_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__n")).as("chunk_tokens"),
        min(col("__ord")).as("first_doc"),
        max(col("__ord")).as("last_doc"))
    val dense = Window.partitionBy(col("part")).orderBy(col("chunk_id").asc)
    chunks.withColumn("chunk_id",
      (dense_rank().over(dense) - 1).cast("long"))
  }
}
