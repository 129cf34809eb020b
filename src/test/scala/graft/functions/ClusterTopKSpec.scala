package graft.functions

import graft.SparkTestBase
import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{ClusterTopK, DotProduct}

/** [[ClusterTopK]] replaces knnGraph's within-cluster pair JOIN with one
  * compiled scan per (cluster, salt) group. The contract is bit-identity
  * to the legacy formulation — same hoisted-norm pair cosine (index-order
  * double folds, zero-norm → null via the explicit guard, null
  * input/element/length-mismatch → null via dot propagation), same
  * candidate order as the downstream rank window (cosine desc with NaN
  * first and NULLS LAST, neighbor_id asc), same self/null-id exclusion —
  * so the spec replays the OLD join+window pipeline and demands equality
  * down to the cosine bits on a fixture stuffed with every edge class.
  */
class ClusterTopKSpec extends SparkTestBase {
  import spark.implicits._

  /** The r15 pair pipeline knnGraph used before ClusterTopK: self-join on
    * cluster, hoisted-norm cosine, optional shared-list dedup, rank
    * window. Kept here as the executable spec of what the expression
    * must reproduce.
    */
  private def legacyGraph(assigned: DataFrame, k: Int,
      dedup: Boolean): DataFrame = {
    val withNorm = assigned.withColumn("__vn",
      sqrt(DotProduct(col("embedding"), col("embedding"))))
    val a = withNorm.select(col("cluster"), col("vec_id"),
      col("embedding").as("__ea"), col("__vn").as("__na"))
    val b = withNorm.select(col("cluster"), col("vec_id").as("neighbor_id"),
      col("embedding").as("__eb"), col("__vn").as("__nb"))
    val pc = when(col("__na") === 0.0 || col("__nb") === 0.0,
      lit(null).cast("double"))
      .otherwise(DotProduct(col("__ea"), col("__eb")) /
        (col("__na") * col("__nb")))
    val pairs = a.join(b, Seq("cluster"))
      .filter(col("vec_id") =!= col("neighbor_id"))
      .select(col("vec_id"), col("neighbor_id"), pc.as("cosine"))
    val uniq =
      if (dedup) pairs.groupBy(col("vec_id"), col("neighbor_id"))
        .agg(max(col("cosine")).as("cosine"))
      else pairs
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    uniq.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("vec_id"), col("rnk"), col("neighbor_id"), col("cosine"))
  }

  /** (vec_id, rnk, neighbor_id, cosine-bits) — doubleToLongBits so NaN
    * and signed zero compare exactly; null cosine → Long.MinValue.
    */
  private def keyed(df: DataFrame): Set[(Long, Int, Long, Long)] =
    df.collect().map { r =>
      (r.getLong(0), r.getInt(1), r.getLong(2),
        if (r.isNullAt(3)) Long.MinValue
        else java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }.toSet

  /** Fixture with every edge class the pair cosine distinguishes:
    * normal rows, a zero vector (null cosine via the guard), a NULL
    * embedding and a null element (null via dot propagation), a
    * length-mismatched row, a NaN element (NaN cosine, ranks FIRST in
    * desc), and a null vec_id (participates in nothing). Cluster 1 is
    * dense enough that k cuts; cluster 2 is degenerate-heavy so null
    * cosines must fill trailing slots in neighbor_id order.
    */
  private def edgeFixture: DataFrame = {
    val rng = new scala.util.Random(7)
    def v(): Seq[java.lang.Float] =
      Seq.fill(8)(java.lang.Float.valueOf(rng.nextFloat() * 2 - 1))
    val normal = Seq.tabulate(12)(i =>
      (Option(i.toLong), Option(v()), 1))
    val edge: Seq[(Option[Long], Option[Seq[java.lang.Float]], Int)] = Seq(
      (Some(100L), Some(Seq.fill(8)(java.lang.Float.valueOf(0.0f))), 2),
      (Some(101L), None, 2),
      (Some(102L), Some(Seq[java.lang.Float](
        java.lang.Float.valueOf(1.0f), null,
        java.lang.Float.valueOf(0.5f), java.lang.Float.valueOf(0.5f),
        java.lang.Float.valueOf(0.5f), java.lang.Float.valueOf(0.5f),
        java.lang.Float.valueOf(0.5f), java.lang.Float.valueOf(0.5f))), 2),
      (Some(103L), Some(v().take(5)), 2),
      (Some(104L), Some(Seq[java.lang.Float](
        java.lang.Float.valueOf(Float.NaN)) ++ v().take(7)), 2),
      (Some(105L), Some(v()), 2),
      (Some(106L), Some(v()), 2),
      (None, Some(v()), 2))
    (normal ++ edge).toDF("vec_id", "embedding", "cluster")
  }

  test("knnGraph over ClusterTopK bit-matches the legacy pair join on every edge class") {
    val assigned = edgeFixture
    for (k <- Seq(1, 3, 7)) {
      val got = keyed(Similarity.knnGraph(assigned, k = k))
      val want = keyed(legacyGraph(assigned, k = k, dedup = false))
      assert(got == want, s"k=$k: diff ${(got -- want) ++ (want -- got)}")
    }
  }

  test("multi-assigned relation with dedup bit-matches legacy, shared pairs take one slot") {
    // duplicate every row into a second cluster id (clusters 11/12) so
    // every pair is generated twice with an identical cosine
    val base = edgeFixture
    val assigned = base.union(base.withColumn("cluster",
      col("cluster") + lit(10)))
    val got = keyed(Similarity.knnGraph(assigned, k = 4,
      dedupCandidates = true))
    val want = keyed(legacyGraph(assigned, k = 4, dedup = true))
    assert(got == want, s"diff ${(got -- want) ++ (want -- got)}")
  }

  test("salted groups reproduce the unsalted output exactly on the edge fixture") {
    val assigned = edgeFixture
    val unsalted = keyed(Similarity.knnGraph(assigned, k = 3))
    // clusterHint=1 forces the max salt clamp on any core count
    val salted = keyed(Similarity.knnGraph(assigned, k = 3, clusterHint = 1))
    assert(salted == unsalted)
  }

  /** The r15 semanticDupes pair pipeline [[ClusterEpsAgg]] replaces —
    * the executable spec for the ε-ball rewrite (same hoisted-norm
    * cosine, `cosine > eps` with Spark's nan-safe `>`, the original
    * three-way aggregate).
    */
  private def legacyDupes(assigned: DataFrame, eps: Double): DataFrame = {
    val withNorm = assigned.withColumn("__vn",
      sqrt(DotProduct(col("embedding"), col("embedding"))))
    val keep = withNorm.select(col("cluster"), col("vec_id").as("kept_id"),
      col("embedding").as("__ea"), col("__vn").as("__na"))
    val dup = withNorm.select(col("cluster"), col("vec_id").as("dup_id"),
      col("embedding").as("__eb"), col("__vn").as("__nb"))
    val pc = when(col("__na") === 0.0 || col("__nb") === 0.0,
      lit(null).cast("double"))
      .otherwise(DotProduct(col("__ea"), col("__eb")) /
        (col("__na") * col("__nb")))
    keep.join(dup, "cluster")
      .filter(col("kept_id") < col("dup_id"))
      .select(col("dup_id"), col("cluster"), col("kept_id"),
        pc.as("cosine"))
      .filter(col("cosine") > eps)
      .groupBy(col("dup_id"))
      .agg(min(col("cluster")).cast("long").as("cluster"),
        min(col("kept_id")).as("kept_id"),
        max(col("cosine")).as("max_cosine"))
  }

  private def dupesKeyed(df: DataFrame): Set[(Long, Long, Long, Long)] =
    df.collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }.toSet

  test("semanticDupes over ClusterEpsAgg bit-matches the legacy pair join on every edge class") {
    // low eps so qualifying pairs are plentiful; the edge rows (zero
    // norm, null embedding/element, length mismatch) must qualify in
    // NEITHER pipeline, and the NaN row must qualify in BOTH (Spark's
    // `>` is nan-safe) and win its max
    val assigned = edgeFixture.withColumn("cluster",
      col("cluster").cast("int"))
    for (eps <- Seq(-0.5, 0.2, 0.95)) {
      val got = dupesKeyed(Similarity.semanticDupes(assigned, eps))
      val want = dupesKeyed(legacyDupes(assigned, eps))
      assert(got == want, s"eps=$eps: diff ${(got -- want) ++ (want -- got)}")
      if (eps == -0.5) {
        val nanDups = dupesKeyed(Similarity.semanticDupes(assigned, eps))
          .filter(t => java.lang.Double.longBitsToDouble(t._4).isNaN)
        assert(nanDups.nonEmpty, "fixture must exercise the NaN-qualifies rule")
      }
    }
    // multi-assignment: dup both clusters — partials aggregate across
    val multi = assigned.union(assigned.withColumn("cluster",
      col("cluster") + lit(10)))
    val got = dupesKeyed(Similarity.semanticDupes(multi, 0.2))
    val want = dupesKeyed(legacyDupes(multi, 0.2))
    assert(got == want, s"multi: diff ${(got -- want) ++ (want -- got)}")
  }

  test("semanticDupes salted groups reproduce the unsalted output exactly") {
    val assigned = edgeFixture
    val unsalted = dupesKeyed(Similarity.semanticDupes(assigned, 0.2))
    val salted = dupesKeyed(Similarity.semanticDupes(assigned, 0.2,
      clusterHint = 1))
    assert(salted == unsalted)
  }

  test("expression-level ordering: NaN first, nulls trail by neighbor_id, k cuts") {
    val rows = Seq(
      (1L, Seq(1.0f, 0.0f)), // source
      (2L, Seq(Float.NaN, 1.0f)), // NaN cosine — desc ranks it FIRST
      (3L, Seq(0.9f, 0.1f)),
      (4L, Seq(0.0f, 0.0f)), // zero norm → null cosine
      (5L, Seq(0.0f, 1.0f)),
      (6L, Seq(0.0f, 0.0f))) // second null — trails by id after 4
      .toDF("vec_id", "embedding")
      .select(struct(col("vec_id"), col("embedding")).as("m"))
      .agg(collect_list(col("m")).as("members"))
    val out = rows.select(explode(
      ClusterTopK(col("members"), lit(0), 5, 1)).as("c"))
      .select(col("c.*"))
      .filter(col("vec_id") === 1L)
      .collect()
      .map(r => (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(out.length == 5)
    assert(out(0)._1 == 2L && out(0)._2.exists(_.isNaN), s"NaN not first: ${out.toSeq}")
    assert(out(1)._1 == 3L && out(2)._1 == 5L, s"real cosines misordered: ${out.toSeq}")
    assert(out(3) == (4L, None) && out(4) == (6L, None),
      s"null cosines must trail in id order: ${out.toSeq}")
    // k=3 cuts the trailing nulls entirely
    val cut = rows.select(explode(
      ClusterTopK(col("members"), lit(0), 3, 1)).as("c"))
      .select(col("c.*")).filter(col("vec_id") === 1L).collect()
      .map(_.getLong(1)).toSeq
    assert(cut == Seq(2L, 3L, 5L))
  }
}
