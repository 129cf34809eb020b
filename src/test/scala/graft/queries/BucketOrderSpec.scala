package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Guards the [[graft.queries]] `bucketOrdered` total-order contract.
  *
  * The construction steers Spark's hash partitioner with murmur3 fixed-
  * point labels so that partition index == md5-bucket — which makes the
  * plain concatenation of partitions (a parquet write read back in file
  * order, or a coalesce(1)) equal to `ORDER BY md5bucket(id), id`. That
  * equivalence rests on two assumptions this spec pins down:
  *
  *  1. `Murmur3_x86_32.hashInt(label, 42)` is EXACTLY what
  *     `repartition(n, col)` evaluates for an int column — a Spark
  *     upgrade that changed seed or algorithm would otherwise scramble
  *     row order silently (the values would still match unordered).
  *  2. The Spark-side md5 bucket expression (conv/substring/md5) agrees
  *     with the DuckDB oracle half (`duckBucket`) digit for digit.
  */
class BucketOrderSpec extends SparkTestBase {

  private def md5Bucket(id: Long): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    // first 15 hex chars = 60 bits, the draw bucketOrderedN uses (wide
    // enough that bucket counts beyond 2^16 stay uniformly populated)
    val hex = d.take(8).map(b => f"$b%02x").mkString.take(15)
    (java.lang.Long.parseLong(hex, 16) % OrderBuckets).toInt
  }

  test("hashFixedPoints labels land in their own partition index") {
    val labels = hashFixedPoints(OrderBuckets)
    assert(labels.distinct.length == OrderBuckets)
    // empirical check against Spark itself: repartition a frame of the
    // labels and confirm each label's row lands in the partition whose
    // index it was derived for
    import spark.implicits._
    val df = labels.toSeq.toDF("label")
      .repartition(OrderBuckets, col("label"))
    val placed = df.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        it.map(r => (pid, r.getInt(0)))
      }
      .collect()
    placed.foreach { case (pid, label) =>
      assert(labels(pid) == label,
        s"label $label landed in partition $pid but was derived for " +
          s"partition ${labels.indexOf(label)} — Spark's hash partitioner " +
          "no longer matches Murmur3_x86_32.hashInt(_, 42)")
    }
  }

  test("bucketOrdered: collect order IS the (md5-bucket, id) total order") {
    import spark.implicits._
    val ids = (0L until 1000L).map(i => (i, s"payload$i"))
    val df = bucketOrdered(ids.toDF("id", "v"), col("id"))
    assert(df.rdd.getNumPartitions == OrderBuckets)
    val got = df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val want = ids.sortBy { case (i, _) => (md5Bucket(i), i) }
    assert(got == want,
      "bucketOrdered collect order differs from ORDER BY md5bucket(id), id")
    // schema is unchanged — the bucket/label columns are internal
    assert(df.columns.toSeq == Seq("id", "v"))
  }

  test("bucketOrdered ties broken by the tail sort keys") {
    import spark.implicits._
    // duplicate ids: tail key must order within (bucket, id)
    val rows = Seq((5L, 3), (5L, 1), (5L, 2), (9L, 7), (9L, 5))
    val df = bucketOrdered(rows.toDF("id", "k"), col("id"), col("k").asc)
    val got = df.collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    val want = rows.sortBy { case (i, k) => (md5Bucket(i), i, k) }
    assert(got == want)
  }

  test("the 60-bit draw populates bucket counts beyond 2^16") {
    // a 4-hex (16-bit) draw would leave every bucket index above 65535
    // permanently empty — exactly the shard counts a 100 TB mbox export
    // sizes for. 20k uniform draws over 100k buckets land above 65535
    // with probability 1 - 0.655^20000 ≈ 1.
    import spark.implicits._
    val n = 100000
    val maxBkt = (0L until 20000L).toDF("id")
      .select((conv(substring(md5(col("id").cast("string")), 1, 15), 16, 10)
        .cast("long") % n).as("b"))
      .agg(max(col("b"))).head().getLong(0)
    assert(maxBkt > 65535L,
      s"draw never exceeded 16 bits (max bucket $maxBkt of $n)")
  }

  test("Spark-side bucket expression equals the oracle's md5 arithmetic") {
    import spark.implicits._
    val df = (0L until 500L).toDF("id")
      .select(col("id"),
        (conv(substring(md5(col("id").cast("string")), 1, 15), 16, 10)
          .cast("long") % OrderBuckets).as("b"))
    df.collect().foreach { r =>
      assert(r.getLong(1) == md5Bucket(r.getLong(0)),
        s"bucket mismatch for id ${r.getLong(0)}")
    }
  }
}
