package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** [[graft.queries.memoizedIndex]] invalidation on corpus change — the
  * reference's persistent indexes (FTS5, vec0) are rebuilt when the
  * store content changes (vector backend.go fingerprints its input);
  * a memo keyed only by (session, dir) would serve stale postings or
  * centroids to a long-lived session after the corpus under the same
  * path is rewritten in place.
  */
class MemoInvalidationSpec extends SparkTestBase {

  test("memoizedIndex rebuilds when the corpus dir content changes") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft_memo_fp").toString
    Files.write(Paths.get(dir, "t.parquet"), "v1-bytes".getBytes("UTF-8"))

    var builds = 0
    def lookup(): DataFrame =
      memoizedIndex[DataFrame](spark, dir, "spec_artifact") {
        builds += 1
        val df = spark.range(builds).toDF("n").persist(StorageLevel.MEMORY_ONLY)
        df.count()
        df
      }

    val first = lookup()
    assert(builds == 1)
    // unchanged listing → memo hit, no rebuild
    assert(lookup() eq first)
    assert(builds == 1)

    // rewrite in place (different length so the (path, size, mtime)
    // fingerprint changes even within one mtime tick)
    Files.write(Paths.get(dir, "t.parquet"), "v2-bytes-longer".getBytes("UTF-8"))
    val second = lookup()
    assert(builds == 2, "a rewritten corpus must mint a fresh artifact")
    assert(second ne first)
    // the superseded artifact must not pin its persisted frames for the
    // session's lifetime
    assert(first.storageLevel == StorageLevel.NONE,
      "stale artifact's persisted frames must be released on eviction")
    assert(second.storageLevel != StorageLevel.NONE)

    // a NEW file is a change too (ingest appended a shard)
    Files.write(Paths.get(dir, "t2.parquet"), "extra".getBytes("UTF-8"))
    lookup()
    assert(builds == 3)
  }

  test("indexed FTS search returns fresh results after an in-place corpus rewrite") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_memo_fts").toString
    def doc(i: Long, text: String) = (i, text, "en")
    val v1 = Seq(
      doc(1L, "spark window functions"),
      doc(2L, "sparse wines"),
      doc(3L, "nothing relevant"),
      doc(4L, "sparring winners"))
      .toDF("doc_id", "text", "lang")
    v1.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    def run(): Set[Long] =
      graft.queries.SearchQueries.ftsIndexedSearch(spark, dir)
        .select("doc_id").as[Long].collect().toSet

    assert(run() == Set(1L, 2L, 4L)) // prefix AND of "spar" + "win"
    // corpus rewritten under the SAME path: doc 4 gone, doc 5 new
    Seq(doc(1L, "spark window functions"), doc(5L, "sparkly winter"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(run() == Set(1L, 5L),
      "a rewritten corpus must not be served from the stale inverted index")
  }
}
