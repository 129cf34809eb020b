package graft.operators

import graft.SparkTestBase
import graft.engine.{Fixtures, MsgEngine}
import graft.model.MessageFilter
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftExtensions

/** Curation pipeline, keyset pagination, SQL function registration,
  * approx-distinct tolerance.
  */
class CurationSpec extends SparkTestBase {
  import spark.implicits._

  test("curateFull: language gate, quality gate, exact + near dedup compose") {
    val docs = Seq(
      (1L, "the cat and the dog went to the market and it is a fine day for everyone there"),
      (2L, "the cat and the dog went to the market and it is a fine day for everyone there"), // exact dup of 1
      (3L, "el perro y el gato de la casa se ven en el parque con los vecinos"), // not in langs
      (4L, "zz")) // low quality (2 chars, no stopwords)
      .toDF("doc_id", "text")
    val out = Curation.curateFull(docs, col("doc_id"), col("text"),
      minQuality = 0.5, langs = Set("en")).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L))
    // the token accounting curate already computed rides through — the
    // mixture/packing stages need it without a second text scan
    assert(out.head.getAs[Long]("n_tokens") == 18L)
  }

  test("cosine_similarity/simhash64/minhash_signature callable from SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT cosine_similarity(array(CAST(3.0 AS DOUBLE), CAST(4.0 AS DOUBLE)), " +
        "array(CAST(4.0 AS DOUBLE), CAST(3.0 AS DOUBLE))) AS c").head()
    assert(math.abs(r.getDouble(0) - 0.96) < 1e-12)
    val sh = spark.sql(
      "SELECT simhash64(array('a','b','a')) AS s, " +
        "minhash_signature(array('a','b','c','d'), 8, 3) AS m").head()
    assert(sh.getLong(0) != 0L)
    assert(sh.getAs[scala.collection.Seq[Long]](1).length == 8)
  }

  test("round-4 expressions callable from SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT simhash60_md5(array('a','b')) AS sig, " +
        "winnow_fingerprints(array('a','b','c','d','e','f','g'), 4, 5) AS fps, " +
        "word_shingles(array('a','b','c'), 2) AS sh, " +
        "lang_id(array('the','and','of')) AS lang, " +
        "text_stats('a b a').n_distinct AS nd, " +
        "redact_pii('mail a@b.co or 1.2.3.4') AS red").head()
    assert(r.getLong(0) != 0L)
    assert(r.getAs[scala.collection.Seq[Long]](1).nonEmpty)
    assert(r.getAs[scala.collection.Seq[String]](2) == Seq("a b", "b c"))
    assert(r.getString(3) == "en")
    assert(r.getInt(4) == 2)
    assert(r.getString(5) == "mail <EMAIL> or <IP>")
  }

  test("keyset pagination pages match offset pagination pages") {
    import Fixtures._
    val v = Fixtures.vault(spark,
      messages = (1 to 20).map(i =>
        msg(i.toLong, s"m$i", f"2024-01-${i % 10 + 1}%02d 10:00:00")),
      recipients = (1 to 20).map(i => MrRow(i.toLong, 1L, "from", None)),
      participants = Seq(PRow(1, Some("a@x.com"), None, None, Some("x.com"))))
    val engine = new MsgEngine(v)
    val all = engine.listMessages(MessageFilter()).collect()
    val page1 = engine.listMessagesAfter(MessageFilter(), None, limit = 7).collect()
    assert(page1.map(_.getAs[Long]("id")).toSeq ==
      all.take(7).map(_.getAs[Long]("id")).toSeq)
    val last = page1.last
    val page2 = engine.listMessagesAfter(MessageFilter(),
      Some((last.getAs[java.sql.Timestamp]("sent_at"), last.getAs[Long]("id"))),
      limit = 7).collect()
    assert(page2.map(_.getAs[Long]("id")).toSeq ==
      all.slice(7, 14).map(_.getAs[Long]("id")).toSeq)
  }

  test("approx_count_distinct within 5% of exact on real data") {
    val r = graft.queries.CoreQueries
      .aggApproxDistinct(spark, "/root/testdata/sf0.001").head()
    // the query self-reports the tolerance check (the oracle asserts the
    // boolean); cross-check the exact count against an independent pass
    assert(r.getAs[Boolean]("approx_within_5pct"))
    val exact = graft.sources.Tables
      .load(spark, "/root/testdata/sf0.001", "lineitem")
      .select(countDistinct(col("l_orderkey"))).head().getLong(0)
    assert(r.getAs[Long]("exact_orders") === exact)
  }
}
