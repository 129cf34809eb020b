package graft.engine

import graft.SparkTestBase
import graft.model._

/** Adversarial-value tests mirroring the reference's injection suite
  * (internal/query/sqlite_injection_test.go:1-141, ILIKE escape edge cases
  * duckdb_test.go:1893-2040). The Spark engine never builds SQL text from
  * filter values — every value becomes a bound `Column` literal — so these
  * assert the structural guarantee: hostile values behave as literals,
  * wildcards are not wildcards, and nothing errors.
  */
class InjectionSpec extends SparkTestBase {
  import Fixtures._

  private lazy val v = Fixtures.vault(spark,
    messages = Seq(
      msg(1, "100% real offer", "2024-01-01 10:00:00"),
      msg(2, "underscore_subject", "2024-01-02 10:00:00"),
      msg(3, "back\\slash", "2024-01-03 10:00:00"),
      msg(4, "Robert'); DROP TABLE messages;--", "2024-01-04 10:00:00"),
      msg(5, "plain", "2024-01-05 10:00:00")),
    recipients = (1 to 5).map(i => MrRow(i.toLong, 1L, "from", None)),
    participants = Seq(
      PRow(1, Some("a'or'1'='1@x.com"), Some("x%y_z"), None, Some("x.com"))))

  private lazy val engine = new MsgEngine(v)

  test("SQL-shaped search terms match literally, mutate nothing") {
    val hits = engine.searchFast("\"DROP TABLE\"").collect()
    assert(hits.map(_.getAs[Long]("id")).toSeq == Seq(4))
    assert(v.messages.count() == 5) // still here
  }

  test("LIKE metacharacters are literal in search terms") {
    // '%' must match only the literal percent subject, not everything
    assert(engine.searchFast("100%").collect().map(_.getAs[Long]("id")).toSeq == Seq(1))
    // '_' literal, not single-char wildcard
    assert(engine.searchFast("underscore_subject").collect()
      .map(_.getAs[Long]("id")).toSeq == Seq(2))
    // backslash survives as content
    assert(engine.searchFast("back\\slash").collect()
      .map(_.getAs[Long]("id")).toSeq == Seq(3))
  }

  test("hostile sender filter value is a literal equality") {
    val out = engine.filters.compile(
      MessageFilter(sender = "a'or'1'='1@x.com")).collect()
    assert(out.length == 5) // participant 1 is the from of all 5
    val none = engine.filters.compile(
      MessageFilter(sender = "' OR 1=1 --")).collect()
    assert(none.isEmpty)
  }

  test("hostile label and quoted operator values parse and match nothing") {
    assert(engine.searchFast("label:'; DELETE FROM labels;--").collect().isEmpty)
    assert(engine.searchFast("from:\"x' OR 'a'='a\"").collect().isEmpty)
    assert(v.labels.count() == 0)
  }

  test("display-name wildcards in sender-name filter stay literal") {
    val hit = engine.filters.compile(MessageFilter(senderName = "x%y_z"))
    assert(hit.count() == 5)
    assert(engine.filters.compile(MessageFilter(senderName = "x%y%z")).count() == 0)
  }
}
