package graft.engine

import java.sql.Timestamp
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.model._
import graft.search.SearchParser

/** Property test for the search-cache key encoder: the key must be a
  * FUNCTION of the normalized filter (pagination/sorting stripped) and
  * INJECTIVE over it — a collision serves one search's persisted match
  * set for another (the reference JSON-encodes its cache key for the
  * same reason, duckdb.go:50-57), and a spurious split persists the
  * identical match set twice. Unit cases pin the known traps (separator
  * content, case-class toString, Set order, DST timestamps, Seq
  * implementations); the property covers the product space.
  */
class CacheKeyPropSpec extends SparkTestBase {

  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  private lazy val engine = new MsgEngine(Fixtures.vault(spark,
    messages = Seq(Fixtures.msg(1, "hello", "2024-01-15 10:00:00")),
    recipients = Seq(Fixtures.MrRow(1, 1, "from", None)),
    participants = Seq(
      Fixtures.PRow(1, Some("a@x.com"), None, None, Some("x.com")))))

  // strings that try to break the framing: separators, digits, encoder
  // meta-characters, empties
  private val trickyStr: Gen[String] = Gen.oneOf(
    Gen.const(""), Gen.const("|"), Gen.const(":"), Gen.const("1:"),
    Gen.const("@Some#1"), Gen.const("#2"),
    Gen.listOf(Gen.oneOf('a', 'b', '|', ':', ',', '#', '@', '1'))
      .map(_.mkString))

  private val genTs: Gen[Option[Timestamp]] = Gen.option(
    Gen.choose(0L, 4102444800000L).map(new Timestamp(_)))

  private val genViewSet: Gen[Set[ViewType]] =
    Gen.someOf(ViewType.all).map(_.toSet)

  private val genSourceIds: Gen[Option[Seq[Long]]] = Gen.oneOf(
    Gen.const(None),
    Gen.const(Some(Nil)),
    Gen.nonEmptyListOf(Gen.choose(0L, 5L)).map(l => Some(l: Seq[Long])),
    Gen.nonEmptyListOf(Gen.choose(0L, 5L)).map(l => Some(l.toVector: Seq[Long])))

  private val genFilter: Gen[MessageFilter] = for {
    sender <- trickyStr; senderName <- trickyStr
    recipient <- trickyStr; domain <- trickyStr; label <- trickyStr
    conv <- Gen.option(Gen.choose(0L, 3L))
    targets <- genViewSet
    period <- trickyStr
    sourceId <- Gen.option(Gen.choose(0L, 3L))
    sourceIds <- genSourceIds
    after <- genTs; before <- genTs
    withAtt <- Gen.oneOf(true, false)
    hideDel <- Gen.oneOf(true, false)
    page <- Gen.choose(0, 3)
    sortF <- Gen.oneOf(MessageSortField.Date, MessageSortField.Size,
      MessageSortField.Subject)
  } yield MessageFilter(
    sender = sender, senderName = senderName, recipient = recipient,
    domain = domain, label = label, conversationId = conv,
    emptyValueTargets = targets, timeRange = TimeRange(period = period),
    sourceId = sourceId, sourceIds = sourceIds, after = after,
    before = before, withAttachmentsOnly = withAtt,
    hideDeletedFromSource = hideDel,
    pagination = Pagination(limit = page),
    sorting = MessageSorting(field = sortF))

  private def norm(f: MessageFilter): MessageFilter =
    f.copy(pagination = Pagination(), sorting = MessageSorting())

  // keys are minted from the PARSED query (relative dates resolve at
  // parse time); the tricky strings contain no date operators, so parse
  // is deterministic here
  test("cache key equality is EXACTLY normalized-filter equality") {
    check(Prop.forAll(genFilter, genFilter, trickyStr) { (f1, f2, q) =>
      val p = SearchParser.parse(q)
      val same = engine.searchCacheKeyFor(p, f1) ==
        engine.searchCacheKeyFor(p, f2)
      same == (norm(f1) == norm(f2))
    })
  }

  test("query content can never shift into the filter half of the key") {
    check(Prop.forAll(trickyStr, trickyStr, genFilter) { (q1, q2, f) =>
      val (p1, p2) = (SearchParser.parse(q1), SearchParser.parse(q2))
      val same = engine.searchCacheKeyFor(p1, f) ==
        engine.searchCacheKeyFor(p2, f)
      same == (p1 == p2)
    })
  }
}
