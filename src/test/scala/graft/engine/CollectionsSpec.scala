package graft.engine

import graft.SparkTestBase
import graft.model._
import org.apache.spark.sql.functions._

/** Collection scoping: name→source-ID resolution (reference
  * account_scope.go semantics incl. cross hints) and the override rule —
  * a resolved collection's ID set takes precedence over single-source
  * scoping, and an empty collection matches NOTHING.
  */
class CollectionsSpec extends SparkTestBase {
  import Fixtures._
  import spark.implicits._

  private lazy val v = Fixtures.vault(spark,
    messages = Seq(
      msg(1, "from s1 a", "2024-01-10 10:00:00", sourceId = 1),
      msg(2, "from s1 b", "2024-02-10 10:00:00", sourceId = 1),
      msg(3, "from s2", "2024-03-10 10:00:00", sourceId = 2),
      msg(4, "from s3", "2024-04-10 10:00:00", sourceId = 3)),
    recipients = (1 to 4).map(i => MrRow(i.toLong, 1L, "from", None)),
    participants = Seq(PRow(1, Some("a@x.com"), Some("A"), None, Some("x.com"))),
    sources = Seq(
      SrcRow(1, "work@x.com", Some("gmail")),
      SrcRow(2, "home@y.org", Some("imap")),
      SrcRow(3, "old@z.net", Some("mbox"))))

  private lazy val resolver = Collections.resolver(
    sources = Seq((1L, "work@x.com", "Work"), (2L, "home@y.org", "Home"),
      (3L, "old@z.net", "Home")).toDF("id", "identifier", "display_name"),
    collections = Seq((10L, "personal"), (11L, "empty-coll"))
      .toDF("id", "name"),
    collectionSources = Seq((10L, 2L), (10L, 3L))
      .toDF("collection_id", "source_id"))

  private lazy val engine = new MsgEngine(v)

  test("account resolution: identifier, display name, ambiguity, hints") {
    assert(resolver.resolveAccount("work@x.com") ==
      Right(Some(Collections.SourceScope(1, "work@x.com"))))
    assert(resolver.resolveAccount("Work") ==
      Right(Some(Collections.SourceScope(1, "work@x.com"))))
    assert(resolver.resolveAccount("") == Right(None))
    // two sources share display name "Home" → ambiguous, like the reference
    assert(resolver.resolveAccount("Home").isLeft)
    // collection name through --account → hint to use --collection
    val hint = resolver.resolveAccount("personal")
    assert(hint.isLeft && hint.swap.exists(_.contains("--collection")))
    assert(resolver.resolveAccount("nobody").isLeft)
  }

  test("collection resolution: members, account hint, not-found") {
    assert(resolver.resolveCollection("personal") ==
      Right(Some(Collections.CollectionScope("personal", Seq(2L, 3L)))))
    val hint = resolver.resolveCollection("work@x.com")
    assert(hint.isLeft && hint.swap.exists(_.contains("--account")))
    assert(resolver.resolveCollection("missing").isLeft)
    assert(resolver.resolveCollection("") == Right(None))
  }

  test("collection scope OVERRIDES single-source scoping") {
    val scope = resolver.resolveCollection("personal")
      .toOption.flatten.get
    // sourceId=1 would pick msgs 1,2; the collection {2,3} wins → msgs 3,4
    val got = engine.listMessages(MessageFilter(
      sourceId = Some(1L), sourceIds = scope.sourceIds))
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(got == Set(3L, 4L))
    // without the collection, the single source applies
    val single = engine.listMessages(MessageFilter(sourceId = Some(1L)))
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(single == Set(1L, 2L))
  }

  test("an empty collection matches NOTHING, not everything") {
    val scope = resolver.resolveCollection("empty-coll")
      .toOption.flatten.get
    assert(scope.sourceIds == Some(Nil))
    assert(engine.listMessages(MessageFilter(sourceIds = scope.sourceIds))
      .count() == 0)
    // and the aggregate path honors the same tri-state
    assert(engine.aggregate(ViewType.Senders,
      AggregateOptions(sourceIds = Some(Nil))).count() == 0)
  }
}
