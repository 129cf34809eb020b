package graft.engine

import graft.SparkTestBase
import graft.model._
import org.apache.spark.sql.types._

/** Type-drift tolerance for the on-disk star (reference
  * duckdb_test.go:3059-3172 VARCHARParquetColumns): a cache written by an
  * older producer may carry VARCHAR where the engine expects
  * BIGINT/BOOLEAN — every engine surface must still answer correctly,
  * matching the reference's per-column CAST/TRY_CAST view layer
  * (views.go:174-300).
  */
class VarcharStarSpec extends SparkTestBase {

  private lazy val vault: MsgVault = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_varchar_star").toString
    // messages: conversation_id / size_estimate / has_attachments /
    // attachment_count / sender_id all written as STRINGS
    Seq(
      (1L, 1L, "100", null.asInstanceOf[String], "msg1", "<m1@x>", "email",
        "Hello World", "snippet1", java.sql.Timestamp.valueOf("2024-01-15 10:00:00"),
        "1000", "0", "0", null.asInstanceOf[java.sql.Timestamp], null.asInstanceOf[java.sql.Timestamp]),
      (2L, 1L, "101", null.asInstanceOf[String], "msg2", "<m2@x>", "email",
        "Goodbye", "snippet2", java.sql.Timestamp.valueOf("2024-01-16 10:00:00"),
        "2000", "1", "1", null.asInstanceOf[java.sql.Timestamp], null.asInstanceOf[java.sql.Timestamp]))
      .toDF("id", "source_id", "conversation_id", "sender_id",
        "source_message_id", "rfc822_message_id", "message_type", "subject",
        "snippet", "sent_at", "size_estimate", "has_attachments",
        "attachment_count", "deleted_at", "deleted_from_source_at")
      .write.parquet(s"$dir/messages")
    Seq((1L, 1L, "from", "Alice"), (2L, 1L, "from", "Alice"))
      .toDF("message_id", "participant_id", "recipient_type", "display_name")
      .write.parquet(s"$dir/message_recipients")
    Seq((1L, "alice@test.com", "test.com", "Alice", ""))
      .toDF("id", "email_address", "domain", "display_name", "phone_number")
      .write.parquet(s"$dir/participants")
    Seq((1L, "x")).toDF("id", "name").limit(0).write.parquet(s"$dir/labels")
    Seq((1L, 1L)).toDF("message_id", "label_id").limit(0)
      .write.parquet(s"$dir/message_labels")
    // attachment size as a STRING too
    Seq((1L, "2", "report.pdf", "application/pdf", "500", "h1"))
      .toDF("id", "message_id", "filename", "mime_type", "size", "content_hash")
      .write.parquet(s"$dir/attachments")
    Seq((100L, "thread100", "", "email"), (101L, "thread101", "", "email"))
      .toDF("id", "source_conversation_id", "title", "conversation_type")
      .write.parquet(s"$dir/conversations")
    Seq((1L, "test@gmail.com", "gmail"))
      .toDF("id", "identifier", "source_type")
      .write.parquet(s"$dir/sources")
    MsgVault.open(spark, dir)
  }

  private lazy val engine = new MsgEngine(vault)

  test("drifted columns normalize to canonical types on open") {
    val m = vault.messages.schema
    assert(m("conversation_id").dataType == LongType)
    assert(m("size_estimate").dataType == LongType)
    assert(m("has_attachments").dataType == BooleanType)
    assert(m("attachment_count").dataType == IntegerType)
    assert(vault.attachments.schema("size").dataType == LongType)
    assert(vault.attachments.schema("message_id").dataType == LongType)
  }

  test("listMessages works over the drifted star, filters included") {
    assert(engine.listMessages(MessageFilter()).count() == 2)
    assert(engine.listMessages(MessageFilter(sender = "alice@test.com")).count() == 2)
    // alice is 'from', never to/cc/bcc
    assert(engine.listMessages(MessageFilter(recipient = "alice@test.com")).count() == 0)
  }

  test("string conversation ids still join to conversations") {
    val out = engine.listMessages(MessageFilter()).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("conversation_id")).toMap
    assert(out == Map(1L -> 100L, 2L -> 101L))
  }

  test("searchFast and attachment predicates over drifted types") {
    val hits = engine.searchFast("Hello").collect()
    assert(hits.map(_.getAs[String]("subject")).toSeq == Seq("Hello World"))
    // has:attachment needs the boolean-normalized has_attachments column
    assert(engine.searchFast("has:attachment").collect()
      .map(_.getAs[Long]("id")).toSeq == Seq(2L))
  }

  test("malformed drifted values become NULL (or the declared default), never a throw") {
    // views.go:181-196 TRY_CAST contract — under ANSI mode a plain cast
    // would throw SparkNumberFormatException on 'N/A'
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_malformed_star").toString
    Seq(
      (1L, 1L, "not-a-number", "msg1", "Subject", "snip",
        java.sql.Timestamp.valueOf("2024-01-15 10:00:00"), "N/A", "maybe", "many"))
      .toDF("id", "source_id", "conversation_id", "source_message_id",
        "subject", "snippet", "sent_at", "size_estimate", "has_attachments",
        "attachment_count")
      .write.parquet(s"$dir/messages")
    Seq((1L, 1L, "from", "Alice"))
      .toDF("message_id", "participant_id", "recipient_type", "display_name")
      .write.parquet(s"$dir/message_recipients")
    Seq((1L, "a@x.com", "x.com", "Alice", ""))
      .toDF("id", "email_address", "domain", "display_name", "phone_number")
      .write.parquet(s"$dir/participants")
    Seq((1L, "x")).toDF("id", "name").limit(0).write.parquet(s"$dir/labels")
    Seq((1L, 1L)).toDF("message_id", "label_id").limit(0)
      .write.parquet(s"$dir/message_labels")
    Seq((1L, 1L, "f", "m", 1L, "h")).toDF("id", "message_id", "filename",
      "mime_type", "size", "content_hash").limit(0)
      .write.parquet(s"$dir/attachments")
    Seq((1L, "c1", "", "email"))
      .toDF("id", "source_conversation_id", "title", "conversation_type")
      .write.parquet(s"$dir/conversations")
    Seq((1L, "a@x.com", "gmail")).toDF("id", "identifier", "source_type")
      .write.parquet(s"$dir/sources")
    val v2 = MsgVault.open(spark, dir)
    val row = v2.messages.collect().head
    assert(row.isNullAt(row.fieldIndex("conversation_id")))
    assert(row.isNullAt(row.fieldIndex("size_estimate")))
    assert(row.getAs[Boolean]("has_attachments") == false) // declared default
    assert(row.getAs[Int]("attachment_count") == 0) // declared default
    // the engine still answers over the row
    assert(new MsgEngine(v2).listMessages(MessageFilter()).count() == 1)
  }

  test("aggregates sum drifted numerics as longs") {
    val rows = engine.aggregate(ViewType.Senders).collect()
    assert(rows.length == 1)
    val alice = rows.head
    assert(alice.getString(0) == "alice@test.com")
    assert(alice.getLong(1) == 2L) // count
    assert(alice.getLong(2) == 3000L) // total_size from "1000"+"2000"
    assert(alice.getLong(3) == 500L) // attachment_size from string "500"
  }
}
