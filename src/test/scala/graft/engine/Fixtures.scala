package graft.engine

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession

/** Typed-fixture builder mirroring the reference's TestDataBuilder
  * (reference: internal/query/testfixtures_test.go:19-654): accumulate
  * typed rows, materialize a MsgVault.
  */
object Fixtures {
  case class MsgRow(id: Long, source_id: Long, conversation_id: Long,
      sender_id: Option[Long], source_message_id: String,
      rfc822_message_id: Option[String], message_type: Option[String],
      subject: String, snippet: String, sent_at: Timestamp,
      size_estimate: Long, has_attachments: Boolean, attachment_count: Int,
      deleted_at: Option[Timestamp], deleted_from_source_at: Option[Timestamp],
      is_from_me: Boolean = false, archived_at: Option[Timestamp] = None)
  case class MrRow(message_id: Long, participant_id: Long,
      recipient_type: String, display_name: Option[String])
  case class PRow(id: Long, email_address: Option[String],
      display_name: Option[String], phone_number: Option[String],
      domain: Option[String])
  case class LblRow(id: Long, name: String)
  case class MlRow(message_id: Long, label_id: Long)
  case class AttRow(id: Long, message_id: Long, filename: String,
      mime_type: String, size: Long, content_hash: String)
  case class ConvRow(id: Long, source_conversation_id: String,
      title: Option[String], conversation_type: Option[String])
  case class SrcRow(id: Long, identifier: String, source_type: Option[String])
  case class CpRow(conversation_id: Long, participant_id: Long,
      role: Option[String] = Some("member"),
      joined_at: Option[Timestamp] = None)

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  def msg(id: Long, subject: String, sentAt: String, size: Long = 100,
      convId: Long = 1, sourceId: Long = 1, senderId: Option[Long] = None,
      msgType: Option[String] = Some("email"), snippet: String = "",
      hasAtt: Boolean = false, attCount: Int = 0,
      deletedAt: Option[String] = None,
      deletedFromSourceAt: Option[String] = None): MsgRow =
    MsgRow(id, sourceId, convId, senderId, s"src-$id", Some(s"<m$id@x>"),
      msgType, subject, snippet, ts(sentAt), size, hasAtt, attCount,
      deletedAt.map(ts), deletedFromSourceAt.map(ts))

  def vault(spark: SparkSession,
      messages: Seq[MsgRow],
      recipients: Seq[MrRow],
      participants: Seq[PRow],
      labels: Seq[LblRow] = Nil,
      messageLabels: Seq[MlRow] = Nil,
      attachments: Seq[AttRow] = Nil,
      conversations: Seq[ConvRow] = Seq(ConvRow(1, "conv-1", None, None)),
      sources: Seq[SrcRow] = Seq(SrcRow(1, "acct@example.com", Some("gmail"))),
      conversationParticipants: Option[Seq[CpRow]] = None): MsgVault = {
    import spark.implicits._
    MsgVault.fromFrames(spark,
      messages.toDF(), recipients.toDF(), participants.toDF(),
      labels.toDF("id", "name"), messageLabels.toDF(),
      attachments.toDF(), conversations.toDF(), sources.toDF(),
      conversationParticipants.map(_.toDF()))
  }
}
