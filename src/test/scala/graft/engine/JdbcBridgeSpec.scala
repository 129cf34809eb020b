package graft.engine

import java.sql.DriverManager
import graft.SparkTestBase
import graft.model._
import org.apache.spark.sql.functions._

/** SQLite→star ingestion bridge, end-to-end against a real JDBC OLTP
  * store: embedded Derby (the JDBC engine shipped with Spark) stands in
  * for the reference's live msgvault.db — same normalized schema
  * (reference internal/store/schema.sql), read via CacheBuilder.openJdbc/
  * fromJdbc exactly as a cluster would read SQLite with sqlite-jdbc on
  * the classpath.
  */
class JdbcBridgeSpec extends SparkTestBase {

  private lazy val dbDir =
    java.nio.file.Files.createTempDirectory("graft_oltp").toString
  private lazy val url = s"jdbc:derby:$dbDir/msgvault;create=true"

  private def seedOltp(): Unit = {
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("""CREATE TABLE messages (
      id BIGINT PRIMARY KEY, source_id BIGINT, conversation_id BIGINT,
      sender_id BIGINT, source_message_id VARCHAR(64),
      rfc822_message_id VARCHAR(128), message_type VARCHAR(32),
      subject VARCHAR(256), snippet VARCHAR(256), sent_at TIMESTAMP,
      size_estimate BIGINT, has_attachments BOOLEAN, attachment_count INT,
      deleted_at TIMESTAMP, deleted_from_source_at TIMESTAMP,
      is_from_me BOOLEAN, archived_at TIMESTAMP)""")
    st.execute("""CREATE TABLE message_recipients (
      message_id BIGINT, participant_id BIGINT, recipient_type VARCHAR(16),
      display_name VARCHAR(128))""")
    st.execute("""CREATE TABLE participants (
      id BIGINT PRIMARY KEY, email_address VARCHAR(128),
      display_name VARCHAR(128), phone_number VARCHAR(32),
      domain VARCHAR(64))""")
    st.execute("CREATE TABLE labels (id BIGINT PRIMARY KEY, name VARCHAR(64))")
    st.execute("CREATE TABLE message_labels (message_id BIGINT, label_id BIGINT)")
    st.execute("""CREATE TABLE attachments (
      id BIGINT PRIMARY KEY, message_id BIGINT, filename VARCHAR(128),
      mime_type VARCHAR(64), size BIGINT, content_hash VARCHAR(64))""")
    st.execute("""CREATE TABLE conversations (
      id BIGINT PRIMARY KEY, source_conversation_id VARCHAR(64),
      title VARCHAR(128), conversation_type VARCHAR(32))""")
    st.execute("""CREATE TABLE sources (
      id BIGINT PRIMARY KEY, identifier VARCHAR(128), source_type VARCHAR(32))""")

    val insM = conn.prepareStatement(
      """INSERT INTO messages VALUES (?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?)""")
    // 6 messages across 2023/2024 from two senders; #5 is a dedup loser
    // (deleted_at set — must be excluded by the ETL, build_cache.go:308)
    for (i <- 1 to 6) {
      insM.setLong(1, i); insM.setLong(2, 1L); insM.setLong(3, 1L)
      insM.setNull(4, java.sql.Types.BIGINT)
      insM.setString(5, s"src-$i"); insM.setString(6, s"<m$i@x>")
      insM.setString(7, "email"); insM.setString(8, s"subject $i")
      insM.setString(9, "")
      insM.setTimestamp(10,
        java.sql.Timestamp.valueOf(s"${if (i <= 2) 2023 else 2024}-0$i-10 10:00:00"))
      insM.setLong(11, 100L * i); insM.setBoolean(12, i == 1)
      insM.setInt(13, if (i == 1) 1 else 0)
      if (i == 5) insM.setTimestamp(14, java.sql.Timestamp.valueOf("2024-06-01 00:00:00"))
      else insM.setNull(14, java.sql.Types.TIMESTAMP)
      insM.setNull(15, java.sql.Types.TIMESTAMP)
      insM.setBoolean(16, false); insM.setNull(17, java.sql.Types.TIMESTAMP)
      insM.executeUpdate()
    }
    st.execute("INSERT INTO participants VALUES (1, 'a@x.com', 'A', NULL, 'x.com')")
    st.execute("INSERT INTO participants VALUES (2, 'b@y.org', 'B', NULL, 'y.org')")
    for (i <- 1 to 6)
      st.execute(s"INSERT INTO message_recipients VALUES ($i, ${i % 2 + 1}, 'from', NULL)")
    st.execute("INSERT INTO labels VALUES (1, 'INBOX')")
    for (i <- 1 to 6) st.execute(s"INSERT INTO message_labels VALUES ($i, 1)")
    st.execute("INSERT INTO attachments VALUES (1, 1, 'f.bin', 'application/octet-stream', 10, 'h')")
    st.execute("INSERT INTO conversations VALUES (1, 'conv-1', NULL, NULL)")
    st.execute("INSERT INTO sources VALUES (1, 'acct@x.com', 'gmail')")
    conn.close()
  }

  test("fromJdbc builds the star from a live OLTP store; engine queries run over it") {
    seedOltp()
    val out = java.nio.file.Files.createTempDirectory("graft_jdbc_star").toString

    // the fact read is range-partitioned over the PK — parallel JDBC
    // cursors, the scale shape for a multi-GB messages table
    val vaultIn = CacheBuilder.openJdbc(spark, url, numPartitions = 3)
    assert(vaultIn.messages.rdd.getNumPartitions == 3)

    val n = CacheBuilder.fromJdbc(spark, url, out, numPartitions = 3)
    assert(n == 5, s"expected 5 live messages exported, got $n") // #5 deleted

    // hive partitioning materialized on disk: the idempotent-retry batch
    // level, then year dirs inside it
    val batches = new java.io.File(s"$out/messages").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(batches == Set("batch=full"))
    val years = new java.io.File(s"$out/messages/batch=full").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(years == Set("year=2023", "year=2024"))

    // the built star answers engine queries like any other cache
    val vlt = MsgVault.open(spark, out)
    val eng = new MsgEngine(vlt)
    val senders = eng.aggregate(ViewType.Senders)
      .orderBy(col("key")).collect()
    assert(senders.map(r => r.getString(0) -> r.getLong(1)).toSeq ==
      Seq("a@x.com" -> 3L, "b@y.org" -> 2L)) // msg5 (sender b) excluded
    val att = eng.aggregate(ViewType.Senders).orderBy(col("key")).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(att("b@y.org") == 1L) // attachment rollup joined below the agg

    // incremental rebuild is a no-op while the OLTP watermark is unchanged
    assert(!CacheBuilder.needsBuild(spark, vaultIn, out))
    assert(CacheBuilder.fromJdbc(spark, url, out, numPartitions = 3) == 0L)
  }
}
