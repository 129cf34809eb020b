package graft.model

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** CLI/REST output formats (reference cmd/query.go:161-263). */
class QueryResultSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val qr = QueryResult.fromDataFrame(
    Seq((1L, "alice", 2.5), (2L, "bob,jr", 0.0))
      .toDF("id", "name", "score").orderBy(col("id")))

  test("json: columns/rows/row_count envelope") {
    assert(qr.toJson ==
      """{"columns":["id","name","score"],"rows":[[1,"alice",2.5],[2,"bob,jr",0.0]],"row_count":2}""")
  }

  test("csv: header + RFC4180 quoting of commas and quotes") {
    assert(qr.toCsv == "id,name,score\n1,alice,2.5\n2,\"bob,jr\",0.0")
    val tricky = QueryResult(Seq("a"), Seq(Seq("say \"hi\"")))
    assert(tricky.toCsv == "a\n\"say \"\"hi\"\"\"")
  }

  test("table: aligned columns with separator and the (N rows) trailer") {
    val lines = qr.toTable.split("\n")
    assert(lines(0).startsWith("id") && lines(0).contains("name"))
    assert(lines(1).matches("[- ]+"))
    // header + separator + 2 rows + the reference's "(N rows)" trailer
    // (query.go writeTable:260-261)
    assert(lines.length == 5)
    assert(lines.last == "(2 rows)")
    // all rows padded to equal prefix width per column
    assert(lines(2).indexOf("alice") == lines(3).indexOf("bob,jr"))
    // the LAST column pads trailing spaces too (Go's %-*s) — every body
    // line is the same full width
    assert(lines(2).length == lines(3).length &&
      lines(2).length == lines(1).length)
  }

  test("csv quotes fields containing CR like Go's encoding/csv") {
    val r = QueryResult(Seq("v"), Seq(Seq("a\rb")))
    assert(r.toCsv == "v\n\"a\rb\"")
  }

  test("csv quotes leading-whitespace fields and the literal backslash-dot") {
    // Go fieldNeedsQuotes: first-rune unicode whitespace, and the
    // Postgres-dump guard field `\.`
    val r = QueryResult(Seq("a", "b", "c"),
      Seq(Seq(" lead", "\\.", "plain")))
    assert(r.toCsv == "a,b,c\n\" lead\",\"\\.\",plain")
    // tab is whitespace too; trailing space alone does not quote
    val r2 = QueryResult(Seq("x", "y"), Seq(Seq("\tt", "trail ")))
    assert(r2.toCsv == "x,y\n\"\tt\",trail ")
  }

  test("json escapes control characters and nulls") {
    val r = QueryResult(Seq("v"), Seq(Seq("a\n\"b\""), Seq(null)))
    assert(r.toJson == """{"columns":["v"],"rows":[["a\n\"b\""],[null]],"row_count":2}""")
  }

  test("arrays and binary render stably") {
    val r = QueryResult(Seq("xs", "bin"),
      Seq(Seq(Seq(1L, 2L), Array[Byte](0x0a, 0x1f))))
    assert(r.toCsv == "xs,bin\n\"[1,2]\",0a1f")
  }

  test("NESTED arrays render as arrays, incl. the mutable Seqs Spark rows carry") {
    // inner elements of an array<array<T>> cell arrive as
    // mutable.ArraySeq — a bare (immutable) Seq pattern misses them on
    // 2.13 and they would stringify as "ArraySeq(a, b)"
    val nested: Seq[Any] = Seq(
      scala.collection.mutable.ArraySeq.make(Array("a", "b")),
      scala.collection.mutable.ArraySeq.make(Array("c")))
    val r = QueryResult(Seq("xss"), Seq(Seq(nested)))
    assert(r.toJson ==
      """{"columns":["xss"],"rows":[[[["a","b"],["c"]]]],"row_count":1}""")
    assert(r.toCsv == "xss\n\"[[a,b],[c]]\"")
  }
}
