package graft.search

import java.time.LocalDateTime
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based parser tests (SURVEY §5: the parser has the highest test
  * density per line in the reference — properties cover the input space
  * unit cases can't enumerate). Raw ScalaCheck driven through a tiny
  * assert bridge (no scalatestplus in the offline dependency set).
  */
class SearchParserPropSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val now = LocalDateTime.of(2026, 1, 15, 12, 0)

  private val bareWord: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString).suchThat(w =>
      !w.contains(":") && w.nonEmpty)

  test("bare words always land in textTerms, in order") {
    check(Prop.forAll(Gen.listOf(bareWord)) { words =>
      val q = SearchParser.parse(words.mkString(" "), now)
      q.textTerms == words.filter(_.nonEmpty)
    })
  }

  test("parsing is deterministic and total (never throws) on arbitrary strings") {
    check(Prop.forAll(Gen.asciiPrintableStr) { s =>
      val a = SearchParser.parse(s, now)
      val b = SearchParser.parse(s, now)
      a == b
    })
  }

  test("quoted phrases keep their inner spaces as one term") {
    check(Prop.forAll(Gen.nonEmptyListOf(bareWord).suchThat(_.nonEmpty)) { words =>
      val phrase = words.mkString(" ")
      val q = SearchParser.parse("\"" + phrase + "\"", now)
      if (words.size > 1 || phrase.length > 1) q.textTerms == Seq(phrase)
      else q.textTerms.nonEmpty // single-char quotes degrade to a bare token
    })
  }

  test("from: values normalize bare domains with known TLDs to @domain") {
    val tld = Gen.oneOf("com", "org", "net", "io", "de", "fr")
    check(Prop.forAll(bareWord, tld) { (name, t) =>
      val q = SearchParser.parse(s"from:${name.toLowerCase}.$t", now)
      q.fromAddrs == Seq(s"@${name.toLowerCase}.$t")
    })
  }

  test("emails pass through normalizeAddr unchanged (lowercased)") {
    check(Prop.forAll(bareWord, bareWord) { (local, dom) =>
      val addr = s"$local@$dom.com"
      val q = SearchParser.parse(s"to:$addr", now)
      q.toAddrs == Seq(addr.toLowerCase)
    })
  }

  test("relative dates: newer_than:Nd is exactly now minus N days") {
    check(Prop.forAll(Gen.choose(1, 3650)) { n =>
      val q = SearchParser.parse(s"newer_than:${n}d", now)
      q.afterDate.contains(now.minusDays(n.toLong))
    })
  }

  test("sizes: larger:NM = N MiB, suffixes K/M/G and KB/MB/GB agree") {
    check(Prop.forAll(Gen.choose(1, 999)) { n =>
      val a = SearchParser.parse(s"larger:${n}M", now).largerThan
      val b = SearchParser.parse(s"larger:${n}MB", now).largerThan
      a == b && a.contains(n.toLong * 1024 * 1024)
    })
  }

  test("operator order does not matter for operator fields") {
    val ops = Seq("from:a@x.com", "label:inbox", "has:attachment", "larger:5M")
    check(Prop.forAll(Gen.listOfN(4, Gen.oneOf(ops)).map(_.distinct)) { chosen =>
      Prop.forAll(Gen.const(scala.util.Random.shuffle(chosen))) { shuffled =>
        val a = SearchParser.parse(chosen.mkString(" "), now)
        val b = SearchParser.parse(shuffled.mkString(" "), now)
        a.fromAddrs.sorted == b.fromAddrs.sorted &&
          a.labels.sorted == b.labels.sorted &&
          a.hasAttachment == b.hasAttachment &&
          a.largerThan == b.largerThan
      }
    })
  }

  test("unknown operators degrade to text terms, never dropped") {
    check(Prop.forAll(bareWord, bareWord) { (op, value) =>
      val token = s"zz$op:$value" // zz-prefix avoids colliding with real ops
      val q = SearchParser.parse(token, now)
      q.textTerms == Seq(token)
    })
  }
}
