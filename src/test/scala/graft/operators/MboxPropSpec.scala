package graft.operators

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** Property: the mboxrd framing is an EXACT inverse for arbitrary
  * payloads — quoting depth, blank lines, trailing newlines, payloads
  * that look like envelopes. Runs on the pure framing/parsing halves
  * (no Spark), mirroring what writeMbox/readMbox do per record.
  */
class MboxPropSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  /** The pure twin of [[Export.mboxRecord]] + the text sink's newline.
    * (?d) as in the real record expression: quoting must only fire at
    * '\n' line starts — the parser's line model.
    */
  private def frame(id: String, payload: String): String =
    s"From ${id.replaceAll("\\s+", "_")} Tue Jan 2 03:04:05 2024\n" +
      payload.replaceAll("(?md)^(>*From )", ">$1") + "\n" + "\n"

  // payloads drawn from an alphabet that exercises the dangerous shapes:
  // From-lines, quote runs, blank lines, plain text
  private val payloadLine: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr.map(_.take(40)),
    Gen.const(""),
    Gen.choose(0, 4).map(d => ">" * d + "From the start"),
    Gen.const("From x"),
    Gen.asciiPrintableStr.map(s => "From " + s.take(20)),
    // CRLF shapes: raw MIME is canonically \r\n — lines carry a
    // trailing \r through the \n-based framing and must roundtrip
    Gen.const("From crlf line\r"),
    Gen.choose(1, 3).map(d => ">" * d + "From quoted crlf\r"),
    Gen.asciiPrintableStr.map(s => s.take(30) + "\r"),
    // bare CR MID-line (malformed MIME): "From " after a \r is NOT a
    // line start in the \n-framed parser, and the quoting regex must
    // agree — (?m) without (?d) quotes it unrecoverably
    Gen.const("a\rFrom bare-cr"),
    Gen.const("\rFrom leading-cr"))

  private val payload: Gen[String] =
    Gen.listOf(payloadLine).map(_.mkString("\n"))

  private val ident: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)

  test("single record roundtrips any payload exactly") {
    check(Prop.forAll(ident, payload) { (id, body) =>
      Export.parseMboxText(frame(id, body)) == Seq((id, body))
    })
  }

  test("concatenated records roundtrip in order with exact payloads") {
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.zip(ident, payload))) { recs =>
      val txt = recs.map { case (i, b) => frame(i, b) }.mkString
      Export.parseMboxText(txt) == recs.map { case (i, b) => (i, b) }
    })
  }

  test("payloads with trailing newlines survive (separator is not eaten)") {
    check(Prop.forAll(ident, payload, Gen.choose(0, 3)) { (id, body, k) =>
      val withTrail = body + "\n" * k
      Export.parseMboxText(frame(id, withTrail)) == Seq((id, withTrail))
    })
  }
}
