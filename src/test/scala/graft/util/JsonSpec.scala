package graft.util

import org.scalatest.funsuite.AnyFunSuite

/** The escaper feeds the driver's json.load — a malformed errors/oracle
  * document would silently zero a round's correctness record, so escaping
  * edge cases get their own tests (round-tripped through Jackson via
  * Spark's bundled ObjectMapper). */
class JsonSpec extends AnyFunSuite {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private def parseBack(escaped: String): String =
    mapper.readTree(s"""{"k":"$escaped"}""").get("k").asText()

  test("quotes, backslashes and control chars survive a parse round-trip") {
    val nasty = "a\"b\\c\nd\re\tfg"
    assert(parseBack(Json.escape(nasty)) == nasty)
  }

  test("truncation cannot split an escape pair (no trailing lone backslash)") {
    // a backslash exactly at the cut point: escaping after truncation keeps
    // the document valid; the old truncate-after-escape order corrupted it
    val s = "x" * 299 + "\\" + "tail"
    val escaped = Json.escape(s, maxLen = 300)
    assert(parseBack(escaped) == "x" * 299 + "\\")
    val q = "y" * 299 + "\"" + "tail"
    assert(parseBack(Json.escape(q, maxLen = 300)) == "y" * 299 + "\"")
  }

  test("plain strings pass through unchanged") {
    assert(Json.escape("SELECT 1 AS n") == "SELECT 1 AS n")
  }
}
