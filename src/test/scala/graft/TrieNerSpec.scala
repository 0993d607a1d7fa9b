package graft

import graft.ner.TrieNer
import graft.fixtures.Gazetteer
import org.scalatest.funsuite.AnyFunSuite

class TrieNerSpec extends AnyFunSuite {

  test("clean is length-preserving and lowercases") {
    val t = "Ab,c\nD!"
    val c = TrieNer.clean(t)
    assert(c.length == t.length)
    assert(c == "ab c d ")
  }

  test("greedy longest match wins at each position") {
    // "merge join" is a 2-token pattern; greedy must take it over
    // nothing (no 1-token "merge"/"join" pattern exists in the fixture)
    val ms = TrieNer.findMatches("a merge join b", Gazetteer.patterns,
      Gazetteer.maxPatternTokens)
    assert(ms.map(_._3) == Seq("merge join"))
    val (s, e, _, ids) = ms.head
    assert((s, e) == (2, 12))
    assert(ids == Seq(5L))
  }

  test("no overlapping matches (left-to-right greedy)") {
    // "sort merge join": greedy takes "sort merge" at pos 0, then cannot
    // match "join" alone (not a pattern) — matches reference W2 semantics
    val ms = TrieNer.findMatches("sort merge join", Gazetteer.patterns,
      Gazetteer.maxPatternTokens)
    assert(ms.map(_._3) == Seq("sort merge"))
  }

  test("single-candidate pattern skips linking; ambiguous does not") {
    val ms = TrieNer.findMatches("spark window", Gazetteer.patterns,
      Gazetteer.maxPatternTokens)
    val bySurface = ms.map(m => m._3 -> m._4).toMap
    assert(bySurface("spark").size == 2)  // ambiguous -> link path
    assert(bySurface("window").size == 1) // unique -> skip path
  }

  test("punctuation becomes space but offsets reference original text") {
    val text = "x,window;y"
    val ms = TrieNer.findMatches(text, Gazetteer.patterns,
      Gazetteer.maxPatternTokens)
    val m = ms.find(_._3 == "window").get
    assert(text.substring(m._1, m._2) == "window")
  }
}
