package graft

import graft.functions.MinHash
import org.scalatest.funsuite.AnyFunSuite

class MinHashSpec extends AnyFunSuite {
  test("signature is deterministic") {
    val a = MinHash.signature("golden sunrise over the quiet harbor")
    val b = MinHash.signature("golden sunrise over the quiet harbor")
    assert(a.sameElements(b))
  }
  test("identical captions share all band keys; disjoint captions share none") {
    val a = MinHash.bandKeys(MinHash.signature("misty mountain under winter light"))
    val b = MinHash.bandKeys(MinHash.signature("misty mountain under winter light"))
    val c = MinHash.bandKeys(MinHash.signature("red trucks parked near a diner at noon"))
    assert(a.sameElements(b))
    assert(a.intersect(c).isEmpty)
  }
  test("estimated Jaccard tracks exact Jaccard") {
    val s1 = "golden sunrise over the quiet harbor beside ancient stone walls"
    val s2 = "golden sunrise over the quiet harbor beside ancient stone towers"
    val est = MinHash.estJaccard(MinHash.signature(s1), MinHash.signature(s2))
    val exact = MinHash.exactJaccard(s1, s2)
    assert(math.abs(est - exact) < 0.25, s"est $est exact $exact")
    assert(est > 0.3)
    val unrel = MinHash.estJaccard(MinHash.signature(s1),
      MinHash.signature("completely different words about machines and engines"))
    assert(unrel < 0.2)
  }
  test("near-identical captions collide in at least one band") {
    val s1 = MinHash.signature("vivid autumn meadow through distant valley light and shadow")
    val s2 = MinHash.signature("vivid autumn meadow through distant valley light and stone")
    val b1 = MinHash.bandKeys(s1).toSet
    val b2 = MinHash.bandKeys(s2).toSet
    assert(b1.intersect(b2).nonEmpty)
  }
}
