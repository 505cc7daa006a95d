package graft.similarity

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

class AffineGapSpec extends AnyFunSuite {

  test("identical strings have minimal normalized distance 0.5") {
    assert(AffineGap.normalized("smith", "smith") == 0.5)
    assert(AffineGap.normalized("", "") == 0.5)
  }

  test("single substitution costs less than unrelated strings") {
    val close = AffineGap.normalized("smith", "smyth")
    val far = AffineGap.normalized("smith", "qwxyz")
    assert(close < far)
  }

  test("gap extension is cheaper than reopening (affine property)") {
    // Dropping "cd" as one contiguous gap vs dropping "a" and "f" as two
    // separate gaps: same total gap length, different open counts.
    val oneGap = AffineGap.distance("abcdef", "abef")
    val twoGaps = AffineGap.distance("abcdef", "bcde")
    assert(oneGap < twoGaps)
  }

  test("empty-vs-nonempty is pure gap cost") {
    assert(AffineGap.distance("", "abc") ==
      AffineGap.GapOpenWeight + 3 * AffineGap.GapExtendWeight)
  }

  test("null inputs yield zero similarity") {
    assert(AffineGap.similarity(null, "x") == 0.0)
    assert(AffineGap.similarity("x", null) == 0.0)
  }

  private def randomWords(seed: Long, n: Int): Seq[String] = {
    val r = new Random(seed)
    (0 until n).map(_ =>
      (0 until r.nextInt(9)).map(_ => ('a' + r.nextInt(26)).toChar).mkString)
  }

  test("property: symmetry d(a,b) == d(b,a)") {
    val ws = randomWords(1, 60)
    for (a <- ws; b <- ws)
      assert(AffineGap.distance(a, b) == AffineGap.distance(b, a),
        s"asymmetric for '$a' vs '$b'")
  }

  test("property: identity cost is matchWeight * length") {
    for (a <- randomWords(2, 60))
      assert(AffineGap.distance(a, a) == AffineGap.MatchWeight * a.length)
  }

  test("property: similarity in [0,1], 1 iff identical") {
    val ws = randomWords(3, 40)
    for (a <- ws; b <- ws) {
      val s = AffineGap.similarity(a, b)
      assert(s >= 0.0 && s <= 1.0)
      if (a == b) assert(s == 1.0) else assert(s < 1.0, s"'$a' vs '$b'")
    }
  }
}
