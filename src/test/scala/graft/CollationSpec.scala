package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.collation.CollationCodec

/** Property: unsigned byte order of the encoding == CouchDB collation model
  * order, over randomly generated JSON-ish keys (nested arrays, mixed types).
  */
class CollationSpec extends AnyFunSuite {

  private val scalar: Gen[Any] = Gen.oneOf(
    Gen.const(null),
    Gen.oneOf(true, false),
    Gen.chooseNum(-1e9, 1e9).map(_.asInstanceOf[Any]),
    Gen.chooseNum(-1000000L, 1000000L).map(_.toDouble),
    Gen.alphaNumStr.map(_.take(12)),
    Gen.oneOf("", "a", "a b", "ab", "b", "é", "中文")
  )

  private def keyGen(depth: Int): Gen[Any] =
    if (depth <= 0) scalar
    else Gen.frequency(
      3 -> scalar,
      2 -> Gen.listOfN(3, Gen.lzy(keyGen(depth - 1))).flatMap(l =>
        Gen.choose(0, 3).map(n => l.take(n)))
    )

  private def samples(g: Gen[Any], n: Int): Seq[Any] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  test("byte order equals model collation order") {
    val xs = samples(keyGen(2), 400)
    for (a <- xs; b <- xs) {
      val ba = CollationCodec.encodeScala(a)
      val bb = CollationCodec.encodeScala(b)
      val byteCmp = Integer.signum(CollationCodec.compareBytes(ba, bb))
      val modelCmp = Integer.signum(CollationCodec.modelCompare(a, b))
      assert(byteCmp == modelCmp, s"a=$a b=$b byte=$byteCmp model=$modelCmp")
    }
  }

  test("type ranks: null < false < true < number < string < array") {
    val ordered = Seq(null, false, true, -1e308, -1.0, 0.0, 1.0, 1e308,
      "", "a", "a ", "ab", "b", Seq(), Seq(null), Seq(1.0), Seq(1.0, 2.0), Seq("a"))
    val encoded = ordered.map(v => CollationCodec.encodeScala(v))
    encoded.sliding(2).foreach { case Seq(x, y) =>
      assert(CollationCodec.compareBytes(x, y) < 0)
    }
  }

  test("MinKey/MaxKey are total bounds") {
    samples(keyGen(2), 300).foreach { a =>
      val e = CollationCodec.encodeScala(a)
      assert(CollationCodec.compareBytes(CollationCodec.MinKey, e) < 0 || e.isEmpty)
      assert(CollationCodec.compareBytes(e, CollationCodec.MaxKey) < 0)
    }
  }

  test("integral keys beyond 2^53 collate at double precision (JSON model)") {
    val base = 1L << 53 // 9007199254740992: largest exactly-representable run
    // below the bound: adjacent longs stay distinct and ordered
    assert(CollationCodec.compareBytes(
      CollationCodec.encodeScala(base - 2), CollationCodec.encodeScala(base - 1)) < 0)
    // above the bound: longs differing below double granularity collate EQUAL
    assert(CollationCodec.compareBytes(
      CollationCodec.encodeScala(base + 1), CollationCodec.encodeScala(base)) == 0)
    // but magnitude order is still preserved at representable distances
    assert(CollationCodec.compareBytes(
      CollationCodec.encodeScala(base), CollationCodec.encodeScala(base + 2)) < 0)
  }

  test("locale mode groups accents with base letters, case below letters") {
    def enc(s: String) = CollationCodec.encodeScala(s, locale = true)
    // UTF-8 mode banishes 'é' past 'z'; locale mode slots it into 'e'
    assert(CollationCodec.compareBytes(
      CollationCodec.encodeScala("é"), CollationCodec.encodeScala("z")) > 0)
    assert(CollationCodec.compareBytes(enc("e"), enc("é")) < 0)
    assert(CollationCodec.compareBytes(enc("é"), enc("f")) < 0)
    // primary letter difference outranks case: a < B (UTF-8: 'B' < 'a')
    assert(CollationCodec.compareBytes(enc("a"), enc("B")) < 0)
    assert(CollationCodec.compareBytes(
      CollationCodec.encodeScala("B"), CollationCodec.encodeScala("a")) < 0)
    // cross-type order unchanged: numbers still sort before strings
    assert(CollationCodec.compareBytes(
      CollationCodec.encodeScala(1.0, locale = true), enc("a")) < 0)
  }

  test("equal values encode equal") {
    samples(keyGen(2), 300).foreach { a =>
      assert(CollationCodec.compareBytes(
        CollationCodec.encodeScala(a), CollationCodec.encodeScala(a)) == 0)
    }
  }
}
