package graft.sources

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec
import graft.ops.cdc.PartitionedUpsert

/** Scalacheck invariants for the truncated-string stats algebra —
  * the soundness core the pruner leans on, proven over arbitrary
  * well-formed Unicode (ASCII, multi-byte BMP, supplementary planes,
  * the gap/limit boundary code points U+D7FF / U+E000 / U+FFFF /
  * U+10FFFF, lengths straddling the 32-code-point cutoff):
  *  1. strCmp agrees in SIGN with UTF8String's byte comparison — the
  *     order Spark's min/max on strings actually aggregated by;
  *  2. strTruncLo is a true lower bound, strTruncHi a true upper
  *     bound, and strTruncHi bounds EVERY extension of the prefix
  *     (the property truncation must not break);
  *  3. strPrefixCeil exceeds every extension of its prefix;
  *  4. a recorded (lo, hi) entry brackets every member of the value
  *     set it was computed from, so equality-pruning can never drop a
  *     member (the end-to-end soundness statement, replayed pure). */
class StrStatsPropertiesSpec extends SparkSpec {

  // code points biased toward the boundaries the algebra branches on
  private val genCp: Gen[Int] = Gen.frequency(
    (6, Gen.chooseNum(0x20, 0x7E)),           // ASCII
    (3, Gen.chooseNum(0x80, 0xD7FF)),         // multi-byte BMP
    (2, Gen.chooseNum(0xE000, 0xFFFD)),       // post-gap BMP
    (2, Gen.chooseNum(0x10000, 0x10FFFF)),    // supplementary
    (2, Gen.oneOf(0x20, 0xD7FF, 0xE000, 0xFFFF, 0x10FFFF, 0x10FFFE)))

  private def str(cps: List[Int]): String =
    cps.flatMap(Character.toChars(_).toSeq).mkString

  private val genStr: Gen[String] =
    Gen.chooseNum(0, 64).flatMap(n => Gen.listOfN(n, genCp)).map(str)
  private val genStrNonEmpty: Gen[String] =
    Gen.chooseNum(1, 64).flatMap(n => Gen.listOfN(n, genCp)).map(str)

  private def sgn(i: Int): Int = Integer.signum(i)

  private def run(name: String, prop: Prop): Unit = {
    val result = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(500)
        .withInitialSeed(org.scalacheck.rng.Seed(20260817L)),
      prop)
    assert(result.passed, s"$name: ${result.status}")
  }

  test("property: strCmp sign equals UTF8String binary-compare sign " +
      "over arbitrary well-formed Unicode pairs") {
    run("cmp", Prop.forAll(genStr, genStr) { (a, b) =>
      sgn(PartitionedUpsert.strCmp(a, b)) ==
        sgn(UTF8String.fromString(a).compareTo(UTF8String.fromString(b)))
    })
  }

  test("property: strTruncLo ≤ s ≤ strTruncHi (when defined), both " +
      "fit the 32-cp cap, and strTruncHi bounds EVERY extension of " +
      "s's 32-cp prefix") {
    run("bounds", Prop.forAll(genStr, genStr) { (s, ext) =>
      val lo = PartitionedUpsert.strTruncLo(s)
      val loOk = PartitionedUpsert.strCmp(lo, s) <= 0 &&
        lo.codePointCount(0, lo.length) <= 32
      val hiOk = PartitionedUpsert.strTruncHi(s) match {
        case None => true // unboundable (all-max prefix) records nothing
        case Some(hi) =>
          PartitionedUpsert.strCmp(s, hi) <= 0 && {
            // any string sharing s's 32-cp prefix stays ≤ hi... for a
            // TRUNCATED s the bound is strict (>) past the prefix
            val cps = s.codePoints().toArray
            if (cps.length <= 32) true
            else {
              val prefix = new String(cps, 0, 32)
              PartitionedUpsert.strCmp(prefix + ext, hi) < 0
            }
          }
      }
      loOk && hiOk
    })
  }

  test("property: strPrefixCeil exceeds the prefix AND every " +
      "extension of it") {
    run("ceil", Prop.forAll(genStrNonEmpty, genStr) { (p, ext) =>
      PartitionedUpsert.strPrefixCeil(p) match {
        case None =>
          p.codePoints().toArray.forall(_ == 0x10FFFF) // only the all-max case
        case Some(c) =>
          PartitionedUpsert.strCmp(p, c) < 0 &&
            PartitionedUpsert.strCmp(p + ext, c) < 0
      }
    })
  }

  test("property: a recorded entry brackets every member of its value " +
      "set — equality pruning can never drop a member") {
    val genSet = Gen.chooseNum(1, 12).flatMap(Gen.listOfN(_, genStrNonEmpty))
    run("entry", Prop.forAll(genSet) { vs =>
      val mn = vs.min(Ordering.fromLessThan[String](
        PartitionedUpsert.strCmp(_, _) < 0))
      val mx = vs.max(Ordering.fromLessThan[String](
        PartitionedUpsert.strCmp(_, _) < 0))
      PartitionedUpsert.strStatEntry(mn, mx) match {
        case None => true // unboundable: nothing recorded, nothing pruned
        case Some((lo, hi)) => vs.forall(v =>
          PartitionedUpsert.strCmp(lo, v) <= 0 &&
            PartitionedUpsert.strCmp(v, hi) <= 0)
      }
    })
  }
}
