package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** The native Jaro-Winkler kernel: textbook vectors, the boost
  * threshold and prefix cap, the empty-string convention, null
  * propagation, and SQL/DataFrame registration parity (interpreted
  * eval and whole-stage codegen run the same static kernel). */
class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("textbook vectors (the Winkler census pairs) and edge conventions") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("JELLYFISH", "SMELLYFISH") - 0.8962962962962964) < 1e-12)
    assert(jw("abc", "abc") === 1.0)
    // either side empty -> 0 (the oracle engine's convention)
    assert(jw("", "abc") === 0.0 && jw("x", "") === 0.0 && jw("", "") === 0.0)
    // no match within the window -> 0; adjacent transposition at n=2
    // has window 0, so 'ab'/'ba' is 0 (not a transposition case)
    assert(jw("a", "b") === 0.0 && jw("ab", "ba") === 0.0)
    // boost threshold is STRICT > 0.7: 4-char common prefix but base
    // jaro 2/3 gets NO boost
    assert(math.abs(jw("abcdxxxx", "abcdyyyy") - 0.6666666666666666) < 1e-12)
    // prefix cap at 4: 11 common leading chars boost like 4
    assert(math.abs(jw("aaaaaaaaaaaa", "aaaaaaaaaaab") - 0.9666666666666666) < 1e-12)
    // transposition: full match, one swap -> (1 + 1 + 3/4)/3 + boost
    assert(math.abs(jw("abcd", "abdc") - 0.9333333333333333) < 1e-12)
  }

  test("DataFrame + SQL paths agree with the kernel; nulls propagate") {
    import spark.implicits._
    JaroWinkler.register(spark)
    val df = Seq(
      ("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"), (null, "x"), ("y", null))
      .toDF("a", "b")
    val viaCol = df.select(
      JaroWinkler.jaro_winkler($"a", $"b").as("s")).collect()
    assert(math.abs(viaCol(0).getDouble(0) - 0.9611111111111111) < 1e-12)
    assert(viaCol(2).isNullAt(0) && viaCol(3).isNullAt(0))
    df.createOrReplaceTempView("jwpairs")
    val viaSql = spark.sql(
      "SELECT graft_jaro_winkler(a, b) FROM jwpairs").collect()
    assert(viaSql.map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
      .toSeq === viaCol.map(r =>
        if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq)
    // non-ASCII compares on UTF-8 bytes (the oracle engine's unit):
    // a two-byte character that differs only in its second byte still
    // yields a partial byte match — just assert symmetry + range
    val s = jw("café", "cafe")
    assert(s > 0.8 && s <= 1.0 && s === jw("cafe", "café"))
  }
}
