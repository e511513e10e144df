package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native single-pass shingle kernel must be BIT-IDENTICAL to the
  * readable HOF reference: normalize in its own projection
  * (regexp_replace(lower, \s+, ' ')) then windowed substr + distinct. */
class CharShinglesSpec extends SparkSpec {

  private def hofReference(df: org.apache.spark.sql.DataFrame, n: Int) =
    df.select(col("id"),
        regexp_replace(lower(col("t")), graft.Ws.Plus, " ").as("norm"))
      .select(col("id"),
        graft.ops.llm.NearDup.charShingles(col("norm"), n).as("tokens"))

  private def native(df: org.apache.spark.sql.DataFrame, n: Int) = {
    CharShingles.register(spark)
    df.select(col("id"), CharShingles.shingles_native(col("t"), n).as("tokens"))
  }

  test("native == HOF on edge strings (element order included)") {
    import spark.implicits._
    val edge = Seq(
      "", " ", "    ", "ab", "abcd", "abcde", "abcdef",
      "  leading run", "trailing run   ", "a\t\n\f\rb",
      "tab\tand  double  space", "中文字符没有空格的文本测试",
      "mixed 中文 and ascii", "exactly5", "UPPER Case MiXeD")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    for (n <- Seq(1, 3, 5)) {
      val h = hofReference(edge, n).collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val nv = native(edge, n).collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(nv == h, s"n=$n")
    }
  }

  test("native == HOF on the whole corpus at n=5") {
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select(col("doc_id").as("id"), col("text").as("t"))
    val h = hofReference(docs, 5)
    val nv = native(docs, 5)
    val joined = h.as("h").join(nv.as("n"), "id")
      .filter(col("h.tokens") =!= col("n.tokens"))
    assert(joined.isEmpty, "native kernel diverged from the HOF reference")
  }

  test("native == HOF on random unicode strings (property, incl. non-BMP)") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.rng.Seed
    // characters that stress every branch: ascii, uppercase (lowering),
    // all five \s whitespace chars, CJK, combining marks, and
    // SUPPLEMENTARY-plane code points (UTF-16 surrogate pairs — the
    // case where counting code units instead of code points diverges)
    val alphabet: Gen[String] = Gen.oneOf(
      Gen.alphaNumChar.map(_.toString), Gen.const(" "), Gen.const("\t"),
      Gen.const("\n"), Gen.const(""), Gen.const("\f"), Gen.const("\r"),
      Gen.oneOf("中", "文", "É", "ß", "é"),
      Gen.oneOf("😀", "𑀀")) // 😀, 𑀀
    val genText: Gen[String] = for {
      n <- Gen.chooseNum(0, 40)
      parts <- Gen.listOfN(n, alphabet)
    } yield parts.mkString
    val prop = Prop.forAll(Gen.listOfN(12, genText)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "t")
      val h = hofReference(df, 5).collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val nv = native(df, 5).collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      nv == h
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10)
        .withInitialSeed(Seed(20260813L)), prop)
    assert(result.passed, result.status.toString)
  }

  test("wrong arity is a classified argument error, not an index crash") {
    CharShingles.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_char_shingles('abc')").collect()
    }
    // the builder's own message must surface (possibly wrapped in an
    // AnalysisException), never an IndexOutOfBoundsException
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
    assert(chain(e).exists(c =>
      Option(c.getMessage).exists(_.contains("exactly 2 arguments"))),
      s"unexpected error: $e")
    assert(!chain(e).exists(_.isInstanceOf[IndexOutOfBoundsException]))
  }

  test("a string containing \\x0B shingles identically in kernel, HOF " +
      "twin, and the DuckDB-pinned RE2 semantics") {
    // Round-7 closure of the r5/r6 carried finding: the kernel and the
    // HOF twin now BOTH pin RE2 `\s` = [ \t\n\f\r] (graft.Ws), so a
    // vertical tab is an ordinary character — kept in shingles, never
    // collapsed — exactly what the DuckDB oracle computes.
    import spark.implicits._
    val df = Seq((1L, "ab\u000Bcd"), (2L, "x \u000B y"),
      (3L, "\u000B"), (4L, "a \u000B\u000B b")).toDF("id", "t")
    val h = hofReference(df, 3).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val nv = native(df, 3).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(nv === h, "kernel and HOF twin must agree on \\x0B input")
    assert(h(1L).exists(_.contains("\u000B")),
      "\\x0B is NOT whitespace under RE2 — it must survive into shingles")
    assert(h(3L) === Seq("\u000B"),
      "a lone \\x0B is a 1-char document, not an empty one")
  }

  test("oracled corpora contain no \\x0B (corpus-property record)") {
    // No longer load-bearing for parity (the kernel pins RE2 `\s`
    // itself now) — kept as a record of the corpus property and an
    // early tripwire if the generator ever starts emitting \x0B.
    for (sfd <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val hits = spark.read.parquet(s"${sf(sfd)}/documents.parquet")
        .filter(col("text").contains("\u000B"))
      assert(hits.isEmpty,
        s"$sfd/documents contains \\x0B — shingle oracle parity would diverge")
    }
  }

  test("null text yields null, not a crash") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[String]), (2L, Some("ok text"))).toDF("id", "t")
    val out = native(df, 5).orderBy("id").collect()
    assert(out(0).isNullAt(1))
    assert(out(1).getSeq[String](1).nonEmpty)
  }
}
