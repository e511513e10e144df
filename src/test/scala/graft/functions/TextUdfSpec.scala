package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextUdfSpec extends SparkSpec {

  test("normalizeText: lowercase, punct stripped, whitespace collapsed, null-safe") {
    import spark.implicits._
    val in = Seq("  Hello,   WORLD!! 42 ", "", "###", null).toDF("s")
    val out = in.select(TextUdf.normalizeText($"s").as("n")).collect().map(r => Option(r.getString(0)))
    assert(out(0) === Some("hello world 42"))
    assert(out(1) === Some(""))
    assert(out(2) === Some(""))
    assert(out(3) === None)
  }

  test("normalizeTextCol matches the UDF on corpus text") {
    import spark.implicits._
    val df = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select(
        TextUdf.normalizeText($"text").as("via_udf"),
        TextUdf.normalizeTextCol($"text").as("via_col"))
    assert(df.filter(!($"via_udf" <=> $"via_col")).count() === 0)
  }

  test("q_udtf_explode: token count equals per-doc split size") {
    import spark.implicits._
    val total = TextUdf.qUdtfExplode(spark, sfSmoke).count()
    val expected = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select(size(split($"text", " ")).as("n")).agg(sum($"n")).head().getLong(0)
    assert(total === expected)
  }
}
