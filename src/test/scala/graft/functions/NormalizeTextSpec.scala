package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NormalizeTextSpec extends SparkSpec {

  test("native normalize is bit-identical to the regex formulation on the corpus") {
    import spark.implicits._
    NormalizeText.register(spark)
    val diff = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select(
        TextUdf.normalizeTextCol($"text").as("rx"),
        NormalizeText.normalize_native($"text").as("nx"))
      .filter(!($"rx" <=> $"nx"))
    assert(diff.count() === 0)
  }

  test("native normalize matches regex on edge strings") {
    import spark.implicits._
    NormalizeText.register(spark)
    val edge = Seq(
      "  Hello,   WORLD!! 42 ", "", "###", "a", " a ", "A#B##C",
      "tabs\tand\nnewlines", "ünïcode Ñ café", "ΣΙΓΜΑ İstanbul",
      "123---456", "trailing space   ", "   leading", null
    ).toDF("s")
    val diff = edge.select(
        TextUdf.normalizeTextCol($"s").as("rx"),
        NormalizeText.normalize_native($"s").as("nx"))
      .filter(!($"rx" <=> $"nx"))
    assert(diff.collect().isEmpty)
  }
}
