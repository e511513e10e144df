package graft.ops.cdc

import graft.SparkSpec

/** Run-time non-graft fallback of the injected parser (r15 ADVICE,
  * medium): a statement that PARSES as graft DDL/DML but targets a
  * table that is not graft must execute the DELEGATE's plan instead
  * of dying in tableLocation/manifestOrFail — the injection must
  * never break a statement that worked before it existed. */
class SqlFallbackSpec extends SparkSpec {

  test("ALTER TABLE ADD COLUMNS on a plain parquet catalog table " +
      "delegates to Spark and evolves the metastore schema") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS fb_parquet_t")
    Seq((1L, "a"), (2L, "b")).toDF("id", "tag")
      .write.format("parquet").saveAsTable("fb_parquet_t")
    try {
      // graft's grammar accepts the shape, so this is intercepted —
      // the runtime probe must see the non-graft location and hand
      // the statement to Spark's own AlterTableAddColumns path
      spark.sql("ALTER TABLE fb_parquet_t ADD COLUMNS (extra INT)")
      assert(spark.table("fb_parquet_t").columns.toSeq
        == Seq("id", "tag", "extra"))
      // the added column reads null over the old files — Spark's own
      // semantics, untouched by the interception
      assert(spark.sql("SELECT extra FROM fb_parquet_t").collect()
        .forall(_.isNullAt(0)))
    } finally spark.sql("DROP TABLE IF EXISTS fb_parquet_t")
  }

  test("UPDATE / DELETE / OPTIMIZE against a non-graft table surface " +
      "the DELEGATE's error, never the graft manifest error") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS fb_parquet_u")
    Seq((1L, 10L)).toDF("k", "v")
      .write.format("parquet").saveAsTable("fb_parquet_u")
    try {
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Seq(Option(x.getMessage).getOrElse("")) ++ msgs(x.getCause))
      // Spark rejects UPDATE/DELETE on v1 tables with ITS error — the
      // statement reached the delegate instead of graft's manifest code
      val eu = intercept[Exception] {
        spark.sql("UPDATE fb_parquet_u SET v = 1 WHERE k = 1")
      }
      assert(!msgs(eu).exists(_.contains("upsert target")), msgs(eu).mkString("~"))
      val ed = intercept[Exception] {
        spark.sql("DELETE FROM fb_parquet_u WHERE k = 1")
      }
      assert(!msgs(ed).exists(_.contains("upsert target")), msgs(ed).mkString("~"))
      // OPTIMIZE has no delegate statement either — Spark cannot parse
      // it — so the graft error (with its specific message) is correct
      val eo = intercept[Exception] {
        spark.sql("OPTIMIZE fb_parquet_u")
      }
      assert(msgs(eo).nonEmpty)
    } finally spark.sql("DROP TABLE IF EXISTS fb_parquet_u")
  }

  test("ROW-PRODUCING DESCRIBE HISTORY/DETAIL on a non-graft table " +
      "raise the SPECIFIC graft error — never the delegate's " +
      "describe-column misparse or a silently empty frame (r16 ADVICE " +
      "medium)") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS fb_parquet_h")
    Seq((1L, 10L)).toDF("k", "v")
      .write.format("parquet").saveAsTable("fb_parquet_h")
    try {
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Seq(Option(x.getMessage).getOrElse("")) ++ msgs(x.getCause))
      val eh = intercept[Exception] {
        spark.sql("DESCRIBE HISTORY fb_parquet_h").collect()
      }
      assert(msgs(eh).exists(_.contains("upsert target")),
        msgs(eh).mkString("~"))
      val ed = intercept[Exception] {
        spark.sql("DESCRIBE DETAIL fb_parquet_h").collect()
      }
      assert(msgs(ed).exists(_.contains("upsert target")),
        msgs(ed).mkString("~"))
    } finally spark.sql("DROP TABLE IF EXISTS fb_parquet_h")
  }

  test("a temp-view target keeps the graft path's specific error " +
      "(no resolvable location = nothing to fall back to)") {
    import spark.implicits._
    Seq((1L, 2L)).toDF("k", "v").createOrReplaceTempView("fb_view")
    val e = intercept[Exception] {
      spark.sql("DELETE FROM fb_view WHERE k = 1")
    }
    assert(e.getMessage.contains("graft catalog table"))
  }

  test("graft targets still route to the graft path (the fallback " +
      "probe must not misfire on a real manifest)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fb").toString
    PartitionedUpsert.init((1L to 10L).map(k => (k, k * 2L)).toDF("k", "v"),
      dir, "k", 2)
    spark.sql("DROP TABLE IF EXISTS fb_graft_t")
    spark.sql(s"CREATE TABLE fb_graft_t USING graft LOCATION '$dir'")
    try {
      val receipt = spark.sql("DELETE FROM fb_graft_t WHERE k <= 2")
      assert(receipt.head.getLong(0) >= 1L) // the graft receipt shape
      assert(spark.sql("SELECT COUNT(*) FROM fb_graft_t").head.getLong(0) == 8L)
    } finally spark.sql("DROP TABLE IF EXISTS fb_graft_t")
  }
}
