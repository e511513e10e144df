package graft.ops.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Statement-text MERGE: the parser+lowering path must equal the
  * builder path clause-for-clause on the oracled fixture, survive the
  * adversarial token shapes (CASE…THEN inside conditions, keyword
  * text inside string literals), keep the ANSI error surface (dup
  * matched source rows), and drive the persisted table path. */
class MergeSqlSpec extends SparkSpec {

  private def tgt = {
    import spark.implicits._
    Seq((1L, 100L, "a"), (2L, -50L, "b"), (3L, 10L, "c"), (4L, 0L, "d"))
      .toDF("k", "bal", "tag")
  }
  private def src = {
    import spark.implicits._
    Seq((1L, 7L, 5L), (2L, 20L, 1L), (3L, 5L, 1L), (9L, 100L, 1L),
      (10L, 99L, 1L)).toDF("k", "add", "n")
  }

  private def views(): Unit = {
    tgt.createOrReplaceTempView("ms_tgt")
    src.createOrReplaceTempView("ms_src")
  }

  private def rows(df: DataFrame): Seq[String] =
    df.orderBy("k").collect().map(_.toString).toSeq

  private val ladder =
    """MERGE INTO ms_tgt AS a USING ms_src AS b ON a.k = b.k
      |WHEN MATCHED AND b.n >= 5 THEN DELETE
      |WHEN MATCHED AND a.bal > 0 THEN UPDATE SET bal = a.bal + b.add, tag = 'up'
      |WHEN NOT MATCHED AND b.add >= 100 THEN
      |  INSERT (k, bal, tag) VALUES (b.k, b.add, 'new')""".stripMargin

  private def builderLadder = MergeInto.into(tgt, src, Seq("k"))
    .whenMatchedDelete(col("s.n") >= 5)
    .whenMatchedUpdate(col("t.bal") > 0,
      Map("bal" -> (col("t.bal") + col("s.add")), "tag" -> lit("up")))
    .whenNotMatchedInsert(col("s.add") >= 100,
      Map("k" -> col("s.k"), "bal" -> col("s.add"), "tag" -> lit("new")))

  test("statement text equals the builder on the four-row-class ladder " +
      "(delete/update/keep/insert+drop), user aliases rewritten to t/s") {
    views()
    assert(rows(MergeSql.resolveStatement(spark, ladder))
      === rows(builderLadder.resolve()))
  }

  test("no aliases: the relations' simple names qualify the columns") {
    views()
    val stmt =
      """MERGE INTO ms_tgt USING ms_src ON ms_tgt.k = ms_src.k
        |WHEN MATCHED THEN UPDATE SET bal = ms_tgt.bal + ms_src.add""".stripMargin
    val out = rows(MergeSql.resolveStatement(spark, stmt))
    val exp = rows(MergeInto.into(tgt, src, Seq("k"))
      .whenMatchedUpdate(Map("bal" -> (col("t.bal") + col("s.add")))).resolve())
    assert(out === exp)
  }

  test("SET/INSERT column names resolve case-insensitively against the " +
      "target schema (Spark's default resolution; r15 ADVICE)") {
    views()
    // 'Bal' and 'TAG' must canonicalize to the target's 'bal'/'tag'
    val stmt =
      """MERGE INTO ms_tgt AS a USING ms_src AS b ON a.k = b.k
        |WHEN MATCHED THEN UPDATE SET Bal = a.bal + b.add, TAG = 'up'
        |WHEN NOT MATCHED AND b.add >= 100 THEN
        |  INSERT (K, BAL, Tag) VALUES (b.k, b.add, 'new')""".stripMargin
    val exp = rows(MergeInto.into(tgt, src, Seq("k"))
      .whenMatchedUpdate(Map("bal" -> (col("t.bal") + col("s.add")),
        "tag" -> lit("up")))
      .whenNotMatchedInsert(col("s.add") >= 100,
        Map("k" -> col("s.k"), "bal" -> col("s.add"), "tag" -> lit("new")))
      .resolve())
    assert(rows(MergeSql.resolveStatement(spark, stmt)) === exp)
  }

  test("MERGE WITH SCHEMA EVOLUTION INTO a graft catalog table: source-" +
      "extra column added metadata-speed, SET/VALUES of it resolve, " +
      "pre-merge rows read null, replay no-ops; frame path agrees") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_msevo").toString
    PartitionedUpsert.init(
      Seq((1L, 100L), (2L, 200L)).toDF("k", "bal"), dir, "k", 2)
    spark.sql("DROP TABLE IF EXISTS ms_evo_t")
    spark.sql(s"CREATE TABLE ms_evo_t USING graft LOCATION '$dir'")
    Seq((1L, 7L, "x"), (3L, 30L, "y")).toDF("k", "add", "note")
      .createOrReplaceTempView("ms_evo_src")
    try {
      val stmt =
        """MERGE WITH SCHEMA EVOLUTION INTO ms_evo_t AS t
          |USING ms_evo_src AS s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET bal = t.bal + s.add, note = s.note
          |WHEN NOT MATCHED THEN
          |  INSERT (k, bal, note) VALUES (s.k, s.add, s.note)""".stripMargin
      val pathsBefore = PartitionedUpsert.bucketPaths(spark, dir)
      spark.sql(stmt)
      // note arrived metadata-speed (add published before the merge
      // rewrote its touched buckets; untouched bucket files survive)
      val out = PartitionedUpsert.read(spark, dir)
      assert(out.columns.toSeq == Seq("k", "bal", "note"))
      val state = out.orderBy("k").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) null else r.getString(2))).toSeq
      assert(state == Seq((1L, 107L, "x"), (2L, 200L, null), (3L, 30L, "y")),
        state.toString)
      // replay: schema already evolved → evolveSchema no-op, the merge
      // itself applies the (idempotent-content) clauses again
      spark.sql(stmt)
      assert(PartitionedUpsert.read(spark, dir).columns.toSeq
        == Seq("k", "bal", "note"))
      // frame path (resolveStatement) reaches the same shape
      PartitionedUpsert.read(spark, dir) // (table already evolved)
      Seq((10L, 1L), (20L, 2L)).toDF("bal", "k")
        .createOrReplaceTempView("ms_evo_tgt_v")
      val frame = MergeSql.resolveStatement(spark,
        """MERGE WITH SCHEMA EVOLUTION INTO ms_evo_tgt_v AS t
          |USING ms_evo_src AS s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET note = s.note""".stripMargin)
      assert(frame.columns.toSeq == Seq("bal", "k", "note"))
      assert(frame.filter($"k" === 1L).head.getString(2) == "x")
      // without the clause, a new-column SET still fails loudly
      val e = intercept[Exception] {
        spark.sql(
          """MERGE INTO ms_evo_t AS t USING ms_evo_src AS s ON t.k = s.k
            |WHEN MATCHED THEN UPDATE SET nope = s.note""".stripMargin)
      }
      assert(e.getMessage.contains("non-target column"))
      assert(pathsBefore.nonEmpty) // fixture sanity
    } finally spark.sql("DROP TABLE IF EXISTS ms_evo_t")
  }

  test("composite key through the SQL face: multi-conjunct ON routes " +
      "the struct surrogate, INSERT key fields fold into the struct, " +
      "SET of a key field rejected — equal to the native path") {
    import spark.implicits._
    def freshTable(): String = {
      val dir = java.nio.file.Files.createTempDirectory("graft_msck").toString
      val snap = (for { r <- Seq("eu", "us"); i <- 0L until 20L } yield (r, i, 1.0))
        .toDF("region", "id", "val")
        .select(struct($"region", $"id").as("ck"), $"val")
      PartitionedUpsert.init(snap, dir, "ck", nBuckets = 4)
      dir
    }
    val src = Seq(("eu", 7L, 77.0), ("us", 7L, -1.0), ("ap", 1L, 9.0))
      .toDF("region", "id", "v")
    src.createOrReplaceTempView("ms_ck_src")
    val stmt = (tbl: String) =>
      s"""MERGE INTO $tbl AS t USING ms_ck_src AS s
         |ON t.region = s.region AND t.id = s.id
         |WHEN MATCHED AND s.v < 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET val = s.v
         |WHEN NOT MATCHED THEN
         |  INSERT (region, id, val) VALUES (s.region, s.id, s.v)""".stripMargin
    // SQL path
    val dirSql = freshTable()
    spark.sql("DROP TABLE IF EXISTS ms_ck_t")
    spark.sql(s"CREATE TABLE ms_ck_t USING graft LOCATION '$dirSql'")
    try {
      spark.sql(stmt("ms_ck_t"))
      // native path: same clauses, struct surrogate hand-built
      val dirNative = freshTable()
      val srcK = src.select(struct($"region", $"id").as("ck"), $"v")
      MergeInto.mergeIntoTable(spark, dirNative, srcK, "ck",
        Seq(
          MergeInto.MatchedDelete(Some(col("s.v") < 0)),
          MergeInto.MatchedUpdate(None, Map("val" -> col("s.v"))),
          MergeInto.NotMatchedInsert(None,
            Map("ck" -> col("s.ck"), "val" -> col("s.v")))),
        lsn = 2L)
      def state(dir: String) = PartitionedUpsert.read(spark, dir)
        .select($"ck.region", $"ck.id", $"val").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val got = state(dirSql)
      assert(got == state(dirNative))
      assert(got(("eu", 7L)) == 77.0 && !got.contains(("us", 7L))
        && got(("ap", 1L)) == 9.0)
      // SET of a key field is the rebucketing hazard — rejected
      val e = intercept[Exception] {
        spark.sql(
          """MERGE INTO ms_ck_t AS t USING ms_ck_src AS s
            |ON t.region = s.region AND t.id = s.id
            |WHEN MATCHED THEN UPDATE SET region = 'xx'""".stripMargin)
      }
      assert(e.getMessage.contains("key field"))
      // a multi-conjunct ON against a NON-struct table is a clear error
      val dirFlat = java.nio.file.Files.createTempDirectory("graft_msfk").toString
      PartitionedUpsert.init(
        Seq((1L, 2L, 3.0)).toDF("region", "id", "val")
          .select($"region".as("k"), $"id", $"val"), dirFlat, "k", 2)
      spark.sql("DROP TABLE IF EXISTS ms_flat_t")
      spark.sql(s"CREATE TABLE ms_flat_t USING graft LOCATION '$dirFlat'")
      val e2 = intercept[Exception] {
        spark.sql(
          """MERGE INTO ms_flat_t AS t USING ms_ck_src AS s
            |ON t.k = s.region AND t.id = s.id
            |WHEN MATCHED THEN UPDATE SET val = s.v""".stripMargin)
      }
      assert(e2.getMessage.contains("same name") ||
        e2.getMessage.contains("struct-keyed"), e2.getMessage)
      spark.sql("DROP TABLE IF EXISTS ms_flat_t")
    } finally spark.sql("DROP TABLE IF EXISTS ms_ck_t")
  }

  test("USING (subquery) AS alias; ON parenthesized; qualified SET target") {
    views()
    val stmt =
      """MERGE INTO ms_tgt t USING (SELECT k, add * 2 AS add2 FROM ms_src) u
        |ON (t.k = u.k)
        |WHEN MATCHED THEN UPDATE SET t.bal = t.bal + u.add2""".stripMargin
    val out = MergeSql.resolveStatement(spark, stmt)
      .filter(col("k") === 1L).collect()
    assert(out.length === 1 && out.head.getLong(1) === 114L)
  }

  test("CASE … WHEN … THEN … END inside a clause condition does not " +
      "terminate the clause; keyword text inside string literals is inert") {
    views()
    val stmt =
      """MERGE INTO ms_tgt a USING ms_src b ON a.k = b.k
        |WHEN MATCHED AND CASE WHEN b.n >= 5 THEN true ELSE false END THEN DELETE
        |WHEN MATCHED THEN UPDATE SET tag = 'x AND y THEN WHEN z'""".stripMargin
    val out = rows(MergeSql.resolveStatement(spark, stmt))
    val exp = rows(MergeInto.into(tgt, src, Seq("k"))
      .whenMatchedDelete(col("s.n") >= 5)
      .whenMatchedUpdate(Map("tag" -> lit("x AND y THEN WHEN z"))).resolve())
    assert(out === exp)
    assert(out.exists(_.contains("x AND y THEN WHEN z")))
  }

  test("UPDATE SET * and INSERT * map source columns to target columns " +
      "by name (columns absent from the source keep/insert null)") {
    import spark.implicits._
    // source shares k and bal with the target; 'extra' is ignored
    Seq((1L, 999L, "e"), (7L, 70L, "e")).toDF("k", "bal", "extra")
      .createOrReplaceTempView("ms_star_src")
    tgt.createOrReplaceTempView("ms_tgt")
    val stmt =
      """MERGE INTO ms_tgt t USING ms_star_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin
    val out = MergeSql.resolveStatement(spark, stmt)
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2))))
    assert(out === Array(
      (1L, 999L, Some("a")),  // SET * updates bal, keeps tag (not in source)
      (2L, -50L, Some("b")), (3L, 10L, Some("c")), (4L, 0L, Some("d")),
      (7L, 70L, None)))       // INSERT *: tag not in source -> null
  }

  test("duplicate MATCHED source keys raise through the SQL path (ANSI)") {
    import spark.implicits._
    tgt.createOrReplaceTempView("ms_tgt")
    src.union(Seq((3L, 1L, 1L)).toDF("k", "add", "n"))
      .createOrReplaceTempView("ms_dup_src")
    val e = intercept[Exception] {
      MergeSql.resolveStatement(spark,
        """MERGE INTO ms_tgt a USING ms_dup_src b ON a.k = b.k
          |WHEN MATCHED THEN UPDATE SET bal = b.add""".stripMargin).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("multiple rows")))
  }

  test("WHEN NOT MATCHED BY SOURCE ladder via statement equals builder") {
    import spark.implicits._
    tgt.createOrReplaceTempView("ms_tgt")
    Seq((1L, 7L, 1L), (2L, 20L, 1L)).toDF("k", "add", "n")
      .createOrReplaceTempView("ms_bs_src")
    val stmt =
      """MERGE INTO ms_tgt t USING ms_bs_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET bal = t.bal + s.add
        |WHEN NOT MATCHED BY SOURCE AND t.bal < 5 THEN DELETE
        |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET tag = 'stale'""".stripMargin
    val out = MergeSql.resolveStatement(spark, stmt)
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // k=3 (bal 10): by-source update; k=4 (bal 0): by-source delete
    assert(out === Array((1L, 107L, "a"), (2L, -30L, "b"), (3L, 10L, "stale")))
  }

  test("statementIntoTable: persisted state equals resolveStatement; " +
      "wrong ON key vs the table key is rejected") {
    views()
    val dir = java.nio.file.Files.createTempDirectory("graft_msql").toString
    PartitionedUpsert.init(tgt, dir, "k", nBuckets = 4)
    MergeSql.statementIntoTable(spark, ladder, dir, lsn = 1L)
    val state = rows(PartitionedUpsert.read(spark, dir)
      .select(col("k"), col("bal"), col("tag")))
    assert(state === rows(builderLadder.resolve()))
    val e = intercept[IllegalArgumentException] {
      MergeSql.statementIntoTable(spark,
        ladder.replace("a.k = b.k", "a.bal = b.bal")
          .replaceAll("(?s)WHEN NOT MATCHED.*", ""), dir, lsn = 2L)
    }
    assert(e.getMessage.contains("not the table key"))
  }

  test("table path: a null-keyed INSERT is caught by the runtime " +
      "guard (r14 ADVICE) — the syntactic key check cannot see it") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_msql_nk").toString
    PartitionedUpsert.init(tgt, dir, "k", nBuckets = 4)
    // null-keyed source row: exempt from the dup guard, matches
    // nothing, routes to INSERT VALUES (s.k, …) -> key NULL
    val nullSrc = Seq((Option.empty[Long], 150L, 1L)).toDF("k", "add", "n")
    val clauses = Vector(MergeInto.NotMatchedInsert(None, Map(
      "k" -> col("s.k"), "bal" -> col("s.add"), "tag" -> lit("new"))))
    val e = intercept[Exception] {
      MergeInto.mergeIntoTable(spark, dir, nullSrc, "k", clauses, lsn = 1L)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("NULL table key")))
    // and the table is untouched (merge never committed)
    assert(PartitionedUpsert.read(spark, dir).count() === 4)
  }

  test("mergeCatalogTable: MERGE INTO a graft CATALOG TABLE by name — " +
      "location resolved via DESCRIBE, no path in the statement") {
    views()
    val dir = java.nio.file.Files.createTempDirectory("graft_msql_cat").toString
    PartitionedUpsert.init(tgt, dir, "k", nBuckets = 4)
    spark.sql("DROP TABLE IF EXISTS msql_cat_t")
    spark.sql(s"CREATE TABLE msql_cat_t USING graft LOCATION '$dir'")
    try {
      MergeSql.mergeCatalogTable(spark,
        ladder.replace("MERGE INTO ms_tgt AS a", "MERGE INTO msql_cat_t AS a"),
        lsn = 1L)
      val state = rows(PartitionedUpsert.read(spark, dir)
        .select(col("k"), col("bal"), col("tag")))
      assert(state === rows(builderLadder.resolve()))
      // and the merged state is visible through plain SQL immediately
      assert(spark.sql("SELECT tag FROM msql_cat_t WHERE k = 3")
        .head.getString(0) === "up")
      // temp-view target: clear redirect to resolveStatement
      val e = intercept[IllegalArgumentException] {
        MergeSql.mergeCatalogTable(spark, ladder, lsn = 2L)
      }
      assert(e.getMessage.contains("resolveStatement"), e.getMessage)
    } finally spark.sql("DROP TABLE IF EXISTS msql_cat_t")
  }

  test("spark.sql(\"MERGE INTO …\") executes via the injected parser: " +
      "statement in, merged table + touched_buckets receipt out") {
    import spark.implicits._
    views()
    val dir = java.nio.file.Files.createTempDirectory("graft_msql_sql").toString
    PartitionedUpsert.init(tgt, dir, "k", nBuckets = 4)
    spark.sql("DROP TABLE IF EXISTS msql_sql_t")
    spark.sql(s"CREATE TABLE msql_sql_t USING graft LOCATION '$dir'")
    try {
      val receipt = spark.sql(
        """-- comments before the keyword are fine
          |MERGE INTO msql_sql_t AS a USING ms_src AS b ON a.k = b.k
          |WHEN MATCHED AND b.n >= 5 THEN DELETE
          |WHEN MATCHED AND a.bal > 0 THEN
          |  UPDATE SET bal = a.bal + b.add, tag = 'up'
          |WHEN NOT MATCHED AND b.add >= 100 THEN
          |  INSERT (k, bal, tag) VALUES (b.k, b.add, 'new')""".stripMargin)
      assert(receipt.columns.toSeq === Seq("touched_buckets"))
      assert(receipt.head.getLong(0) >= 1L)
      val state = rows(PartitionedUpsert.read(spark, dir)
        .select(col("k"), col("bal"), col("tag")))
      assert(state === rows(builderLadder.resolve()))
      // a second identical statement gets a fresh auto-lsn: matched
      // updates re-apply (bal grows again) — monotone, no clock
      spark.sql(
        """MERGE INTO msql_sql_t a USING ms_src b ON a.k = b.k
          |WHEN MATCHED THEN UPDATE SET bal = a.bal + b.add""".stripMargin)
      assert(PartitionedUpsert.read(spark, dir)
        .filter(col("k") === 3L).head.getLong(1) === 20L) // 10+5+5
      // and non-MERGE SQL still parses through the delegate untouched
      assert(spark.sql("SELECT 1 AS one").head.getInt(0) === 1)
      // a malformed MERGE surfaces the graft parser's specific error
      val bad = intercept[Exception] {
        spark.sql("MERGE INTO msql_sql_t a USING ms_src b ON a.k > b.k WHEN MATCHED THEN DELETE")
      }
      assert(bad.getMessage.contains("equi-key"), bad.getMessage)
    } finally spark.sql("DROP TABLE IF EXISTS msql_sql_t")
  }

  test("parse errors are early and specific: theta ON, mismatched key " +
      "names, INSERT under MATCHED, unknown alias, VALUES arity") {
    views()
    def bad(stmt: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        MergeSql.resolveStatement(spark, stmt)
      }
      assert(e.getMessage.contains(needle), s"$stmt -> ${e.getMessage}")
    }
    bad("""MERGE INTO ms_tgt a USING ms_src b ON a.k > b.k
          |WHEN MATCHED THEN DELETE""".stripMargin, "equi-key")
    bad("""MERGE INTO ms_tgt a USING ms_src b ON a.k = b.n
          |WHEN MATCHED THEN DELETE""".stripMargin, "same name")
    bad("""MERGE INTO ms_tgt a USING ms_src b ON a.k = b.k
          |WHEN MATCHED THEN INSERT (k) VALUES (b.k)""".stripMargin,
      "only valid in WHEN NOT MATCHED")
    bad("""MERGE INTO ms_tgt a USING ms_src b ON x.k = b.k
          |WHEN MATCHED THEN DELETE""".stripMargin, "neither the target nor")
    bad("""MERGE INTO ms_tgt a USING ms_src b ON a.k = b.k
          |WHEN NOT MATCHED THEN INSERT (k, bal) VALUES (b.k)""".stripMargin,
      "columns but")
  }

  test("oracled fixture: statement twin equals the builder key row-for-row") {
    val a = MergeSql.qCdcMergeSql(spark, sfSmoke).collect().map(_.toString)
    val b = MergeInto.qCdcMergeInto(spark, sfSmoke).collect().map(_.toString)
    assert(a.length > 0 && (a sameElements b))
  }
}
