package graft.ops.cdc

import graft.SparkSpec

/** Timestamp time travel (r15 verdict missing-#3): `timestampAsOf`
  * resolves to the FLOOR version — the latest retained commit at or
  * before the timestamp — and from there the path is identical to
  * `versionAsOf`. Commit times are manifest file mtimes (the same
  * clock historyDf surfaces), pinned explicitly here via fs.setTimes
  * so the test is deterministic without sleeps. */
class TimeTravelSpec extends SparkSpec {

  /** Three committed versions with mtimes 1000/2000/3000 ms. */
  private def fixture(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tt").toString
    PartitionedUpsert.init(
      Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), dir, "k", 2)
    PartitionedUpsert.merge(spark, dir,
      Seq((100L, 1L, "u", 11L)).toDF("lsn", "k", "op", "v"),
      "k", "lsn", "op", Seq("v"), 2)
    PartitionedUpsert.merge(spark, dir,
      Seq((101L, 3L, "i", 30L)).toDF("lsn", "k", "op", "v"),
      "k", "lsn", "op", Seq("v"), 2)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    Seq(1L -> 1000L, 2L -> 2000L, 3L -> 3000L).foreach { case (ver, ts) =>
      fs.setTimes(new org.apache.hadoop.fs.Path(
        s"$dir/_manifests/v%020d.manifest".format(ver)), ts, ts)
    }
    dir
  }

  test("versionAtTimestamp: floor between commits, exact at a commit, " +
      "error before the first retained commit") {
    val dir = fixture()
    assert(PartitionedUpsert.versionAtTimestamp(spark, dir, 2500L) == 2L)
    assert(PartitionedUpsert.versionAtTimestamp(spark, dir, 2000L) == 2L)
    assert(PartitionedUpsert.versionAtTimestamp(spark, dir, 1999L) == 1L)
    assert(PartitionedUpsert.versionAtTimestamp(spark, dir, 999999L) == 3L)
    val e = intercept[IllegalArgumentException] {
      PartitionedUpsert.versionAtTimestamp(spark, dir, 999L)
    }
    assert(e.getMessage.contains("precedes the first retained commit"))
  }

  test("readTimestamp(t) equals readVersion(versionAtTimestamp(t)); " +
      "registerView pins by timestamp; both-pins rejected") {
    val dir = fixture()
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows(PartitionedUpsert.readTimestamp(spark, dir, 2500L))
      == rows(PartitionedUpsert.readVersion(spark, dir, 2L)))
    assert(rows(PartitionedUpsert.readTimestamp(spark, dir, 2500L))
      == Seq((1L, 11L), (2L, 20L)))
    PartitionedUpsert.registerView(spark, dir, "tt_view",
      timestampAsOf = Some(1500L))
    assert(rows(spark.table("tt_view")) == Seq((1L, 10L), (2L, 20L)))
    val e = intercept[IllegalArgumentException] {
      PartitionedUpsert.registerView(spark, dir, "tt_view",
        versionAsOf = Some(1L), timestampAsOf = Some(1500L))
    }
    assert(e.getMessage.contains("not both"))
  }

  test("RESTORE TABLE: metadata-only manifest republish — contents " +
      "and schema roll back, no data file moves, txn cursors stay " +
      "current, rolled-back versions remain travelable; SQL face " +
      "takes VERSION and TIMESTAMP pins") {
    import spark.implicits._
    val dir = fixture() // v1/v2/v3 at mtimes 1000/2000/3000
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val v2Rows = rows(PartitionedUpsert.readVersion(spark, dir, 2L))
    val v3Rows = rows(PartitionedUpsert.read(spark, dir))
    val v3Paths = PartitionedUpsert.bucketPaths(spark, dir)
    // record a writer cursor, then restore: the cursor must survive
    PartitionedUpsert.recordTxn(spark, dir, "writer-app", 42L) // v4
    PartitionedUpsert.restoreVersion(spark, dir, 2L)           // v5
    val m = PartitionedUpsert.manifestOrFail(spark, dir)
    assert(m.version == 5L)
    assert(rows(PartitionedUpsert.read(spark, dir)) == v2Rows)
    assert(m.txns.get("writer-app").contains(42L),
      "txn cursors record writer progress and must not regress on restore")
    // rolled-back v3 state still travelable; its files untouched
    assert(rows(PartitionedUpsert.readVersion(spark, dir, 3L)) == v3Rows)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(v3Paths.values.forall(p =>
      fs.exists(new org.apache.hadoop.fs.Path(p))))
    // no-op restore to the current contents' version burns nothing
    PartitionedUpsert.restoreVersion(spark, dir, 5L)
    assert(PartitionedUpsert.manifestOrFail(spark, dir).version == 5L)
    // SQL face: catalog table + both pin forms
    spark.sql("DROP TABLE IF EXISTS tt_restore_t")
    spark.sql(s"CREATE TABLE tt_restore_t USING graft LOCATION '$dir'")
    try {
      spark.sql("RESTORE TABLE tt_restore_t TO VERSION AS OF 3")
      assert(rows(PartitionedUpsert.read(spark, dir)) == v3Rows)
      spark.sql("RESTORE TABLE tt_restore_t TO TIMESTAMP AS OF 1500")
      assert(rows(PartitionedUpsert.read(spark, dir))
        == rows(PartitionedUpsert.readVersion(spark, dir, 1L)))
      // vacuumed / never-committed version: loud error
      val e = intercept[Exception] {
        spark.sql("RESTORE TABLE tt_restore_t TO VERSION AS OF 99")
      }
      assert(e.getMessage.contains("does not exist"))
    } finally spark.sql("DROP TABLE IF EXISTS tt_restore_t")
  }

  test("DSv2 option(\"timestampAsOf\", …): millis and ISO instant both " +
      "resolve to the floor version; equals versionAsOf; writes " +
      "rejected; both-options rejected") {
    val dir = fixture()
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val byTs = spark.read.format("graft")
      .option("timestampAsOf", "2500").load(dir)
    val byVer = spark.read.format("graft")
      .option("versionAsOf", "2").load(dir)
    assert(rows(byTs) == rows(byVer))
    // ISO instant form (epoch 2.5 s = 1970-01-01T00:00:02.500Z)
    val byIso = spark.read.format("graft")
      .option("timestampAsOf", "1970-01-01T00:00:02.500Z").load(dir)
    assert(rows(byIso) == rows(byVer))
    // a timestamp-pinned table is read-only
    import spark.implicits._
    val e = intercept[Exception] {
      Seq((9L, 90L)).toDF("k", "v").write.format("graft")
        .option("timestampAsOf", "2500").mode("append").save(dir)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Seq(Option(x.getMessage).getOrElse("")) ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("read-only")), msgs(e).mkString("~"))
    val e2 = intercept[Exception] {
      spark.read.format("graft").option("timestampAsOf", "2500")
        .option("versionAsOf", "2").load(dir).collect()
    }
    assert(msgs(e2).exists(_.contains("not both")), msgs(e2).mkString("~"))
    // an unparseable timestamp fails with the specific message
    val e3 = intercept[Exception] {
      spark.read.format("graft").option("timestampAsOf", "whenever")
        .load(dir).collect()
    }
    assert(msgs(e3).exists(_.contains("neither epoch millis")),
      msgs(e3).mkString("~"))
  }
}
