package graft.sources

import graft.SparkSpec
import graft.ops.cdc.PartitionedUpsert

/** The graft TableCatalog (r17): SQL manages graft tables by NAME —
  * CREATE/CTAS/INSERT/time-travel/DML grammar/ALTER/RENAME/DROP/SHOW
  * — with the table directory's manifest chain as the ONLY metadata
  * (no metastore, no sync problem). */
class GraftCatalogSpec extends SparkSpec {

  private lazy val wh: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_cat_wh").toString
    spark.conf.set("spark.sql.catalog.gcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcat.warehouse", dir)
    dir
  }

  test("CREATE NAMESPACE + CREATE TABLE PARTITIONED BY bucket(n, key) " +
      "+ INSERT + SELECT + SHOW TABLES + DROP TABLE — the full " +
      "name-addressed lifecycle with zero metastore state") {
    wh: Unit
    spark.sql("CREATE NAMESPACE gcat.prod")
    spark.sql("CREATE TABLE gcat.prod.users (id BIGINT, name STRING) " +
      "USING graft PARTITIONED BY (bucket(4, id))")
    // the table IS its directory: manifest v1, 4 buckets, keyed by id
    val m = PartitionedUpsert.manifestOrFail(spark, s"$wh/prod/users")
    assert(m.nBuckets == 4 && m.keyCol == "id" && m.version == 1L)
    spark.sql("INSERT INTO gcat.prod.users VALUES (1, 'ada'), (2, 'bob')")
    spark.sql("INSERT INTO gcat.prod.users VALUES (1, 'ada2')") // upsert
    val rows = spark.sql("SELECT id, name FROM gcat.prod.users ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "ada2"), (2L, "bob")))
    val shown = spark.sql("SHOW TABLES IN gcat.prod")
      .select("tableName").collect().map(_.getString(0)).toSeq
    assert(shown == Seq("users"))
    assert(spark.sql("SHOW NAMESPACES IN gcat").collect()
      .map(_.getString(0)).contains("prod"))
    spark.sql("DROP TABLE gcat.prod.users")
    assert(spark.sql("SHOW TABLES IN gcat.prod").count() == 0)
    intercept[Exception] { spark.sql("SELECT * FROM gcat.prod.users") }
  }

  test("CTAS with TBLPROPERTIES key/buckets; duplicate keys in the " +
      "query error (keyed-table contract); key/provider guards") {
    wh: Unit
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ctas")
    spark.sql("CREATE TABLE gcat.ctas.sums USING graft " +
      "TBLPROPERTIES ('key'='k','buckets'='2') " +
      "AS SELECT id AS k, id * 10 AS v FROM range(5)")
    val got = spark.sql("SELECT k, v FROM gcat.ctas.sums ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == (0L to 4L).map(k => (k, k * 10)))
    assert(PartitionedUpsert.manifestOrFail(spark, s"$wh/ctas/sums")
      .nBuckets == 2)
    // a keyless CREATE is rejected loudly
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE gcat.ctas.nokey (a BIGINT) USING graft")
    }
    assert(e.getMessage.contains("needs its key"))
    // a foreign provider in this catalog is rejected loudly
    val ep = intercept[Exception] {
      spark.sql("CREATE TABLE gcat.ctas.foreign (a BIGINT) USING parquet " +
        "TBLPROPERTIES ('key'='a')")
    }
    assert(ep.getMessage.contains("graft tables"))
  }

  test("time travel by NAME: VERSION AS OF / TIMESTAMP AS OF resolve " +
      "historical pins; historical pins are read-only") {
    wh: Unit
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.tt")
    spark.sql("CREATE TABLE gcat.tt.t (k BIGINT, v BIGINT) USING graft " +
      "PARTITIONED BY (bucket(2, k))")
    spark.sql("INSERT INTO gcat.tt.t VALUES (1, 10)") // v2
    spark.sql("INSERT INTO gcat.tt.t VALUES (1, 11)") // v3
    assert(spark.sql("SELECT v FROM gcat.tt.t VERSION AS OF 2")
      .head().getLong(0) == 10L)
    assert(spark.sql("SELECT v FROM gcat.tt.t").head().getLong(0) == 11L)
    // TIMESTAMP AS OF now() resolves to the floor (current) version
    assert(spark.sql(
      "SELECT v FROM gcat.tt.t TIMESTAMP AS OF current_timestamp()")
      .head().getLong(0) == 11L)
    val e = intercept[Exception] {
      spark.sql("INSERT INTO (SELECT * FROM gcat.tt.t VERSION AS OF 2) " +
        "VALUES (9, 9)")
    }
    assert(e.getMessage != null)
  }

  test("the injected statement grammar works on catalog names with no " +
      "new code: UPDATE / DELETE / MERGE / OPTIMIZE / DESCRIBE " +
      "HISTORY resolve through the same location chain") {
    import spark.implicits._
    wh: Unit
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.dml")
    spark.sql("CREATE TABLE gcat.dml.t (k BIGINT, v BIGINT) USING graft " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO gcat.dml.t SELECT id AS k, id AS v FROM range(10)")
    spark.sql("UPDATE gcat.dml.t SET v = v + 100 WHERE k < 3")
    spark.sql("DELETE FROM gcat.dml.t WHERE k = 9")
    Seq((3L, 333L), (10L, 1000L)).toDF("k", "v")
      .createOrReplaceTempView("dml_src")
    spark.sql("MERGE INTO gcat.dml.t t USING dml_src s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET v = s.v " +
      "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)")
    val st = spark.sql("SELECT k, v FROM gcat.dml.t ORDER BY k").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(st(0L) == 100L && st(2L) == 102L) // UPDATE
    assert(!st.contains(9L))                 // DELETE
    assert(st(3L) == 333L && st(10L) == 1000L) // MERGE
    spark.sql("OPTIMIZE gcat.dml.t"): Unit
    assert(spark.sql("DESCRIBE HISTORY gcat.dml.t").count() >= 4)
  }

  test("metadata tables (the Iceberg idiom): SELECT over " +
      "cat.ns.t.history / .detail serves the audit frames as " +
      "SQL-filterable relations") {
    wh: Unit
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.meta")
    spark.sql("CREATE TABLE gcat.meta.t (k BIGINT, v BIGINT) USING graft " +
      "PARTITIONED BY (bucket(2, k))")
    spark.sql("INSERT INTO gcat.meta.t VALUES (1, 10)") // v2
    spark.sql("INSERT INTO gcat.meta.t VALUES (2, 20)") // v3
    val hist = spark.sql(
      "SELECT version FROM gcat.meta.t.history WHERE version >= 2 " +
        "ORDER BY version")
      .collect().map(_.getLong(0)).toSeq
    assert(hist == Seq(2L, 3L))
    val det = spark.sql(
      "SELECT version, key_col, n_buckets FROM gcat.meta.t.detail").head()
    assert(det.getLong(0) == 3L && det.getString(1) == "k" &&
      det.getInt(2) == 2)
    // an unknown metadata suffix stays a missing table
    intercept[Exception] { spark.sql("SELECT * FROM gcat.meta.t.nope") }
  }

  test("ATOMIC CTAS + REPLACE TABLE AS SELECT (StagingTableCatalog): " +
      "the query writes a hidden staging table; CREATE commits by one " +
      "rename, REPLACE by one manifest swap — old versions stay " +
      "time-travelable ACROSS the redefinition; failures leave the " +
      "final table untouched and reclaim the staging dir") {
    wh: Unit
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.rtas")
    spark.sql("CREATE TABLE gcat.rtas.t USING graft " +
      "TBLPROPERTIES ('key'='k','buckets'='2') " +
      "AS SELECT id AS k, id AS v FROM range(4)")
    assert(spark.sql("SELECT sum(v) FROM gcat.rtas.t").head().getLong(0) == 6L)
    val v1 = PartitionedUpsert.manifestOrFail(spark, s"$wh/rtas/t").version
    // RTAS: redefine the table (different schema AND different key)
    spark.sql("REPLACE TABLE gcat.rtas.t USING graft " +
      "TBLPROPERTIES ('key'='name','buckets'='2') " +
      "AS SELECT concat('u', id) AS name, id * 100 AS score FROM range(3)")
    val after = spark.sql("SELECT name, score FROM gcat.rtas.t ORDER BY name")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(after == Seq(("u0", 0L), ("u1", 100L), ("u2", 200L)))
    val m = PartitionedUpsert.manifestOrFail(spark, s"$wh/rtas/t")
    assert(m.keyCol == "name", "RTAS redefines the key")
    assert(m.version == v1 + 1, "REPLACE is ONE manifest swap")
    // time travel ACROSS the redefinition reads the OLD schema+data
    assert(spark.sql(s"SELECT sum(v) FROM gcat.rtas.t VERSION AS OF $v1")
      .head().getLong(0) == 6L)
    // CREATE OR REPLACE on a missing table creates
    spark.sql("CREATE OR REPLACE TABLE gcat.rtas.fresh USING graft " +
      "TBLPROPERTIES ('key'='k') AS SELECT id AS k FROM range(2)")
    assert(spark.sql("SELECT count(*) FROM gcat.rtas.fresh")
      .head().getLong(0) == 2L)
    // a FAILING CTAS (duplicate keys violate the keyed-table contract)
    // aborts: no table appears, no staging dir leaks
    intercept[Exception] {
      spark.sql("CREATE TABLE gcat.rtas.dup USING graft " +
        "TBLPROPERTIES ('key'='k') " +
        "AS SELECT CAST(id % 2 AS BIGINT) AS k FROM range(4)")
    }
    assert(!spark.sql("SHOW TABLES IN gcat.rtas").collect()
      .map(_.getString(1)).contains("dup"))
    val staging = new org.apache.hadoop.fs.Path(s"$wh/.staging")
    val f = staging.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!f.exists(staging) || f.listStatus(staging).isEmpty,
      "aborted CTAS must reclaim its staging dir")
    // plain REPLACE TABLE on a MISSING table errors (no orCreate)
    intercept[Exception] {
      spark.sql("REPLACE TABLE gcat.rtas.nope USING graft " +
        "TBLPROPERTIES ('key'='k') AS SELECT id AS k FROM range(1)")
    }
    // .staging never leaks into SHOW NAMESPACES
    assert(!spark.sql("SHOW NAMESPACES IN gcat").collect()
      .map(_.getString(0)).exists(_.startsWith(".")))
  }

  test("the change feed by NAME (r17): the `t.changes` metadata table " +
      "serves batch CDF windows and the streaming tail " +
      "(startingVersion=snapshot); a PLAIN readStream.table keeps the " +
      "documented refusal with the paved pointer") {
    wh: Unit
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.cdf")
    spark.sql("CREATE TABLE gcat.cdf.t (k BIGINT, v BIGINT) USING graft " +
      "PARTITIONED BY (bucket(2, k))")
    spark.sql("INSERT INTO gcat.cdf.t VALUES (1, 10), (2, 20)") // v2
    spark.sql("UPDATE gcat.cdf.t SET v = 11 WHERE k = 1")       // v3
    // batch CDF window by name
    val win = spark.read.option("startingVersion", "2")
      .table("gcat.cdf.t.changes")
      .select("k", "change_type", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq.sorted
    assert(win == Seq((1L, "update", 11L)))
    // streaming tail by name, snapshot-start
    val base = java.nio.file.Files.createTempDirectory("graft_cdf_name").toString
    val q = spark.readStream
      .option("startingVersion", "snapshot").table("gcat.cdf.t.changes")
      .writeStream.format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    q.processAllAvailable()
    spark.sql("DELETE FROM gcat.cdf.t WHERE k = 2") // v4, while live
    q.processAllAvailable()
    q.stop()
    val rows = spark.read.parquet(s"$base/out")
      .select("k", "change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(rows == Seq((1L, "insert"), (2L, "delete"), (2L, "insert")),
      s"snapshot (2 inserts) + tail (1 delete), got $rows")
    // plain streaming read: the documented refusal, with the pointer
    val e = intercept[Exception] {
      val qq = spark.readStream.table("gcat.cdf.t")
        .writeStream.format("parquet")
        .option("path", s"$base/out2")
        .option("checkpointLocation", s"$base/ckpt2")
        .start()
      try qq.processAllAvailable() finally qq.stop()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Seq(Option(x.getMessage).getOrElse("")) ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("readChangeFeed")), msgs(e).mkString("~"))
  }

  test("df.writeTo(t).overwrite(cond) — replace-where (r17): exactly " +
      "the matching slice is replaced by the batch in ONE atomic " +
      "merge commit; unmatched rows untouched; a batch row " +
      "re-inserting a matched key wins") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    wh: Unit
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ow")
    spark.sql("CREATE TABLE gcat.ow.t (k BIGINT, v BIGINT, seg STRING) " +
      "USING graft PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO gcat.ow.t VALUES " +
      "(1, 10, 'A'), (2, 20, 'A'), (3, 30, 'B'), (4, 40, 'B')")
    val v = PartitionedUpsert.manifestOrFail(spark, s"$wh/ow/t").version
    // replace the seg='A' slice: k=1 re-inserted with a new value,
    // k=2 vanishes, k=9 is new
    Seq((1L, 111L, "A"), (9L, 90L, "A")).toDF("k", "v", "seg")
      .writeTo("gcat.ow.t").overwrite(col("seg") === "A")
    val st = spark.sql("SELECT k, v FROM gcat.ow.t ORDER BY k").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(st == Map(1L -> 111L, 3L -> 30L, 4L -> 40L, 9L -> 90L))
    assert(PartitionedUpsert.manifestOrFail(spark, s"$wh/ow/t").version
      == v + 1, "replace-where is ONE commit — no torn middle version")
    // CONSTRAINT CHECK (ADVICE r17, Delta replaceWhere parity): a
    // batch row that does NOT satisfy the condition would modify rows
    // outside the replaced slice — executor-raised error, and the
    // failed statement moves nothing (k=3 keeps its value)
    val ec = intercept[Exception] {
      Seq((5L, 50L, "A"), (3L, 333L, "B")).toDF("k", "v", "seg")
        .writeTo("gcat.ow.t").overwrite(col("seg") === "A")
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Seq(Option(x.getMessage).getOrElse("")) ++ msgs(x.getCause))
    assert(msgs(ec).exists(_.contains("does not satisfy the overwrite")),
      msgs(ec).mkString("~"))
    val after = spark.sql("SELECT v FROM gcat.ow.t WHERE k = 3")
      .head().getLong(0)
    assert(after == 30L, "failed replace-where must not have landed")
    // NULL condition values count as not-satisfying (three-valued
    // logic must not let NULL rows slip outside the slice)
    val en = intercept[Exception] {
      Seq((6L, 60L, null.asInstanceOf[String])).toDF("k", "v", "seg")
        .writeTo("gcat.ow.t").overwrite(col("seg") === "A")
    }
    assert(msgs(en).exists(_.contains("does not satisfy the overwrite")),
      msgs(en).mkString("~"))
  }

  test("SHOW CREATE TABLE + COMMENTs (r18): the emitted DDL " +
      "re-creates an equivalent table; COMMENT ON TABLE and ALTER " +
      "COLUMN COMMENT are metadata-only commits that never read as " +
      "schema changes (CDF one-era rule safe)") {
    wh: Unit
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.sct")
    spark.sql("CREATE TABLE gcat.sct.t (k BIGINT COMMENT 'the key', " +
      "v BIGINT) USING graft PARTITIONED BY (bucket(4, k)) " +
      "COMMENT 'demo table'")
    val m1 = PartitionedUpsert.manifestOrFail(spark, s"$wh/sct/t")
    assert(m1.comment.contains("demo table"))
    assert(m1.colComments.get("k").contains("the key"))
    val ddl = spark.sql("SHOW CREATE TABLE gcat.sct.t")
      .head().getString(0)
    assert(ddl.contains("graft"), ddl)
    assert(ddl.contains("demo table"), ddl)
    assert(ddl.contains("the key"), ddl)
    // the DDL re-creates an equivalent table under a new name
    val ddl2 = ddl.replace("gcat.sct.t", "gcat.sct.t2")
    assert(ddl2 != ddl, s"could not rename in: $ddl")
    spark.sql(ddl2)
    val m2 = PartitionedUpsert.manifestOrFail(spark, s"$wh/sct/t2")
    assert(m2.keyCol == "k" && m2.nBuckets == 4)
    assert(m2.schema.fieldNames.toSeq == Seq("k", "v"))
    assert(m2.comment.contains("demo table"))
    assert(m2.colComments.get("k").contains("the key"))
    // comment edits: metadata-only, schema bytes untouched
    spark.sql("COMMENT ON TABLE gcat.sct.t IS 'better words'")
    spark.sql("ALTER TABLE gcat.sct.t ALTER COLUMN v COMMENT 'cents'")
    val m3 = PartitionedUpsert.manifestOrFail(spark, s"$wh/sct/t")
    assert(m3.comment.contains("better words"))
    assert(m3.colComments.get("v").contains("cents"))
    assert(m3.schema.json == m1.schema.json,
      "a doc edit must never read as a schema change")
    assert(m3.buckets == m1.buckets, "metadata-only: no data moved")
    // user TBLPROPERTIES (r18): stored + rendered, never interpreted
    spark.sql("ALTER TABLE gcat.sct.t SET TBLPROPERTIES ('team'='data'," +
      " 'pipeline.stage'='gold')")
    val m4 = PartitionedUpsert.manifestOrFail(spark, s"$wh/sct/t")
    assert(m4.props == Map("team" -> "data", "pipeline.stage" -> "gold"))
    assert(m4.schema.json == m1.schema.json && m4.buckets == m1.buckets,
      "SET TBLPROPERTIES is metadata-only")
    val ddl3 = spark.sql("SHOW CREATE TABLE gcat.sct.t").head().getString(0)
    assert(ddl3.contains("team") && ddl3.contains("data"), ddl3)
    spark.sql("ALTER TABLE gcat.sct.t UNSET TBLPROPERTIES ('team')")
    assert(PartitionedUpsert.manifestOrFail(spark, s"$wh/sct/t")
      .props == Map("pipeline.stage" -> "gold"))
    // graft-reserved attributes can never be shadowed by a property
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gcat.sct.t SET TBLPROPERTIES ('key'='v')")
    }
    assert(e.getMessage.contains("reserved graft table attribute"),
      e.getMessage)
  }

  test("ALTER TABLE ... ADD COLUMN ... DEFAULT by NAME (r18): " +
      "metadata-only existing-default — pre-add rows read the " +
      "default through SQL, post-add inserts keep their own values") {
    wh: Unit
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.dflt")
    spark.sql("CREATE TABLE gcat.dflt.t (k BIGINT, v BIGINT) " +
      "USING graft PARTITIONED BY (bucket(2, k))")
    spark.sql("INSERT INTO gcat.dflt.t VALUES (1, 10), (2, 20)")
    val pathsBefore = PartitionedUpsert
      .manifestOrFail(spark, s"$wh/dflt/t").buckets
    spark.sql("ALTER TABLE gcat.dflt.t ADD COLUMN tier BIGINT DEFAULT 7")
    val m = PartitionedUpsert.manifestOrFail(spark, s"$wh/dflt/t")
    assert(m.buckets == pathsBefore, "metadata-only: no data moved")
    assert(m.defaults.map(_.col) == Seq("tier"))
    val got = spark.sql(
      "SELECT k, tier FROM gcat.dflt.t ORDER BY k").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == Map(1L -> Some(7L), 2L -> Some(7L)))
    // predicates on the defaulted column see the filled values
    assert(spark.sql(
      "SELECT count(*) FROM gcat.dflt.t WHERE tier = 7")
      .head().getLong(0) == 2L)
    // post-add insert keeps its own value
    spark.sql("INSERT INTO gcat.dflt.t VALUES (3, 30, 9)")
    val t3 = spark.sql("SELECT tier FROM gcat.dflt.t WHERE k = 3")
      .head().getLong(0)
    assert(t3 == 9L)
  }

  test("SHALLOW CLONE by NAME (r18): a dst under the graft catalog " +
      "resolves to the catalog's own layout — no LOCATION, no " +
      "registration step; version pins work; divergence is " +
      "copy-on-write") {
    wh: Unit
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.cl")
    spark.sql("CREATE TABLE gcat.cl.t (k BIGINT, v BIGINT) USING graft " +
      "PARTITIONED BY (bucket(2, k))")
    spark.sql("INSERT INTO gcat.cl.t VALUES (1, 10), (2, 20)") // v2
    spark.sql("INSERT INTO gcat.cl.t VALUES (1, 11)")          // v3
    spark.sql("CREATE TABLE gcat.cl.t2 SHALLOW CLONE gcat.cl.t")
    val got = spark.sql("SELECT k, v FROM gcat.cl.t2 ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 11L), (2L, 20L)))
    // metadata-only: the clone's manifest borrows, moves no data
    val mc = PartitionedUpsert.manifestOrFail(spark, s"$wh/cl/t2")
    assert(mc.buckets.values.forall(_.startsWith("ext:")),
      s"a fresh shallow clone borrows everything: ${mc.buckets}")
    // pinned clone sees the pre-update era
    spark.sql("CREATE TABLE gcat.cl.t2v2 SHALLOW CLONE gcat.cl.t " +
      "VERSION AS OF 2")
    assert(spark.sql("SELECT v FROM gcat.cl.t2v2 WHERE k = 1")
      .head().getLong(0) == 10L)
    // divergence is copy-on-write: updating the clone leaves the
    // source untouched
    spark.sql("UPDATE gcat.cl.t2 SET v = 99 WHERE k = 2")
    assert(spark.sql("SELECT v FROM gcat.cl.t WHERE k = 2")
      .head().getLong(0) == 20L)
    assert(spark.sql("SELECT v FROM gcat.cl.t2 WHERE k = 2")
      .head().getLong(0) == 99L)
    // a dst under NO graft catalog still needs LOCATION, loudly
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE plain_clone SHALLOW CLONE gcat.cl.t")
    }
    assert(e.getMessage.contains("LOCATION"), e.getMessage)
    // a backtick-quoted dst segment CONTAINING DOTS resolves through
    // Spark's multipart parser to the catalog's own layout (r18
    // ADVICE: a raw '.' split resolved g.`a.b` to <wh>/a/b — a dir
    // loadTable never looks at, silently losing the clone)
    spark.sql("CREATE TABLE gcat.cl.`dotted.name` SHALLOW CLONE gcat.cl.t")
    assert(spark.sql("SELECT count(*) FROM gcat.cl.`dotted.name`")
      .head().getLong(0) == 2L,
      "the quoted-dot clone must be addressable by its name")
    assert(new java.io.File(s"$wh/cl/dotted.name/_manifests").exists,
      "the clone must land in the catalog's own layout dir")
  }

  test("staged CREATE refuses a leftover non-table directory at the " +
      "target instead of renaming the staging dir INSIDE it " +
      "(ADVICE r17 — the HDFS rename-into-existing-dir trap)") {
    wh: Unit
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.lft")
    // simulate a crashed earlier init: data-ish dir, no manifest
    val leftover = new java.io.File(s"$wh/lft/t")
    assert(leftover.mkdirs())
    assert(new java.io.File(leftover, "data").mkdirs())
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE gcat.lft.t USING graft " +
        "TBLPROPERTIES ('key'='k','buckets'='2') " +
        "AS SELECT id AS k, id AS v FROM range(3)")
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Seq(Option(x.getMessage).getOrElse("")) ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("holds no committed manifest")),
      msgs(e).mkString("~"))
    // the staging dir did NOT land inside the leftover, and the
    // leftover itself is untouched (remove-and-retry is the user's
    // explicit call, not the catalog's)
    assert(leftover.listFiles().map(_.getName).toSeq == Seq("data"))
    // after the user removes the leftover, the same CREATE succeeds
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(leftover)
    spark.sql("CREATE TABLE gcat.lft.t USING graft " +
      "TBLPROPERTIES ('key'='k','buckets'='2') " +
      "AS SELECT id AS k, id AS v FROM range(3)")
    assert(spark.sql("SELECT count(*) FROM gcat.lft.t").head().getLong(0)
      == 3L)
  }

  test("ALTER TABLE by name: ADD COLUMNS (metadata-only), catalog-path " +
      "RENAME COLUMN via TableCatalog.alterTable, RENAME TO as one " +
      "filesystem move (relative manifests pay off)") {
    wh: Unit
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ddl")
    spark.sql("CREATE TABLE gcat.ddl.t (k BIGINT, v BIGINT) USING graft " +
      "PARTITIONED BY (bucket(2, k))")
    spark.sql("INSERT INTO gcat.ddl.t VALUES (1, 10)")
    spark.sql("ALTER TABLE gcat.ddl.t ADD COLUMNS (extra BIGINT)")
    assert(spark.sql("SELECT extra FROM gcat.ddl.t").head().isNullAt(0))
    spark.sql("ALTER TABLE gcat.ddl.t RENAME COLUMN v TO val")
    assert(spark.sql("SELECT val FROM gcat.ddl.t").head().getLong(0) == 10L)
    spark.sql("ALTER TABLE gcat.ddl.t RENAME TO ddl.t2")
    assert(spark.sql("SELECT val FROM gcat.ddl.t2").head().getLong(0) == 10L)
    intercept[Exception] { spark.sql("SELECT * FROM gcat.ddl.t") }
    // SET TBLPROPERTIES stores (r18 — no longer refused); truly
    // unsupported ALTER shapes still error loudly
    spark.sql("ALTER TABLE gcat.ddl.t2 SET TBLPROPERTIES ('a'='b')")
    assert(PartitionedUpsert.manifestOrFail(spark, s"$wh/ddl/t2")
      .props == Map("a" -> "b"))
  }
}
