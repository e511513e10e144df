package graft.sources

import graft.SparkSpec
import graft.ops.cdc.PartitionedUpsert

/** CREATE-time and ALTER-time column DEFAULTs (r19, r18 ADVICE): the
  * catalog declares SUPPORT_COLUMN_DEFAULT_VALUE, so Spark parses
  * `c INT DEFAULT <lit>` — the manifest records the literal as the
  * INSERT-time (CURRENT_DEFAULT) face and the table serves it back as
  * field metadata, which is the channel Spark's analyzer reads to
  * fill INSERTs that omit the column or write the DEFAULT keyword.
  * Before this, a CREATE-time default was silently discarded. */
class CreateDefaultSpec extends SparkSpec {

  private lazy val wh: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_dflt_wh").toString
    spark.conf.set("spark.sql.catalog.gdef", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdef.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdef.ns")
    dir
  }

  test("CREATE TABLE … DEFAULT: recorded in the manifest; INSERT " +
      "omitting the column and the DEFAULT keyword both fill it; an " +
      "explicit value wins") {
    wh: Unit
    spark.sql("CREATE TABLE gdef.ns.t (k BIGINT, v INT DEFAULT 7, " +
      "tag STRING DEFAULT 'none') USING graft " +
      "PARTITIONED BY (bucket(2, k))")
    val m = PartitionedUpsert.manifestOrFail(spark, s"$wh/ns/t")
    assert(m.insertDefaults == Map("v" -> "7", "tag" -> "'none'"),
      s"CREATE-time defaults must be recorded, got ${m.insertDefaults}")
    spark.sql("INSERT INTO gdef.ns.t (k) VALUES (1)")
    spark.sql("INSERT INTO gdef.ns.t VALUES (2, DEFAULT, DEFAULT)")
    spark.sql("INSERT INTO gdef.ns.t VALUES (3, 30, 'real')")
    val got = spark.sql(
      "SELECT k, v, tag FROM gdef.ns.t ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    assert(got == Seq((1L, 7, "none"), (2L, 7, "none"), (3L, 30, "real")))
  }

  test("ALTER ADD COLUMN … DEFAULT sets BOTH faces: pre-existing rows " +
      "read the default (the r18 pre-map) AND a later INSERT omitting " +
      "the column fills it (the r19 insert face)") {
    wh: Unit
    spark.sql("CREATE TABLE gdef.ns.a (k BIGINT, v INT) USING graft " +
      "PARTITIONED BY (bucket(2, k))")
    spark.sql("INSERT INTO gdef.ns.a VALUES (1, 10)")
    spark.sql("ALTER TABLE gdef.ns.a ADD COLUMN w INT DEFAULT 5")
    val m = PartitionedUpsert.manifestOrFail(spark, s"$wh/ns/a")
    assert(m.insertDefaults == Map("w" -> "5"))
    assert(m.defaults.exists(d => d.col == "w" && d.litSql == "5"))
    spark.sql("INSERT INTO gdef.ns.a (k, v) VALUES (2, 20)")
    val got = spark.sql("SELECT k, v, w FROM gdef.ns.a ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    assert(got == Seq((1L, 10, 5), (2L, 20, 5)))
  }

  test("an invalid CREATE-time default refuses LOUDLY and leaves no " +
      "half-made table; non-literal and non-deterministic defaults " +
      "refuse; CTAS cannot carry defaults (no column list) — sanity") {
    wh: Unit
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE gdef.ns.bad (k BIGINT, v INT DEFAULT " +
        "'not_an_int') USING graft PARTITIONED BY (bucket(2, k))")
    }
    assert(e.getMessage.toLowerCase.contains("default") ||
      e.getMessage.toLowerCase.contains("cast"), e.getMessage)
    assert(!new java.io.File(s"$wh/ns/bad/_manifests").exists,
      "a refused CREATE must not leave a half-made table")
    val e2 = intercept[Exception] {
      spark.sql("CREATE TABLE gdef.ns.bad2 (k BIGINT, v DOUBLE DEFAULT " +
        "rand()) USING graft PARTITIONED BY (bucket(2, k))")
    }
    assert(e2.getMessage.toLowerCase.contains("deterministic") ||
      e2.getMessage.toLowerCase.contains("default"), e2.getMessage)
    assert(!new java.io.File(s"$wh/ns/bad2/_manifests").exists)
  }

  test("defaults follow their column through ALTER rename and drop; " +
      "DESCRIBE/SHOW CREATE surfaces render them") {
    wh: Unit
    spark.sql("CREATE TABLE gdef.ns.r (k BIGINT, v INT DEFAULT 3) " +
      "USING graft PARTITIONED BY (bucket(2, k))")
    spark.sql("INSERT INTO gdef.ns.r VALUES (1, 1)")
    spark.sql("ALTER TABLE gdef.ns.r RENAME COLUMN v TO v2")
    val m1 = PartitionedUpsert.manifestOrFail(spark, s"$wh/ns/r")
    assert(m1.insertDefaults == Map("v2" -> "3"),
      s"default must follow the rename, got ${m1.insertDefaults}")
    spark.sql("INSERT INTO gdef.ns.r (k) VALUES (2)")
    assert(spark.sql("SELECT v2 FROM gdef.ns.r WHERE k = 2")
      .collect().head.getInt(0) == 3)
    val shown = spark.sql("SHOW CREATE TABLE gdef.ns.r")
      .collect().head.getString(0)
    assert(shown.toUpperCase.contains("DEFAULT"),
      s"SHOW CREATE must render the default clause:\n$shown")
    spark.sql("ALTER TABLE gdef.ns.r DROP COLUMN v2")
    assert(PartitionedUpsert.manifestOrFail(spark, s"$wh/ns/r")
      .insertDefaults.isEmpty, "a dropped column's default goes with it")
  }

  test("ALTER COLUMN … SET DEFAULT / DROP DEFAULT: metadata-only " +
      "commits onto the insert face; an invalid literal refuses") {
    wh: Unit
    spark.sql("CREATE TABLE gdef.ns.sd (k BIGINT, v INT) USING graft " +
      "PARTITIONED BY (bucket(2, k))")
    spark.sql("ALTER TABLE gdef.ns.sd ALTER COLUMN v SET DEFAULT 9")
    assert(PartitionedUpsert.manifestOrFail(spark, s"$wh/ns/sd")
      .insertDefaults == Map("v" -> "9"))
    spark.sql("INSERT INTO gdef.ns.sd (k) VALUES (1)")
    assert(spark.sql("SELECT v FROM gdef.ns.sd WHERE k = 1")
      .collect().head.getInt(0) == 9)
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gdef.ns.sd ALTER COLUMN v SET DEFAULT 'x'")
    }
    assert(e.getMessage.toLowerCase.contains("default") ||
      e.getMessage.toLowerCase.contains("cast"), e.getMessage)
    spark.sql("ALTER TABLE gdef.ns.sd ALTER COLUMN v DROP DEFAULT")
    assert(PartitionedUpsert.manifestOrFail(spark, s"$wh/ns/sd")
      .insertDefaults.isEmpty)
  }

  test("one ALTER applies atomically (r18 ADVICE): a refused schema " +
      "change leaves NO comment/property edits behind (the failable " +
      "evolve commits first)") {
    wh: Unit
    import org.apache.spark.sql.connector.catalog.{Identifier, TableChange}
    spark.sql("CREATE TABLE gdef.ns.at (k BIGINT, v INT) USING graft " +
      "PARTITIONED BY (bucket(2, k))")
    val cat = spark.sessionState.catalogManager.catalog("gdef")
      .asInstanceOf[GraftCatalog]
    val ident = Identifier.of(Array("ns"), "at")
    val before = PartitionedUpsert.manifestOrFail(spark, s"$wh/ns/at")
    intercept[Exception] {
      cat.alterTable(ident,
        TableChange.updateColumnComment(Array("v"), "doc text"),
        // long → int is a NARROWING — evolveSchema refuses it
        TableChange.updateColumnType(Array("k"),
          org.apache.spark.sql.types.IntegerType))
    }
    val after = PartitionedUpsert.manifestOrFail(spark, s"$wh/ns/at")
    assert(after.version == before.version &&
      after.colComments.isEmpty,
      s"a refused ALTER must apply NOTHING, got v${after.version} " +
        s"comments=${after.colComments}")
  }
}
