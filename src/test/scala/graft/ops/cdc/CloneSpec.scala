package graft.ops.cdc

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** SHALLOW CLONE — metadata-only table fork with copy-on-write
  * divergence, vacuum isolation, and `localize` severance. */
class CloneSpec extends SparkSpec {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_clone_$tag").toString

  private def fixture(tag: String): String = {
    import spark.implicits._
    val dir = tmp(tag)
    PartitionedUpsert.init(
      (1L to 12L).map(k => (k, k * 10L)).toDF("k", "v"), dir, "k", 4)
    dir
  }

  private def rows(df: DataFrame): Seq[(Long, Long)] =
    df.orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  private def fs(dir: String) =
    new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)

  test("clone reads the source's rows through ext borrows with ZERO " +
      "data bytes under the clone; stats carry; version pin forks " +
      "from history; existing-target and both-pins rejected") {
    import spark.implicits._
    val src = fixture("basic")
    PartitionedUpsert.merge(spark, src,
      Seq((100L, 1L, "u", 111L)).toDF("lsn", "k", "op", "v"),
      "k", "lsn", "op", Seq("v"), 4) // src v2
    val dst = tmp("basic_dst")
    fs(dst).delete(new org.apache.hadoop.fs.Path(dst), true)
    PartitionedUpsert.clone(spark, src, dst)
    assert(rows(PartitionedUpsert.read(spark, dst)) ==
      rows(PartitionedUpsert.read(spark, src)))
    // metadata only: no data/ directory exists under the clone
    assert(!fs(dst).exists(new org.apache.hadoop.fs.Path(s"$dst/data")))
    val m = PartitionedUpsert.manifestOrFail(spark, dst)
    assert(m.version == 1L && m.txns.isEmpty)
    assert(m.buckets.values.forall(_.startsWith("ext:")))
    assert(m.stats.nonEmpty, "write-time stats carry to the clone")
    // fork from history: v1 pin sees the pre-merge state
    val dstV1 = tmp("basic_dst_v1")
    fs(dstV1).delete(new org.apache.hadoop.fs.Path(dstV1), true)
    PartitionedUpsert.clone(spark, src, dstV1, versionAsOf = Some(1L))
    assert(rows(PartitionedUpsert.read(spark, dstV1)) ==
      rows(PartitionedUpsert.readVersion(spark, src, 1L)))
    intercept[IllegalStateException] {
      PartitionedUpsert.clone(spark, src, dst)
    }
    intercept[IllegalArgumentException] {
      PartitionedUpsert.clone(spark, src, tmp("bp"),
        versionAsOf = Some(1L), timestampAsOf = Some(1L))
    }
    // timestamp pin: same floor rule as readTimestamp (mtimes pinned
    // for determinism, the TimeTravelSpec discipline)
    Seq(1L -> 1000L, 2L -> 2000L).foreach { case (v, ts) =>
      fs(src).setTimes(new org.apache.hadoop.fs.Path(
        s"$src/_manifests/v%020d.manifest".format(v)), ts, ts)
    }
    val dstTs = tmp("basic_dst_ts")
    fs(dstTs).delete(new org.apache.hadoop.fs.Path(dstTs), true)
    PartitionedUpsert.clone(spark, src, dstTs, timestampAsOf = Some(1500L))
    assert(rows(PartitionedUpsert.read(spark, dstTs)) ==
      rows(PartitionedUpsert.readVersion(spark, src, 1L)))
  }

  test("copy-on-write: a merge on the clone rewrites ONLY its " +
      "touched buckets locally, the source never changes, and the " +
      "untouched buckets keep borrowing") {
    import spark.implicits._
    val src = fixture("cow")
    val srcRows = rows(PartitionedUpsert.read(spark, src))
    val dst = tmp("cow_dst")
    fs(dst).delete(new org.apache.hadoop.fs.Path(dst), true)
    PartitionedUpsert.clone(spark, src, dst)
    PartitionedUpsert.merge(spark, dst,
      Seq((100L, 3L, "u", 333L), (101L, 99L, "i", 990L))
        .toDF("lsn", "k", "op", "v"),
      "k", "lsn", "op", Seq("v"), 4)
    val dstRows = rows(PartitionedUpsert.read(spark, dst)).toMap
    assert(dstRows.get(3L).contains(333L) && dstRows.get(99L).contains(990L))
    assert(rows(PartitionedUpsert.read(spark, src)) == srcRows,
      "the source is isolated from clone writes")
    val m = PartitionedUpsert.manifestOrFail(spark, dst)
    val (local, borrowed) = m.buckets.values.partition(!_.startsWith("ext:"))
    assert(local.nonEmpty && borrowed.nonEmpty,
      "touched buckets localized, untouched ones still borrow")
    // MOR delete over a still-borrowed bucket: local sidecar, source
    // untouched
    val hidden = srcRows.map(_._1).find(k =>
      !dstRows.contains(k) || dstRows(k) == k * 10L).get
    PartitionedUpsert.deleteMor(spark, dst,
      Seq(hidden).toDF("k"), "k")
    assert(!rows(PartitionedUpsert.read(spark, dst)).toMap.contains(hidden))
    assert(rows(PartitionedUpsert.read(spark, src)) == srcRows)
  }

  test("the clone's vacuum never touches the source; localize severs " +
      "the borrow so the clone survives source deletion") {
    import spark.implicits._
    val src = fixture("sever")
    val srcRows = rows(PartitionedUpsert.read(spark, src))
    val dst = tmp("sever_dst")
    fs(dst).delete(new org.apache.hadoop.fs.Path(dst), true)
    PartitionedUpsert.clone(spark, src, dst)
    // aggressive vacuum on the clone: reclaims nothing it doesn't own
    PartitionedUpsert.vacuum(spark, dst, keepManifests = 1,
      minStagingAgeMs = 0L)
    assert(rows(PartitionedUpsert.read(spark, src)) == srcRows)
    assert(rows(PartitionedUpsert.read(spark, dst)) == srcRows)
    // sever: every borrowed bucket rewrites locally, ONE version
    val localized = PartitionedUpsert.localize(spark, dst)
    assert(localized.nonEmpty)
    val m = PartitionedUpsert.manifestOrFail(spark, dst)
    assert(m.buckets.values.forall(!_.startsWith("ext:")))
    assert(PartitionedUpsert.localize(spark, dst).isEmpty,
      "already independent: no version burn")
    // the source can now disappear entirely — the clone still reads
    fs(src).delete(new org.apache.hadoop.fs.Path(src), true)
    assert(rows(PartitionedUpsert.read(spark, dst)) == srcRows)
  }

  test("CREATE TABLE … SHALLOW CLONE … through the injected parser: " +
      "catalog-registered graft clone, DSv2 read, version pin, " +
      "LOCATION required, ordinary CREATE untouched") {
    import spark.implicits._
    val src = fixture("sql")
    val srcTbl = s"graft_clone_src_${math.abs(src.hashCode)}"
    spark.sql(s"CREATE TABLE $srcTbl USING graft LOCATION '$src'")
    val dst = tmp("sql_dst")
    fs(dst).delete(new org.apache.hadoop.fs.Path(dst), true)
    val dstTbl = s"graft_clone_dst_${math.abs(dst.hashCode)}"
    try {
      spark.sql(
        s"CREATE TABLE $dstTbl SHALLOW CLONE $srcTbl LOCATION '$dst'")
      assert(rows(spark.table(dstTbl)) ==
        rows(PartitionedUpsert.read(spark, src)))
      // UPDATE through the SQL face writes locally, source isolated
      spark.sql(s"UPDATE $dstTbl SET v = v + 1 WHERE k <= 2")
      assert(rows(spark.table(dstTbl)).toMap.get(1L).contains(11L))
      assert(rows(PartitionedUpsert.read(spark, src))
        .toMap.get(1L).contains(10L))
      // LOCATION required
      val e = intercept[Exception] {
        spark.sql(s"CREATE TABLE ${dstTbl}_x SHALLOW CLONE $srcTbl")
      }
      assert(e.getMessage.contains("LOCATION"))
      // ordinary CREATE statements bypass the intercept entirely
      spark.sql(s"CREATE TABLE ${dstTbl}_plain (a INT) USING parquet " +
        s"LOCATION '${tmp("plain")}'")
      spark.sql(s"DROP TABLE ${dstTbl}_plain")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $dstTbl")
      spark.sql(s"DROP TABLE IF EXISTS $srcTbl")
    }
  }
}
