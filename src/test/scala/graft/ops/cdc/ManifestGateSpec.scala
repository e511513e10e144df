package graft.ops.cdc

import graft.SparkSpec

/** Manifest protocol gate: feature-bearing manifests (tombstones,
  * clone borrows, constraints) lead with a `!requires` line so a
  * reader that cannot honor them fails LOUDLY instead of silently
  * resurrecting deleted rows or dropping constraints. */
class ManifestGateSpec extends SparkSpec {

  private def manifestText(dir: String): String = {
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val mdir = new org.apache.hadoop.fs.Path(s"$dir/_manifests")
    val latest = fs.listStatus(mdir).map(_.getPath)
      .filter(_.getName.endsWith(".manifest")).maxBy(_.getName)
    val in = fs.open(latest)
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  test("feature-free manifests carry no gate (byte-compatible with " +
      "older readers); tombstoned manifests gate; a purge lifts it; " +
      "a future gate fails loudly; an old reader cannot parse a " +
      "gated head as a schema") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_gate").toString
    PartitionedUpsert.init(
      (1L to 8L).map(k => (k, k)).toDF("k", "v"), dir, "k", 2)
    assert(!manifestText(dir).startsWith("!requires"),
      "a plain table must stay back-compatible")
    PartitionedUpsert.deleteMor(spark, dir, Seq(3L).toDF("k"), "k")
    val gated = manifestText(dir)
    assert(gated.startsWith("!requires\t2"))
    // old-reader simulation: line 1 is no longer schema JSON — the
    // pre-gate parser dies at the very first step, loudly
    intercept[Exception] {
      org.apache.spark.sql.types.DataType.fromJson(gated.split('\n').head)
    }
    // current reader still round-trips the gated manifest
    assert(PartitionedUpsert.read(spark, dir).count() == 7L)
    // purge retires the features → the gate lifts
    PartitionedUpsert.purgeTombstones(spark, dir)
    assert(!manifestText(dir).startsWith("!requires"))
    // a FUTURE gate refuses with an upgrade message
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val m = PartitionedUpsert.manifestOrFail(spark, dir)
    val p = new org.apache.hadoop.fs.Path(
      s"$dir/_manifests/v%020d.manifest".format(m.version + 1))
    val out = fs.create(p, false)
    out.write(("!requires\t99\n" + manifestText(dir)).getBytes("UTF-8"))
    out.close()
    val e = intercept[IllegalArgumentException] {
      PartitionedUpsert.read(spark, dir)
    }
    assert(e.getMessage.contains("requires reader version 99"))
  }

  test("a user column named 'bucket' is rejected at commit — it is " +
      "the engine's internal partition column and a rewrite would " +
      "silently overwrite it (r17 guard at writeManifest, all faces)") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bucket_col").toString
    val e = intercept[IllegalArgumentException] {
      PartitionedUpsert.init(
        Seq((1L, 2L)).toDF("k", "bucket"), dir, "k", 2)
    }
    assert(e.getMessage.contains("'bucket'"))
    // nothing committed: the dir holds no manifest
    assert(PartitionedUpsert.currentManifest(spark, dir).isEmpty)
  }
}
