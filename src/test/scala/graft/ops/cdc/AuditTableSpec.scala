package graft.ops.cdc

import graft.SparkSpec

/** FSCK-style integrity audit: manifest-vs-filesystem consistency,
  * including the documented clone source-vacuum hazard. */
class AuditTableSpec extends SparkSpec {

  private def issues(dir: String): Seq[(String, String)] =
    PartitionedUpsert.auditTable(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(2))).toSeq

  test("healthy table audits clean; a deleted bucket dir reports " +
      "missing_data; a clone whose source vacuumed away reports " +
      "missing borrows; crashed staging reports orphaned_staging") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_audit").toString
    PartitionedUpsert.init(
      (1L to 12L).map(k => (k, k)).toDF("k", "v"), src, "k", 4)
    assert(issues(src).isEmpty, "fresh table must audit clean")
    // a crashed prepare leaves an unreferenced staging dir
    val pending = PartitionedUpsert.prepare(spark, src,
      Seq((1L, 1L, "u", 99L)).toDF("lsn", "k", "op", "v"),
      "k", "lsn", "op", Seq("v"), 4)
    assert(issues(src).exists(_._1 == "orphaned_staging"))
    PartitionedUpsert.commit(spark, src, pending)
    assert(issues(src).isEmpty, "committed: staging now referenced")
    // clone, then destroy the source: every borrow reports missing
    val dst = java.nio.file.Files.createTempDirectory("graft_audit_c").toString
    val fs = new org.apache.hadoop.fs.Path(dst).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dst), true)
    PartitionedUpsert.clone(spark, src, dst)
    assert(issues(dst).isEmpty, "live source: clone audits clean")
    fs.delete(new org.apache.hadoop.fs.Path(s"$src/data"), true)
    val broken = issues(dst)
    assert(broken.nonEmpty && broken.forall(_._1 == "missing_data"),
      s"vacuumed-away source must surface as missing borrows, got $broken")
  }
}
