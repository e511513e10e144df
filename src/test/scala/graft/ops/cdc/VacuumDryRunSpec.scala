package graft.ops.cdc

import graft.SparkSpec

/** `VACUUM … DRY RUN` — preview the reclaim set without deleting;
  * the plan and the real vacuum share one computation. */
class VacuumDryRunSpec extends SparkSpec {

  test("dry run lists exactly what the real vacuum then deletes, " +
      "and deletes nothing itself; SQL face returns path rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_vdr").toString
    PartitionedUpsert.init(
      (1L to 8L).map(k => (k, k)).toDF("k", "v"), dir, "k", 2)
    PartitionedUpsert.merge(spark, dir,
      Seq((1L, 1L, "u", 9L)).toDF("lsn", "k", "op", "v"),
      "k", "lsn", "op", Seq("v"), 2) // v2: v1's touched staging now unreachable
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val plan = PartitionedUpsert.vacuumPlan(spark, dir,
      keepManifests = 1, minStagingAgeMs = 0L)
    assert(plan.nonEmpty, "superseded manifest + unreachable staging expected")
    plan.foreach(p => assert(fs.exists(new org.apache.hadoop.fs.Path(p)),
      s"dry run must not delete: $p"))
    // SQL face: path rows out, still nothing deleted
    val tbl = s"graft_vdr_t_${math.abs(dir.hashCode)}"
    spark.sql(s"CREATE TABLE $tbl USING graft LOCATION '$dir'")
    try {
      val sqlPaths = spark.sql(s"VACUUM $tbl KEEP 1 RETAIN 0 DRY RUN")
        .collect().map(_.getString(0)).toSeq
      assert(sqlPaths.sorted == plan.sorted)
      plan.foreach(p => assert(fs.exists(new org.apache.hadoop.fs.Path(p))))
      // the real vacuum removes exactly the planned set
      spark.sql(s"VACUUM $tbl KEEP 1 RETAIN 0")
      plan.foreach(p => assert(!fs.exists(new org.apache.hadoop.fs.Path(p)),
        s"planned victim survived the real vacuum: $p"))
      assert(PartitionedUpsert.read(spark, dir).count() == 8L)
      // cross-verb keywords are rejected, not silently misread:
      // OPTIMIZE has no DRY RUN (it would compact FOR REAL), VACUUM
      // has no MAXFILES (it was applied as KEEP)
      val e1 = intercept[Exception] { spark.sql(s"OPTIMIZE $tbl DRY RUN") }
      assert(e1.getMessage.contains("DRY") ||
        e1.getMessage.contains("unexpected trailing"))
      val e2 = intercept[Exception] { spark.sql(s"VACUUM $tbl MAXFILES 3") }
      assert(e2.getMessage.contains("MAXFILES") ||
        e2.getMessage.contains("unexpected trailing"))
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }
}
