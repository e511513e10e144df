package graft.ops.cdc

import graft.SparkSpec

/** `DESCRIBE DETAIL` — one-row current-state summary: footprint,
  * layout, merge-on-read debt, clone borrows, constraints. */
class DescribeDetailSpec extends SparkSpec {

  test("detail surfaces footprint, MOR debt, borrows, and " +
      "constraints through API and SQL") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_detail").toString
    PartitionedUpsert.init(
      (1L to 10L).map(k => (k, k)).toDF("k", "v"), dir, "k", 4)
    PartitionedUpsert.addCheckConstraint(spark, dir, "v_pos", "v > 0")
    PartitionedUpsert.deleteMor(spark, dir, Seq(3L).toDF("k"), "k")
    val d = PartitionedUpsert.detailDf(spark, dir).head()
    assert(d.getAs[Long]("version") == 3L) // init + constraint + delete
    assert(d.getAs[String]("format") == "graft")
    assert(d.getAs[String]("key_col") == "k")
    assert(d.getAs[Int]("n_buckets") == 4)
    assert(d.getAs[Long]("files") > 0L && d.getAs[Long]("bytes") > 0L)
    assert(d.getAs[Long]("tombstone_sidecars") == 1L)
    assert(d.getAs[Long]("tombstone_bytes") > 0L)
    assert(d.getAs[Long]("borrowed_buckets") == 0L)
    assert(d.getAs[String]("check_constraints").contains("v_pos: v > 0"))
    // a fresh clone: every bucket borrowed, zero local debt
    val dst = java.nio.file.Files.createTempDirectory("graft_detail_c").toString
    new org.apache.hadoop.fs.Path(dst)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(dst), true)
    PartitionedUpsert.clone(spark, dir, dst)
    val c = PartitionedUpsert.detailDf(spark, dst).head()
    assert(c.getAs[Long]("borrowed_buckets") ==
      c.getAs[Int]("populated_buckets").toLong)
    // SQL face
    val tbl = s"graft_detail_t_${math.abs(dir.hashCode)}"
    spark.sql(s"CREATE TABLE $tbl USING graft LOCATION '$dir'")
    try {
      val row = spark.sql(s"DESCRIBE DETAIL $tbl").head()
      assert(row.getAs[Long]("tombstone_sidecars") == 1L)
      assert(row.getAs[String]("check_constraints").contains("v_pos"))
      // every other DESCRIBE flavor stays Spark's
      assert(spark.sql(s"DESCRIBE TABLE $tbl").count() > 0)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }
}
