package graft.ops.cdc

import graft.SparkSpec

/** Manifest-recorded CHECK constraints enforced by every write path
  * (the Delta constraint statements): executor-raised guards abort a
  * violating write before anything commits. */
class CheckConstraintSpec extends SparkSpec {

  private def fixture(tag: String): String = {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft_check_$tag").toString
    PartitionedUpsert.init(
      (1L to 8L).map(k => (k, k * 10L)).toDF("k", "v"), dir, "k", 2)
    dir
  }

  private def mergeOne(dir: String, k: Long, v: Long): Seq[Long] = {
    import spark.implicits._
    PartitionedUpsert.merge(spark, dir,
      Seq((1L, k, "u", v)).toDF("lsn", "k", "op", "v"),
      "k", "lsn", "op", Seq("v"), 2)
  }

  test("ADD CONSTRAINT via SQL: a violating merge aborts with the " +
      "constraint's name and commits NOTHING; a passing merge and a " +
      "NULL check result go through; DROP CONSTRAINT re-opens the " +
      "gate") {
    val dir = fixture("sql")
    val tbl = s"graft_check_t_${math.abs(dir.hashCode)}"
    spark.sql(s"CREATE TABLE $tbl USING graft LOCATION '$dir'")
    try {
      // nullif makes v=40 evaluate NULL — the ANSI pass case
      spark.sql(
        s"ALTER TABLE $tbl ADD CONSTRAINT v_positive CHECK (nullif(v, 40) > 0)")
      val v1 = PartitionedUpsert.manifestOrFail(spark, dir).version
      val e = intercept[Exception] { mergeOne(dir, 3L, -5L) }
      assert(e.getMessage.contains("v_positive") ||
        Option(e.getCause).exists(_.getMessage.contains("v_positive")))
      assert(PartitionedUpsert.manifestOrFail(spark, dir).version == v1,
        "a violating batch must not burn a version")
      mergeOne(dir, 3L, 33L)  // passes
      mergeOne(dir, 4L, 40L)  // NULL check result: passes (ANSI)
      spark.sql(s"ALTER TABLE $tbl DROP CONSTRAINT v_positive")
      mergeOne(dir, 3L, -5L)  // gate open again
      val vals = PartitionedUpsert.read(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(vals(3L) == -5L && vals(4L) == 40L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("adding a constraint existing data violates is rejected in " +
      "one scan; duplicate names and unknown drops error; the " +
      "expression must be single-line") {
    val dir = fixture("guards")
    val e = intercept[IllegalArgumentException] {
      PartitionedUpsert.addCheckConstraint(spark, dir, "too_small", "v < 50")
    }
    assert(e.getMessage.contains("existing row violates"))
    PartitionedUpsert.addCheckConstraint(spark, dir, "v_pos", "v > 0")
    intercept[IllegalArgumentException] {
      PartitionedUpsert.addCheckConstraint(spark, dir, "V_POS", "v > 1")
    }
    intercept[IllegalArgumentException] {
      PartitionedUpsert.dropCheckConstraint(spark, dir, "nope")
    }
    intercept[IllegalArgumentException] {
      PartitionedUpsert.addCheckConstraint(spark, dir, "bad", "v >\n 0")
    }
  }

  test("rename/drop of a referenced column is blocked until the " +
      "constraint drops; unrelated evolution passes; replace() is " +
      "guarded; clones inherit constraints") {
    import spark.implicits._
    val dir = fixture("evolve")
    PartitionedUpsert.addCheckConstraint(spark, dir, "v_pos", "v > 0")
    val e1 = intercept[IllegalArgumentException] {
      PartitionedUpsert.evolveSchema(spark, dir,
        Seq(Cdc.RenameColumn("v", "w")), "k", 2)
    }
    assert(e1.getMessage.contains("v_pos"))
    // unrelated add: fine
    PartitionedUpsert.evolveSchema(spark, dir,
      Seq(Cdc.AddColumn("extra", org.apache.spark.sql.types.LongType)), "k", 2)
    // replace with a violating snapshot aborts
    intercept[Exception] {
      PartitionedUpsert.replace(
        Seq((1L, -1L, Option.empty[Long])).toDF("k", "v", "extra"), dir)
    }
    // a clone inherits the constraint and enforces it
    val dst = java.nio.file.Files
      .createTempDirectory("graft_check_clone").toString
    new org.apache.hadoop.fs.Path(dst)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(dst), true)
    PartitionedUpsert.clone(spark, dir, dst)
    assert(PartitionedUpsert.manifestOrFail(spark, dst)
      .checks.exists(_._1 == "v_pos"))
    intercept[Exception] {
      PartitionedUpsert.merge(spark, dst,
        Seq((9L, 2L, "u", -7L, Option.empty[Long]))
          .toDF("lsn", "k", "op", "v", "extra"),
        "k", "lsn", "op", Seq("v", "extra"), 2)
    }
  }

  test("a BACKTICK-quoted column reference in a constraint blocks " +
      "rename/drop like a bare one (r16 ADVICE: the quote must not " +
      "hide the reference and leave a dangling constraint)") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_check_bt").toString
    PartitionedUpsert.init(
      Seq((1L, 5L)).toDF("k", "v"), dir, "k", 2)
    PartitionedUpsert.addCheckConstraint(spark, dir, "v_pos_q", "`v` > 0")
    val e = intercept[IllegalArgumentException] {
      PartitionedUpsert.evolveSchema(spark, dir,
        Seq(Cdc.RenameColumn("v", "w")), "k", 2)
    }
    assert(e.getMessage.contains("v_pos_q"))
    val e2 = intercept[IllegalArgumentException] {
      PartitionedUpsert.evolveSchema(spark, dir,
        Seq(Cdc.DropColumn("v",
          Some(org.apache.spark.sql.types.LongType))), "k", 2)
    }
    assert(e2.getMessage.contains("v_pos_q"))
    // after dropping the constraint, the rename commits cleanly
    PartitionedUpsert.dropCheckConstraint(spark, dir, "v_pos_q")
    PartitionedUpsert.evolveSchema(spark, dir,
      Seq(Cdc.RenameColumn("v", "w")), "k", 2)
    assert(PartitionedUpsert.manifestOrFail(spark, dir)
      .schema.fieldNames.toSeq == Seq("k", "w"))
  }
}
