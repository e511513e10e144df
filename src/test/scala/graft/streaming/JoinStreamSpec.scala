package graft.streaming

import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.ops.cdc.{JoinMaintain, PartitionedUpsert}

/** One continuous query maintains the fact replica AND its
  * materialized join against a dimension maintained out-of-band:
  * after every wave (and across a kill-and-resume restart) the
  * maintained join must equal a full re-join of the two committed
  * states — including dim changes committed BETWEEN fact triggers. */
class JoinStreamSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("pk", LongType), StructField("lsn", LongType),
    StructField("op", StringType), StructField("cents", LongType),
    StructField("fk", LongType)))

  private def line(pk: Long, lsn: Long, op: String, cents: Long, fk: Long) =
    s"""{"pk":$pk,"lsn":$lsn,"op":"$op","cents":$cents,"fk":$fk}"""

  private def joined(joinDir: String) =
    JoinMaintain.readJoin(spark, joinDir).collect()
      .map(r => (r.getAs[Long]("pk"), r.getAs[Long]("cents"),
        r.getAs[Long]("fk"),
        r.getAs[Boolean](JoinMaintain.markerCol("fk")),
        Option(r.getAs[String]("dname"))))
      .sortBy(_._1).toSeq

  private def direct(factDir: String, dimDir: String) =
    JoinMaintain.fullJoin(
        PartitionedUpsert.read(spark, factDir),
        PartitionedUpsert.read(spark, dimDir),
        "pk", "fk", "dk", Seq("cents", "fk"), Seq("dname"))
      .collect()
      .map(r => (r.getAs[Long]("pk"), r.getAs[Long]("cents"),
        r.getAs[Long]("fk"),
        r.getAs[Boolean](JoinMaintain.markerCol("fk")),
        Option(r.getAs[String]("dname"))))
      .sortBy(_._1).toSeq

  test("replica + join stay in lockstep across triggers, out-of-band " +
      "dim changes, and a kill-and-resume restart") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_joins").toString
    val srcDir = s"$base/in"; new java.io.File(srcDir).mkdirs()
    val (fDir, dDir, jDir, ckpt) =
      (s"$base/fact", s"$base/dim", s"$base/join", s"$base/ckpt")
    // the dimension exists first, maintained by its own owner
    PartitionedUpsert.init(
      Seq((10L, "ten"), (20L, "twenty")).toDF("dk", "dname"), dDir, "dk", 2)
    def start() = CdcStream.maintainedJoinSink(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .json(srcDir),
      fDir, dDir, jDir, ckpt, "pk", "lsn", "op", Seq("cents", "fk"), "fk",
      nBuckets = 4, joinBuckets = 4)
    // wave 1: two triggers — matched rows, an fk retarget, a dangler
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$srcDir/f1.json"),
      Seq(line(1, 10, "c", 100, 10), line(2, 11, "c", 200, 20),
        line(3, 12, "c", 300, 99)).mkString("\n"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$srcDir/f2.json"),
      Seq(line(1, 20, "u", 110, 20), line(4, 21, "c", 400, 10))
        .mkString("\n"))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop() // kill
    assert(joined(jDir) === direct(fDir, dDir))
    assert(joined(jDir).find(_._1 == 3L).exists(r => !r._4 && r._5.isEmpty),
      "the dangling-fk row must be stored unmatched")
    // out-of-band dim maintenance BETWEEN fact triggers: insert dk=99
    // (resurrects pk3), rename dk=10, delete dk=20 (orphans pk1, pk2)
    PartitionedUpsert.merge(spark, dDir,
      Seq((100L, 99L, "c", "ninetynine"), (101L, 10L, "u", "TEN"),
        (102L, 20L, "d", null.asInstanceOf[String]))
        .toDF("lsn", "dk", "op", "dname"),
      "dk", "lsn", "op", Seq("dname"), 2)
    // wave 2 after restart: one fact update — the trigger must also
    // catch up the dim window committed while the stream was down
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$srcDir/f3.json"),
      Seq(line(4, 30, "u", 410, 10), line(5, 31, "c", 500, 99))
        .mkString("\n"))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(joined(jDir) === direct(fDir, dDir),
      "restart must not double-apply or lose a maintenance window")
    val byPk = joined(jDir).map(r => r._1 -> r).toMap
    assert(byPk(3L)._4 && byPk(3L)._5 === Some("ninetynine"),
      "the out-of-band dim insert must resurrect the dangler")
    assert(!byPk(1L)._4 && byPk(1L)._5.isEmpty,
      "the out-of-band dim delete must orphan its matched rows")
    assert(byPk(4L)._5 === Some("TEN"))
  }

  test("a missing dimension fails at start, not per batch") {
    val base = java.nio.file.Files.createTempDirectory("graft_joinsm").toString
    val srcDir = s"$base/in"; new java.io.File(srcDir).mkdirs()
    intercept[IllegalStateException] {
      CdcStream.maintainedJoinSink(
        spark.readStream.schema(schema).json(srcDir),
        s"$base/fact", s"$base/nodim", s"$base/join", s"$base/ckpt",
        "pk", "lsn", "op", Seq("cents", "fk"), "fk")
    }
  }
}
