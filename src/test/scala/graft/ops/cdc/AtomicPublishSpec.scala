package graft.ops.cdc

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** The commit primitive both manifest-committed layouts stand on:
  * no-overwrite publish, clean conflict on a taken destination, no
  * leaked temp files. */
class AtomicPublishSpec extends SparkSpec {

  private def fs(dir: String) = new Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("publish round-trips the body; a second publish at the same " +
      "destination is a clean conflict; no temp files leak") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ap").toString
    val f = fs(dir)
    val dest = new Path(s"$dir/_m/v1.manifest")
    AtomicPublish.publishNoOverwrite(f, dest, "schema\n0\tdata/v1/bucket=0")
    assert(AtomicPublish.readText(f, dest) === "schema\n0\tdata/v1/bucket=0")
    val e = intercept[java.util.ConcurrentModificationException] {
      AtomicPublish.publishNoOverwrite(f, dest, "a different body")
    }
    assert(e.getMessage.contains("commit conflict"))
    // the loser's staged temp is deleted, the winner's body untouched
    assert(AtomicPublish.readText(f, dest) === "schema\n0\tdata/v1/bucket=0")
    val leftovers = f.listStatus(new Path(s"$dir/_m"))
      .map(_.getPath.getName).filter(_.startsWith(".tmp-"))
    assert(leftovers.isEmpty, s"temp files leaked: ${leftovers.toSeq}")
  }

  test("distinct destinations publish independently") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ap2").toString
    val f = fs(dir)
    AtomicPublish.publishNoOverwrite(f, new Path(s"$dir/_m/v1.manifest"), "one")
    AtomicPublish.publishNoOverwrite(f, new Path(s"$dir/_m/v2.manifest"), "two")
    assert(AtomicPublish.readText(f, new Path(s"$dir/_m/v2.manifest")) === "two")
  }
}
