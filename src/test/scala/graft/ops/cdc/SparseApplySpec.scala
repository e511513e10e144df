package graft.ops.cdc

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

import graft.SparkSpec

/** Cdc.applySparse: column-level last-write-wins for partial (TOAST-
  * style) after-images. Absent column = unchanged; present-with-NULL =
  * set NULL; 'c'/'r' reset the full row; 'u' after 'd' resurrects a
  * PARTIAL row (unset columns NULL, never the pre-delete values). */
class SparseApplySpec extends SparkSpec {

  private case class Ev(lsn: Long, pk: Long, op: String,
                        v: Option[Double], vSet: Boolean,
                        lbl: Option[String], lblSet: Boolean)

  private def run(snap: Seq[(Long, Option[Double], Option[String])],
                  log: Seq[Ev]): Map[Long, (Option[Double], Option[String])] = {
    import spark.implicits._
    val snapDf = snap.toDF("pk", "v", "lbl")
    val logDf = log.map(e => (e.lsn, e.pk, e.op, e.v, e.vSet, e.lbl, e.lblSet))
      .toDF("lsn", "pk", "op", "v", "v_present", "lbl", "lbl_present")
    Cdc.applySparse(snapDf, logDf, Seq("pk"), "lsn", "op", Seq("v", "lbl"))
      .collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Double]),
          Option(r.get(2)).map(_.asInstanceOf[String])))
      .toMap
  }

  /** Independent event-by-event fold — the semantics, stated twice. */
  private def fold(snap: Seq[(Long, Option[Double], Option[String])],
                   log: Seq[Ev]): Map[Long, (Option[Double], Option[String])] = {
    val state = scala.collection.mutable.Map[Long, (Option[Double], Option[String])]()
    snap.foreach { case (pk, v, l) => state(pk) = (v, l) }
    log.sortBy(_.lsn).foreach { e =>
      e.op match {
        case "d" => state.remove(e.pk)
        case "c" | "r" => state(e.pk) = (e.v, e.lbl)
        case "u" =>
          val (cv, cl) = state.getOrElse(e.pk, (None, None))
          state(e.pk) = (if (e.vSet) e.v else cv, if (e.lblSet) e.lbl else cl)
      }
    }
    state.toMap
  }

  private val snap1 = Seq(
    (1L, Some(10.0), Some("A")), (2L, Some(20.0), Some("B")),
    (3L, Some(30.0), Some("C")), (4L, Some(40.0), Some("D")))

  test("absent column is unchanged; present column overrides") {
    val log = Seq(Ev(1, 1, "u", Some(11.0), true, None, false))
    val out = run(snap1, log)
    assert(out(1L) == (Some(11.0), Some("A"))) // lbl untouched
    assert(out(2L) == (Some(20.0), Some("B"))) // no events at all
  }

  test("explicit null SETS null — distinct from absent") {
    val log = Seq(
      Ev(1, 1, "u", None, true, None, false),  // v := NULL, lbl unchanged
      Ev(2, 2, "u", None, false, None, true))  // v unchanged, lbl := NULL
    val out = run(snap1, log)
    assert(out(1L) == (None, Some("A")))
    assert(out(2L) == (Some(20.0), None))
  }

  test("create resets the whole row; later sparse updates layer on top") {
    val log = Seq(
      Ev(1, 1, "u", Some(99.0), true, None, false), // shadowed by the c below
      Ev(2, 1, "c", Some(1.0), true, Some("X"), true),
      Ev(3, 1, "u", None, false, Some("Y"), true))
    val out = run(snap1, log)
    assert(out(1L) == (Some(1.0), Some("Y"))) // v from the c, lbl from the u
  }

  test("update after delete resurrects a PARTIAL row, not pre-delete values") {
    val log = Seq(
      Ev(1, 3, "d", None, false, None, false),
      Ev(2, 3, "u", Some(7.0), true, None, false))
    val out = run(snap1, log)
    assert(out(3L) == (Some(7.0), None)) // lbl is NULL, NOT the snapshot "C"
  }

  test("delete with no later events removes the row; empty update is a no-op") {
    val log = Seq(
      Ev(1, 4, "d", None, false, None, false),
      Ev(2, 2, "u", None, false, None, false)) // {} image
    val out = run(snap1, log)
    assert(!out.contains(4L))
    assert(out(2L) == (Some(20.0), Some("B")))
  }

  test("log-only key: sparse updates build a partial row from nothing") {
    val log = Seq(Ev(1, 99, "u", None, false, Some("new"), true))
    val out = run(snap1, log)
    assert(out(99L) == (None, Some("new")))
  }

  test("applySparse == event-by-event fold on random logs (property)") {
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 1 to 5) {
      val snap = (0L until 20L).filter(_ => rnd.nextBoolean())
        .map(pk => (pk, Some(rnd.nextInt(100).toDouble): Option[Double],
          Some(s"s$pk"): Option[String]))
      val log = (0 until 300).map { i =>
        val pk = rnd.nextInt(25).toLong // includes log-only keys
        rnd.nextInt(10) match {
          case 0 => Ev(i, pk, "c", Some(rnd.nextInt(100).toDouble), true,
            Some(s"c$i"), true)
          case 1 => Ev(i, pk, "d", None, false, None, false)
          case _ =>
            val vSet = rnd.nextInt(3) != 0
            val lSet = rnd.nextInt(3) != 0
            Ev(i, pk, "u",
              if (vSet && rnd.nextInt(5) != 0) Some(rnd.nextInt(100).toDouble) else None, vSet,
              if (lSet && rnd.nextInt(5) != 0) Some(s"u$i") else None, lSet)
        }
      }
      assert(run(snap, log) == fold(snap, log), s"trial $trial")
    }
  }

  test("PartitionedUpsert.merge(sparse=true): partial images merge " +
      "column-level against the stored bucket state") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sparse_merge").toString
    val snap = Seq((1L, 10.0, "A"), (2L, 20.0, "B"), (3L, 30.0, "C"),
      (4L, 40.0, "D")).toDF("pk", "v", "lbl")
    PartitionedUpsert.init(snap, dir, "pk", nBuckets = 4)
    val batch1 = Seq(
      (1L, 1L, "u", Some(11.0), true, Option.empty[String], false),
      (2L, 2L, "u", Option.empty[Double], false, Option.empty[String], true),
      (3L, 3L, "d", Option.empty[Double], false, Option.empty[String], false))
      .toDF("lsn", "pk", "op", "v", "v_present", "lbl", "lbl_present")
    PartitionedUpsert.merge(spark, dir, batch1, "pk", "lsn", "op",
      Seq("v", "lbl"), 4, sparse = true)
    val s1 = PartitionedUpsert.read(spark, dir).collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(s1(1L) == (Some(11.0), Some("A"))) // v set, lbl untouched
    assert(s1(2L) == (Some(20.0), None))      // lbl := NULL, v untouched
    assert(!s1.contains(3L))                  // deleted
    assert(s1(4L) == (Some(40.0), Some("D"))) // untouched row intact
    // a SECOND sparse merge layers on the post-merge state, not the init
    val batch2 = Seq(
      (10L, 1L, "u", Option.empty[Double], false, Some("Z"), true))
      .toDF("lsn", "pk", "op", "v", "v_present", "lbl", "lbl_present")
    PartitionedUpsert.merge(spark, dir, batch2, "pk", "lsn", "op",
      Seq("v", "lbl"), 4, sparse = true)
    val s2 = PartitionedUpsert.read(spark, dir).collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(s2(1L) == (Some(11.0), Some("Z"))) // keeps batch1's v
  }

  test("sequential sparse merges == one-shot applySparse over the " +
      "concatenated log (incremental/batch equivalence, property)") {
    import spark.implicits._
    val rnd = new scala.util.Random(424242L)
    for (trial <- 1 to 2) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_sparse_eq$trial").toString + "/t"
      val snap = (0L until 15L).filter(_ => rnd.nextBoolean())
        .map(pk => (pk, Some(rnd.nextInt(100).toDouble): Option[Double],
          Some(s"s$pk"): Option[String]))
      val log = (0 until 200).map { i =>
        val pk = rnd.nextInt(20).toLong
        rnd.nextInt(10) match {
          case 0 => Ev(i, pk, "c", Some(rnd.nextInt(100).toDouble), true,
            Some(s"c$i"), true)
          case 1 => Ev(i, pk, "d", None, false, None, false)
          case _ =>
            val vSet = rnd.nextInt(3) != 0
            val lSet = rnd.nextInt(3) != 0
            Ev(i, pk, "u",
              if (vSet && rnd.nextInt(4) != 0) Some(rnd.nextInt(100).toDouble) else None, vSet,
              if (lSet && rnd.nextInt(4) != 0) Some(s"u$i") else None, lSet)
        }
      }
      PartitionedUpsert.init(snap.toDF("pk", "v", "lbl"), dir, "pk", 4)
      // lsn-ordered batches: stored state stands in as the snapshot of
      // every later batch — the merge must compose exactly
      log.grouped(50).foreach { batch =>
        val df = batch.map(e => (e.lsn, e.pk, e.op, e.v, e.vSet, e.lbl, e.lblSet))
          .toDF("lsn", "pk", "op", "v", "v_present", "lbl", "lbl_present")
        PartitionedUpsert.merge(spark, dir, df, "pk", "lsn", "op",
          Seq("v", "lbl"), 4, sparse = true)
      }
      val incremental = PartitionedUpsert.read(spark, dir).collect()
        .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
      assert(incremental === run(snap, log), s"trial $trial")
    }
  }

  test("sparseField distinguishes absent / explicit-null / set") {
    import spark.implicits._
    val df = Seq(
      (1L, """{"v":1.5,"lbl":"a"}"""),
      (2L, """{"v":null}"""),
      (3L, """{}""")).toDF("id", "j")
    val (v, vp) = Cdc.sparseField(col("j"), "v", DoubleType)
    val (l, lp) = Cdc.sparseField(col("j"), "lbl", StringType)
    val out = df.select(col("id"), v.as("v"), vp.as("vp"), l.as("l"), lp.as("lp"))
      .orderBy("id").collect()
    assert(out(0).getDouble(1) == 1.5 && out(0).getBoolean(2) && out(0).getBoolean(4))
    assert(out(1).isNullAt(1) && out(1).getBoolean(2) && !out(1).getBoolean(4))
    assert(out(2).isNullAt(1) && !out(2).getBoolean(2))
  }
}
