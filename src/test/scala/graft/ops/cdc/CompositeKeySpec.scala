package graft.ops.cdc

import java.sql.Timestamp

import graft.SparkSpec

/** The generic CDC operators take Seq(keys) — exercise them with a
  * composite (table, pk) key, the shape of a multi-table change feed. */
class CompositeKeySpec extends SparkSpec {

  private def t(i: Int) = new Timestamp(1700000000000L + i * 1000L)

  test("compact/apply/scd2 honor composite keys") {
    import spark.implicits._
    val log = Seq(
      (1L, "t1", 1L, "c", 10.0, t(1)),
      (2L, "t2", 1L, "c", 20.0, t(2)),   // same pk, different table
      (3L, "t1", 1L, "u", 11.0, t(3)),
      (4L, "t2", 1L, "d", 0.0, t(4)),
      (5L, "t1", 2L, "c", 12.0, t(5))
    ).toDF("lsn", "tbl", "pk", "op", "val", "ts")

    val compacted = Cdc.compact(log, Seq("tbl", "pk"), "lsn")
      .collect().map(r => (r.getString(1), r.getLong(2)) -> r.getLong(0)).toMap
    assert(compacted === Map(("t1", 1L) -> 3L, ("t2", 1L) -> 4L, ("t1", 2L) -> 5L))

    val snap = Seq(("t1", 1L, 0.0), ("t2", 2L, 9.0)).toDF("tbl", "pk", "val")
    val state = Cdc.apply(snap, log, Seq("tbl", "pk"), "lsn", "op", Seq("val"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // t1/1 updated, t2/1 created-then-tombstoned (absent), t1/2 created,
    // t2/2 untouched snapshot row
    assert(state === Map(
      ("t1", 1L) -> 11.0, ("t1", 2L) -> 12.0, ("t2", 2L) -> 9.0))

    val hist = Cdc.scd2(log, Seq("tbl", "pk"), "lsn", "ts")
    import org.apache.spark.sql.functions._
    assert(hist.filter($"is_current").count() === 3)
    assert(hist.count() === 5)
  }

  test("compactSalted and applyChunkedSnapshot honor composite keys") {
    import spark.implicits._
    val log = Seq(
      (1L, "t1", 1L, "c", 10.0),
      (2L, "t2", 1L, "c", 20.0),
      (3L, "t1", 1L, "u", 11.0),
      (4L, "t2", 1L, "d", 0.0),
      (5L, "t1", 2L, "c", 12.0)
    ).toDF("lsn", "tbl", "pk", "op", "val")
    val plain = Cdc.compact(log, Seq("tbl", "pk"), "lsn")
    val salted = Cdc.compactSalted(log, Seq("tbl", "pk"), "lsn", nSalts = 4)
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)

    // chunk read at wm=2: both tables' pk=1 exist (t2/1 not yet deleted)
    val chunks = Seq(
      ("t1", 1L, 10.0, 2L), ("t2", 1L, 20.0, 2L), ("t9", 9L, 99.0, 2L))
      .toDF("tbl", "pk", "val", "wm")
    val out = Cdc.applyChunkedSnapshot(chunks, log,
        Seq("tbl", "pk"), "lsn", "op", Seq("val"), "wm")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // t1/1 updated at lsn 3 (> wm), t2/1 deleted at lsn 4, t1/2 created
    // at lsn 5, t9/9 only in the chunk — untouched
    assert(out === Map(
      ("t1", 1L) -> 11.0, ("t1", 2L) -> 12.0, ("t9", 9L) -> 99.0))
  }

  test("diff with composite keys classifies per (table, pk)") {
    import spark.implicits._
    val exp = Seq(("t1", 1L, "a"), ("t1", 2L, "b"), ("t2", 1L, "c"))
      .toDF("tbl", "pk", "v")
    val act = Seq(("t1", 1L, "a"), ("t1", 2L, "CHANGED"), ("t2", 2L, "x"))
      .toDF("tbl", "pk", "v")
    val out = Cdc.diff(exp, act, Seq("tbl", "pk"), Seq("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(out === Map(
      ("t1", 2L) -> "mismatch",
      ("t2", 1L) -> "missing_in_replica",
      ("t2", 2L) -> "extra_in_replica"))
  }

  test("Streams.intervalJoin helper: in-bound right rows only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    val l = MemoryStream[(Timestamp, String, Double)]
    val r = MemoryStream[(Timestamp, String, Double)]
    val left = l.toDF().toDF("l_ts", "k", "l_v")
    val right = r.toDF().toDF("r_ts", "k", "r_v")
    val joined = graft.streaming.Streams.intervalJoin(
      left, right, "k", "l_ts", "r_ts", "1 hour", "10 minutes")
    val name = s"mem_${System.nanoTime()}"
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      l.addData((Timestamp.valueOf("2024-01-01 00:00:00"), "a", 1.0))
      r.addData(
        (Timestamp.valueOf("2024-01-01 00:05:00"), "a", 2.0),
        (Timestamp.valueOf("2024-01-01 00:30:00"), "a", 3.0))
      q.processAllAvailable()
      val rows = spark.table(name).collect()
      assert(rows.length === 1 && rows.head.getAs[Double]("r_v") === 2.0)
    } finally q.stop()
  }
}
