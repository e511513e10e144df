package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** The transformWithState transaction buffer must honor the exact
  * contract of the fMGWS one — the four semantic tests mirror
  * StreamingSpec's transactionalBuffer suite verbatim, on the RocksDB
  * provider the TWS API requires. */
class TxBufferTwsSpec extends SparkSpec {

  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  private def runBatches[A](input: MemoryStream[A],
                            out: org.apache.spark.sql.DataFrame,
                            batches: Seq[Seq[A]]): Array[org.apache.spark.sql.Row] = {
    val name = s"tws_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table(name).collect()
    } finally q.stop()
  }

  test("TWS buffer: events release only at their commit marker, " +
      "lsn-ordered, markers never emitted") { withRocksDb {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[CdcStream.TxEvent]
    val out = CdcStream.transactionalBufferTws(in.toDS(), abandonedTimeoutMs = 0).toDF()
    val rows = runBatches(in, out, Seq(
      Seq(CdcStream.TxEvent("a", 2L, 1L, "u", 11.0),
          CdcStream.TxEvent("a", 1L, 2L, "c", 20.0),
          CdcStream.TxEvent("a", 3L, -1L, "t", 0.0),
          CdcStream.TxEvent("b", 4L, 3L, "u", 99.0)),
      Seq(CdcStream.TxEvent("b", 5L, 4L, "c", 40.0),
          CdcStream.TxEvent("b", 6L, -1L, "t", 0.0))))
    val byTx = rows.map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
    assert(byTx("a").map(_._2).toSeq === Seq(1L, 2L))
    assert(byTx("b").map(_._2).toSeq.sorted === Seq(4L, 5L))
    assert(!rows.exists(_.getString(3) == "t"))
  }}

  test("TWS buffer: oversized tx trips the cap, flushes lsn-ordered, " +
      "streams the remainder, per-tx caps independent") { withRocksDb {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[CdcStream.TxEvent]
    val overflows = spark.sparkContext.longAccumulator("twsOverflows")
    val out = CdcStream.transactionalBufferTws(in.toDS(), abandonedTimeoutMs = 0,
      maxBufferedEvents = 3, overflowCounter = Some(overflows)).toDF()
    val rows = runBatches(in, out, Seq(
      Seq(CdcStream.TxEvent("big", 4L, 4L, "u", 4.0),
          CdcStream.TxEvent("big", 2L, 2L, "u", 2.0),
          CdcStream.TxEvent("big", 3L, 3L, "u", 3.0),
          CdcStream.TxEvent("big", 1L, 1L, "c", 1.0)),
      Seq(CdcStream.TxEvent("big", 5L, 5L, "u", 5.0)),
      Seq(CdcStream.TxEvent("big", 6L, -1L, "t", 0.0),
          CdcStream.TxEvent("small", 7L, 9L, "c", 9.0),
          CdcStream.TxEvent("small", 8L, -1L, "t", 0.0))))
    val big = rows.filter(_.getString(0) == "big").map(_.getLong(1)).toSeq
    assert(big.take(4) === Seq(1L, 2L, 3L, 4L), s"lsn-ordered flush: $big")
    assert(big.sorted === Seq(1L, 2L, 3L, 4L, 5L), s"exactly once: $big")
    assert(rows.filter(_.getString(0) == "small").map(_.getLong(1)).toSeq === Seq(7L))
    assert(overflows.value === 1L)
  }}

  test("TWS buffer: redelivery after the commit marker hits the " +
      "tombstone and is dropped") { withRocksDb {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[CdcStream.TxEvent]
    val out = CdcStream.transactionalBufferTws(in.toDS(), abandonedTimeoutMs = 0).toDF()
    val rows = runBatches(in, out, Seq(
      Seq(CdcStream.TxEvent("a", 1L, 1L, "c", 1.0),
          CdcStream.TxEvent("a", 2L, -1L, "t", 0.0)),
      Seq(CdcStream.TxEvent("a", 1L, 1L, "c", 1.0)),
      Seq(CdcStream.TxEvent("b", 3L, 2L, "c", 2.0),
          CdcStream.TxEvent("b", 4L, -1L, "t", 0.0))))
    val byTx = rows.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSeq)
    assert(byTx("a") === Seq(1L), s"redelivery must not duplicate: ${byTx("a")}")
    assert(byTx("b") === Seq(3L))
  }}

  test("TWS buffer: an overflowed-then-ABANDONED tx fires the timer and " +
      "is counted as a corruption signal") { withRocksDb {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[CdcStream.TxEvent]
    val overflows = spark.sparkContext.longAccumulator("twsOvf")
    val abandoned = spark.sparkContext.longAccumulator("twsOvfAbandoned")
    val out = CdcStream.transactionalBufferTws(in.toDS(),
      abandonedTimeoutMs = 1500, maxBufferedEvents = 1,
      overflowCounter = Some(overflows),
      abandonedOverflowCounter = Some(abandoned)).toDF()
    val name = s"twsab_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      def await(cond: => Boolean): Boolean = {
        val deadline = System.nanoTime() + 60e9.toLong
        while (!cond && System.nanoTime() < deadline) Thread.sleep(500)
        cond
      }
      in.addData(CdcStream.TxEvent("leak", 1L, 1L, "c", 1.0),
        CdcStream.TxEvent("leak", 2L, 2L, "u", 2.0))
      assert(await(overflows.value >= 1L), "cap must trip")
      assert(abandoned.value === 0L, "not abandoned yet")
      assert(await(abandoned.value >= 1L),
        "abandoned overflowed tx must be counted")
    } finally q.stop()
  }}
}
