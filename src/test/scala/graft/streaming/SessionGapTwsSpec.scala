package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Event-time-timer sessionization (the third TWS mode): gap closes
  * in-batch, the cap splits runaway sessions, the WATERMARK closes
  * idle tails via registered event-time timers, and out-of-order rows
  * within the watermark fold in event-time order. */
class SessionGapTwsSpec extends SparkSpec {

  private case class Ev(user: Long, ts: Timestamp, v: Double)
  private def t(s: Long) = new Timestamp(s * 1000L)

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

  test("gap + cap + timer closures, with the closed_by audit column; " +
      "in-batch out-of-order events fold in event-time order") { withRocksDb {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val out = Streams.sessionizeTws(in.toDF(), "ts",
      gapMs = 10000L, maxEvents = 3, watermark = "0 seconds")
    val name = s"sess_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: user 1 — two sessions separated by a >10s gap, the
      // first delivered OUT OF ORDER (t=2 before t=1)
      in.addData(Ev(1L, t(2), 2.0), Ev(1L, t(1), 1.0), Ev(1L, t(30), 3.0))
      q.processAllAvailable()
      // batch 2: user 2 — four events inside one gap: cap 3 splits
      in.addData(Ev(2L, t(100), 1.0), Ev(2L, t(101), 1.0),
        Ev(2L, t(102), 1.0), Ev(2L, t(103), 1.0))
      q.processAllAvailable()
      // batch 3: far-future event advances the watermark past every
      // open tail + its gap → the timers close them
      in.addData(Ev(9L, t(10000), 0.0))
      q.processAllAvailable()
      // one more batch so the engine processes the timers armed above
      in.addData(Ev(9L, t(20000), 0.0))
      q.processAllAvailable()

      val rows = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1) / 1000, r.getLong(2) / 1000,
          r.getLong(3), r.getDouble(4), r.getString(5)))
      val u1 = rows.filter(_._1 == 1L).sortBy(_._2)
      // session [1,2] closed by the in-batch gap (sum folds both, in
      // order); session [30,30] closed by the event-time timer
      assert(u1.take(1) === Array((1L, 1L, 2L, 2L, 3.0, "gap")), u1.mkString(","))
      assert(u1.exists(s => s._2 == 30L && s._6 == "timer"), u1.mkString(","))
      val u2 = rows.filter(_._1 == 2L).sortBy(_._2)
      // cap split after 3 events; the 1-event remainder times out
      assert(u2.head === (2L, 100L, 102L, 3L, 3.0, "cap"), u2.mkString(","))
      assert(u2.exists(s => s._2 == 103L && s._4 == 1L && s._6 == "timer"),
        u2.mkString(","))
    } finally q.stop()
  }}
}
