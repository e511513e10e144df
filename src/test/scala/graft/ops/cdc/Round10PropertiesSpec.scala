package graft.ops.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Scalacheck invariants for the round-10 algebra: change-log
  * inversion really rewinds, the min/max reserve really equals a
  * direct recompute through arbitrary op interleavings, and the
  * version-chain lookup really equals the windowed reference — over
  * generated logs whose op/key/interleaving space dwarfs the
  * hand-written fixtures (the CdcPropertiesSpec convention: fixed
  * seed, few-but-varied cases since each runs Spark jobs). */
class Round10PropertiesSpec extends SparkSpec {

  private val genLog: Gen[List[(Long, Long, String, Long)]] = for {
    n <- Gen.chooseNum(2, 60)
    rows <- Gen.listOfN(n, for {
      pk <- Gen.chooseNum(0L, 8L)
      op <- Gen.frequency(3 -> Gen.const("c"), 5 -> Gen.const("u"),
        2 -> Gen.const("d"))
      v <- Gen.chooseNum(-50L, 50L)
    } yield (pk, op, v))
  } yield rows.zipWithIndex.map { case ((pk, op, v), i) =>
    ((i + 1).toLong, pk, op, v) }

  private def toDf(log: List[(Long, Long, String, Long)]): DataFrame = {
    import spark.implicits._
    log.map { case (lsn, pk, op, v) => (lsn, pk, op, v) }
      .toDF("lsn", "pk", "op", "v")
  }

  /** Driver-side state fold (the reference semantics). */
  private def fold(snap: Map[Long, Long],
                   log: List[(Long, Long, String, Long)]): Map[Long, Long] =
    log.sortBy(_._1).foldLeft(snap) { case (st, (_, pk, op, v)) =>
      if (op == "d") st - pk else st + (pk -> v)
    }

  private def check(name: String, prop: Prop): Unit = {
    val result = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(6)
        .withInitialSeed(Seed(1042L)),
      prop)
    assert(result.passed, s"$name: $result")
  }

  test("property: invertWindow rewinds — applying the window's " +
      "compensation on the final state restores the cut state exactly") {
    import spark.implicits._
    check("rollback", Prop.forAll(genLog, Gen.chooseNum(0, 100)) {
      (log, cutPct) =>
        val snapMap = Map(0L -> 1000L, 3L -> 3000L)
        val snap = snapMap.toSeq.toDF("pk", "v")
        val maxLsn = log.map(_._1).max
        val cut = maxLsn * cutPct / 100
        // full envelopes: snapshot seeded as lsn-0 creates; before =
        // lag of the after image per key (the qCdcRollback build)
        val seeded = snap
          .select(lit(0L).as("lsn"), $"pk", lit("c").as("op"),
            struct($"v").as("after"))
          .unionByName(toDf(log).select($"lsn", $"pk", $"op",
            when($"op" === "d", lit(null).cast("struct<v:bigint>"))
              .otherwise(struct($"v")).as("after")))
        val env = seeded.withColumn("before",
          lag($"after", 1).over(Window.partitionBy($"pk").orderBy($"lsn")))
        val invFlat = Cdc.invertWindow(env.filter($"lsn" > cut), "lsn", maxLsn)
          .select($"lsn", $"pk", $"op", $"after.v".as("v"))
        val state2 = Cdc.apply(snap, toDf(log),
          Seq("pk"), "lsn", "op", Seq("v")).drop("src")
        val rolled = Cdc.apply(state2, invFlat,
          Seq("pk"), "lsn", "op", Seq("v")).drop("src")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        rolled == fold(snapMap, log.filter(_._1 <= cut))
    })
  }

  test("property: reserve min/max through an arbitrary window equals " +
      "a direct recompute, for every K") {
    import spark.implicits._
    check("minmax-reserve", Prop.forAll(
      genLog, Gen.chooseNum(0, 100), Gen.chooseNum(1, 3)) {
      (log, cutPct, k) =>
        val snapMap = Map(0L -> 7L, 4L -> -7L)
        val cut = log.map(_._1).max * cutPct / 100
        def stateDf(m: Map[Long, Long]): DataFrame = {
          // one group: grp = pk % 2 (two groups, moves included)
          m.toSeq.map { case (pk, v) => (pk, s"g${pk % 2}", v) }
            .toDF("pk", "grp", "v")
        }
        val s1m = fold(snapMap, log.filter(_._1 <= cut))
        val s2m = fold(snapMap, log)
        val s1 = stateDf(s1m); val s2 = stateDf(s2m)
        val seed = MinMaxMaintain.fullMinMaxState(s1, Seq("grp"), Seq("v"), k)
        val stepped = MinMaxMaintain.deltaMinMax(seed,
          AggMaintain.diffImages(s1, s2, Seq("pk"), Seq("grp", "v")),
          Seq("grp"), Seq("v"), k)
        val clean = MinMaxMaintain.rescanMerge(stepped, s2,
          Seq("grp"), Seq("v"), k)
        val got = MinMaxMaintain.exposedMinMax(clean, Seq("grp"), Seq("v"))
          .collect().map(r => r.getString(0) ->
            (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
        val want = s2m.groupBy { case (pk, _) => s"g${pk % 2}" }
          .map { case (g, rows) =>
            g -> (rows.size.toLong, rows.values.min, rows.values.max) }
        got == want
    })
  }

  test("property: chainAsOf equals the windowed history reference for " +
      "arbitrary in-order version chains and probes") {
    import spark.implicits._
    val genChains: Gen[List[(Long, Long, Long)]] = for {
      n <- Gen.chooseNum(1, 30)
      rows <- Gen.listOfN(n, for {
        pk <- Gen.chooseNum(0L, 4L)
        v <- Gen.chooseNum(0L, 99L)
      } yield (pk, v))
    } yield rows.zipWithIndex.map { case ((pk, v), i) =>
      (pk, (i + 1).toLong, v) } // lsn doubles as the (in-order) ts
    val genProbes: Gen[List[(Long, Long)]] = for {
      n <- Gen.chooseNum(1, 12)
      rows <- Gen.listOfN(n, for {
        pk <- Gen.chooseNum(0L, 5L) // includes an unknown key
        ts <- Gen.chooseNum(0L, 35L)
      } yield (pk, ts))
    } yield rows
    check("chain-asof", Prop.forAll(genChains, genProbes) { (vers, probes) =>
      val base = java.nio.file.Files.createTempDirectory("graft_pchain").toString
      val cDir = s"$base/chain"
      val df = vers.map { case (pk, lsn, v) => (pk, lsn, lsn, v) }
        .toDF("pk", "lsn", "ts", "v")
      Scd2Maintain.initChain(df, cDir, "pk", "lsn", "ts", Seq("v"), 2)
      Scd2Maintain.applyBatchChain(spark, cDir, df, "pk", "lsn", "ts",
        Seq("v"), 2)
      val ev = probes.zipWithIndex.map { case ((pk, ts), i) =>
        (i.toLong, pk, ts) }.toDF("event_id", "pk", "ts")
      val got = Scd2Maintain.chainAsOf(spark, cDir, ev, "pk", "ts", Seq("v"))
        .collect().map(r => r.getLong(0) ->
          Option(r.getAs[java.lang.Long]("dim_v")).map(_.longValue)).toMap
      val byKey = vers.groupBy(_._1)
      val want = probes.zipWithIndex.map { case ((pk, ts), i) =>
        i.toLong -> byKey.getOrElse(pk, Nil)
          .filter(_._2 <= ts).sortBy(_._2).lastOption.map(_._3)
      }.toMap
      got == want
    })
  }
}
