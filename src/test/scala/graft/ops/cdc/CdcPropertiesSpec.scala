package graft.ops.cdc

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Scalacheck-driven CDC invariants (SURVEY §5.2) — generated change
  * logs with a fixed seed so runs are reproducible. Spark jobs are
  * expensive per case, so minSuccessful is small; the generator space
  * (ops × keys × interleavings) still varies far more than the
  * hand-written fixtures.
  */
class CdcPropertiesSpec extends SparkSpec {

  private val genLog: Gen[List[(Long, Long, String, Double)]] = for {
    n <- Gen.chooseNum(1, 120)
    rows <- Gen.listOfN(n, for {
      pk <- Gen.chooseNum(0L, 12L)
      op <- Gen.frequency(3 -> Gen.const("c"), 5 -> Gen.const("u"), 2 -> Gen.const("d"))
      v <- Gen.chooseNum(0, 10000).map(_ / 100.0)
    } yield (pk, op, v))
  } yield rows.zipWithIndex.map { case ((pk, op, v), i) => (i.toLong, pk, op, v) }

  private def toDf(log: List[(Long, Long, String, Double)]): DataFrame = {
    import spark.implicits._
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    log.map { case (lsn, pk, op, v) =>
      (lsn, pk, op, v, new Timestamp(base + lsn * 1000)) }
      .toDF("lsn", "pk", "op", "val", "ts")
  }

  private def check(name: String, prop: Prop): Unit = {
    val result = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(8)
        .withInitialSeed(Seed(42L)),
      prop)
    assert(result.passed, s"$name: $result")
  }

  test("property: apply equals sequential fold of the log (reference semantics)") {
    import spark.implicits._
    check("apply-fold", Prop.forAll(genLog) { log =>
      val snap = Seq((0L, -1.0), (5L, -5.0)).toDF("pk", "val")
      val out = Cdc.apply(snap, toDf(log), Seq("pk"), "lsn", "op", Seq("val"))
        .drop("src").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      // driver-side reference fold
      var state = Map(0L -> -1.0, 5L -> -5.0)
      log.sortBy(_._1).foreach { case (_, pk, op, v) =>
        state = if (op == "d") state - pk else state + (pk -> v)
      }
      out == state
    })
  }

  test("property: compact keeps one row per key and is idempotent") {
    check("compact", Prop.forAll(genLog) { log =>
      val df = toDf(log)
      val once = Cdc.compact(df, Seq("pk"), "lsn")
      val keys = once.select("pk").collect().map(_.getLong(0)).toSeq
      val distinctOk = keys.distinct.length == keys.length &&
        keys.toSet == log.map(_._2).toSet
      val twice = Cdc.compact(once, Seq("pk"), "lsn")
      distinctOk && twice.exceptAll(once).isEmpty
    })
  }

  test("property: scd2 interval count equals log rows; one current per key") {
    import spark.implicits._
    check("scd2", Prop.forAll(genLog) { log =>
      val h = Cdc.scd2(toDf(log), Seq("pk"), "lsn", "ts")
      h.count() == log.length &&
        h.filter($"is_current").count() == log.map(_._2).distinct.length
    })
  }

  test("property: checksum invariant under permutation, sensitive to value change") {
    import spark.implicits._
    check("checksum", Prop.forAll(genLog) { log =>
      if (log.isEmpty) true
      else {
        val df = toDf(log).select(concat_ws("|", $"lsn", $"pk", $"op").as("fp"))
        val a = Cdc.checksum(df, Seq("fp")).head()
        val b = Cdc.checksum(df.orderBy(rand(1)).repartition(3), Seq("fp")).head()
        val mutated = toDf(log.head match {
          case (lsn, pk, op, v) => (lsn, pk + 100, op, v) :: log.tail
        }).select(concat_ws("|", $"lsn", $"pk", $"op").as("fp"))
        val c = Cdc.checksum(mutated, Seq("fp")).head()
        a == b && a != c
      }
    })
  }
}
