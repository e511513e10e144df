package graft.ops.cdc

import org.apache.spark.sql.DataFrame
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Incremental (chunked) snapshot reconciliation — the DBLog pattern:
  * read a live table in key-range chunks interleaved with ongoing
  * capture, then prove the merged result equals a monolithic
  * snapshot+apply of the same log.
  *
  * The "live table" is simulated driver-side: chunk i's content is the
  * state after folding the log prefix lsn <= watermark_i, restricted to
  * chunk i's key range. That is exactly what a chunked SELECT against a
  * live source returns.
  */
class ChunkedSnapshotSpec extends SparkSpec {

  private val genLog: Gen[List[(Long, Long, String, Double)]] = for {
    n <- Gen.chooseNum(5, 120)
    rows <- Gen.listOfN(n, for {
      pk <- Gen.chooseNum(0L, 20L)
      op <- Gen.frequency(3 -> Gen.const("c"), 5 -> Gen.const("u"), 2 -> Gen.const("d"))
      v <- Gen.chooseNum(0, 10000).map(_ / 100.0)
    } yield (pk, op, v))
  } yield rows.zipWithIndex.map { case ((pk, op, v), i) => (i.toLong + 1L, pk, op, v) }

  /** Driver-side reference fold of a log prefix over an initial state. */
  private def fold(init: Map[Long, Double],
                   log: List[(Long, Long, String, Double)],
                   uptoLsn: Long): Map[Long, Double] =
    log.filter(_._1 <= uptoLsn).sortBy(_._1).foldLeft(init) {
      case (st, (_, pk, op, v)) => if (op == "d") st - pk else st + (pk -> v)
    }

  private def logDf(log: List[(Long, Long, String, Double)]): DataFrame = {
    import spark.implicits._
    log.toDF("lsn", "pk", "op", "val")
  }

  test("property: chunked snapshot + log == monolithic final state") {
    import spark.implicits._
    val init: Map[Long, Double] = (0L to 20L by 2).map(k => k -> k * 1.0).toMap
    val prop = Prop.forAll(genLog) { log =>
      val maxLsn = log.map(_._1).max
      val nChunks = 4
      // chunk i covers keys [i*6, (i+1)*6) and is read at an increasing
      // log position — capture keeps running while the snapshot walks
      val chunks = (0 until nChunks).flatMap { i =>
        val watermark = maxLsn * (i + 1) / nChunks
        val stateAtRead = fold(init, log, watermark)
        stateAtRead.collect {
          case (pk, v) if pk >= i * 6 && pk < (i + 1) * 6 => (pk, v, watermark)
        }
      }
      val chunksDf = chunks.toDF("pk", "val", "wm")
      val merged = Cdc.applyChunkedSnapshot(chunksDf, logDf(log),
          Seq("pk"), "lsn", "op", Seq("val"), "wm")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val expected = fold(init, log, maxLsn)
      merged == expected
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8)
        .withInitialSeed(Seed(4242L)), prop)
    assert(result.passed, s"chunked-snapshot equivalence: $result")
  }

  test("events after a chunk's watermark override its rows; earlier are shadowed") {
    import spark.implicits._
    // chunk read at wm=10 says pk=1 -> 5.0 (already reflects lsn<=10)
    val chunks = Seq((1L, 5.0, 10L), (2L, 7.0, 10L)).toDF("pk", "val", "wm")
    val log = Seq(
      (3L, 1L, "u", 99.0),   // before watermark: shadowed by the chunk row
      (15L, 2L, "u", 42.0),  // after watermark: overrides the chunk row
      (16L, 3L, "c", 1.0),   // created after the chunk was read
      (17L, 3L, "d", 0.0))   // ... and deleted again
      .toDF("lsn", "pk", "op", "val")
    val out = Cdc.applyChunkedSnapshot(chunks, log,
        Seq("pk"), "lsn", "op", Seq("val"), "wm")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out === Map(1L -> 5.0, 2L -> 42.0))
  }

  test("snapshot record wins an lsn tie (chunk read AT an event's position)") {
    import spark.implicits._
    val chunks = Seq((1L, 8.0, 5L)).toDF("pk", "val", "wm")
    val log = Seq((5L, 1L, "u", 8.0)).toDF("lsn", "pk", "op", "val")
    val out = Cdc.applyChunkedSnapshot(chunks, log,
      Seq("pk"), "lsn", "op", Seq("val"), "wm").collect()
    assert(out.length === 1 && out.head.getDouble(1) === 8.0)
  }

  test("initChunked bootstraps the upsert target live; later merges continue") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_boot").toString + "/tgt"
    // chunk read at wm=10 while capture runs; log has pre- and post-wm events
    val chunks = Seq((1L, 5.0, 10L), (2L, 7.0, 10L)).toDF("pk", "val", "wm")
    val log = Seq((3L, 1L, "u", 99.0), (15L, 2L, "u", 42.0), (16L, 3L, "c", 1.0))
      .toDF("lsn", "pk", "op", "val")
    PartitionedUpsert.initChunked(dir, chunks, log,
      "pk", "lsn", "op", Seq("val"), "wm", nBuckets = 4)
    val boot = PartitionedUpsert.read(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(boot === Map(1L -> 5.0, 2L -> 42.0, 3L -> 1.0))
    // capture continues on the same code path after bootstrap
    PartitionedUpsert.merge(spark, dir,
      Seq((20L, 3L, "d", 0.0)).toDF("lsn", "pk", "op", "val"),
      "pk", "lsn", "op", Seq("val"), nBuckets = 4)
    assert(PartitionedUpsert.read(spark, dir).count() === 2)
  }

  test("planChunkBounds covers the full key range in one approximate pass") {
    import spark.implicits._
    val table = (0L until 1000L).map(k => (k, k * 1.0)).toDF("pk", "val")
    val bounds = Cdc.planChunkBounds(table, "pk", 8)
    assert(bounds.length === 9)
    assert(bounds.head <= 0L && bounds.last >= 999L,
      s"bounds must span the key range: $bounds")
    assert(bounds.sliding(2).forall(p => p(0) <= p(1)), "bounds must ascend")
    // every key falls in exactly one [b(i), b(i+1)) range (last closed)
    val covered = (0L until 1000L).forall { k =>
      bounds.sliding(2).zipWithIndex.exists { case (Seq(lo, hi), i) =>
        k >= lo && (k < hi || (i == 7 && k <= hi))
      }
    }
    assert(covered, "chunk ranges must cover every key")
  }

  test("planChunkBounds: snowflake-style keys above 2^53 keep distinct, " +
      "exact bounds (no double collapse)") {
    import spark.implicits._
    // consecutive longs here are NOT representable as doubles: a double
    // cast maps base+1 and base+2 to the same value and bounds collapse
    val base = 1L << 53
    val table = (0L until 1000L).map(k => (base + k, 1.0)).toDF("pk", "val")
    val bounds = Cdc.planChunkBounds(table, "pk", 8)
    assert(bounds.length === 9)
    assert(bounds.head === base && bounds.last === base + 999L,
      s"bounds must be exact key values: $bounds")
    assert(bounds.sliding(2).forall(p => p(0) < p(1)),
      s"1000 distinct keys across 8 chunks must yield strictly ascending " +
        s"bounds — a collapse means double precision loss: $bounds")
    // every bound is an actual key, not a rounded neighbor
    bounds.foreach(b => assert(b >= base && b <= base + 999L, s"bound $b"))
  }

  test("planChunkBounds rejects non-integral keys loudly") {
    import spark.implicits._
    val strKeys = Seq(("a", 1.0), ("b", 2.0)).toDF("pk", "val")
    val e1 = intercept[IllegalArgumentException] {
      Cdc.planChunkBounds(strKeys, "pk", 2)
    }
    assert(e1.getMessage.contains("must be integral"))
    val dblKeys = Seq((1.5, 1.0), (2.5, 2.0)).toDF("pk", "val")
    val e2 = intercept[IllegalArgumentException] {
      Cdc.planChunkBounds(dblKeys, "pk", 2)
    }
    assert(e2.getMessage.contains("must be integral"))
  }

  test("jdbcChunkPredicates: disjoint + total over the real corpus, " +
      "nulls land in chunk 0, skew-repeated bounds stay consistent") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // customer with a planted null-key row — a JDBC predicate read
    // returns ONLY rows some predicate matches, so the null arm is
    // part of the totality contract
    val base = spark.read.parquet(s"$sfSmoke/customer.parquet")
      .select($"c_custkey".as("pk"), $"c_acctbal".as("v"))
    val withNull = base.unionByName(
      Seq((Option.empty[Long], 0.0)).toDF("pk", "v"))
    val bounds = Cdc.planChunkBounds(base, "pk", 7)
    val preds = Cdc.jdbcChunkPredicates(bounds, "pk")
    assert(preds.length === 7)
    val counts = preds.map(p => withNull.filter(expr(p)).count())
    // total: every row (incl. the null) matched exactly once
    assert(counts.sum === withNull.count(),
      s"cover mismatch: $preds -> $counts")
    // disjoint: pairwise intersections empty
    for (i <- preds.indices; j <- preds.indices if j > i)
      assert(withNull.filter(expr(preds(i)) && expr(preds(j))).isEmpty,
        s"chunks $i and $j overlap")
    // null row is in chunk 0 and only chunk 0
    assert(withNull.filter($"pk".isNull && expr(preds.head)).count() === 1)
    // equi-depth: with a uniform key every chunk carries real rows and
    // no chunk exceeds ~2x the mean (sampled bounds, loose bound)
    val nonNullCounts = preds.map(p => base.filter(expr(p)).count())
    val mean = base.count().toDouble / preds.length
    assert(nonNullCounts.forall(_ > 0))
    assert(nonNullCounts.forall(_ <= mean * 2),
      s"straggler chunk: $nonNullCounts")
    // skew: a constant key degenerates to empty inner chunks but the
    // cover stays total + disjoint
    val skew = spark.range(100).select(lit(5L).as("pk"))
    val sb = Cdc.planChunkBounds(skew, "pk", 4)
    val sp = Cdc.jdbcChunkPredicates(sb, "pk")
    assert(sp.map(p => skew.filter(expr(p)).count()).sum === 100L)
  }
}
