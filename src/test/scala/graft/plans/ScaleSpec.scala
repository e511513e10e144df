package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.cdc.PartitionedUpsert
import graft.ops.llm.Knn

/** 100 TB-posture mechanisms: salted skew joins, bucketed co-located
  * joins, partition-pruned upsert, vector LSH. */
class ScaleSpec extends SparkSpec {

  test("saltedEquiJoin: same result as plain join, key spread over salts") {
    import spark.implicits._
    // pathological skew: 10k rows of one key
    val large = (1 to 10000).map(i => ("hot", i)).toDF("k", "payload")
      .unionAll(Seq(("cold", 0)).toDF("k", "payload"))
    val small = Seq(("hot", "H"), ("cold", "C")).toDF("k", "tag")
    val plain = large.join(small, "k")
    val salted = SaltedJoin.saltedEquiJoin(large, small, "k", saltFactor = 8)
    assert(salted.count() === plain.count())
    assert(salted.select("k", "payload", "tag").exceptAll(
      plain.select("k", "payload", "tag")).isEmpty)
  }

  test("bucketed tables co-locate: SMJ with no shuffle exchange") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS b1")
    spark.sql("DROP TABLE IF EXISTS b2")
    // the in-memory catalog forgets tables across JVMs but the
    // warehouse directories persist — clear them physically
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    Seq("b1", "b2").foreach { t =>
      def rec(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rec))
        f.delete(): Unit
      }
      rec(new java.io.File(s"$wh/$t"))
    }
    spark.read.parquet(s"$sfSmoke/orders.parquet")
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("b1")
    spark.read.parquet(s"$sfSmoke/customer.parquet")
      .withColumnRenamed("c_custkey", "o_custkey")
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("b2")
    val joined = spark.table("b1").hint("merge")
      .join(spark.table("b2"), "o_custkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() > 0)
  }

  test("PartitionedUpsert: merge rewrites only touched buckets") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pu").toString + "/tgt"
    val snap = (0L until 1000L).map(i => (i, i * 1.0)).toDF("pk", "val")
    PartitionedUpsert.init(snap, dir, "pk", nBuckets = 16)
    val before = (0 until 16).map(b =>
      b -> new java.io.File(s"$dir/bucket=$b").lastModified()).toMap
    Thread.sleep(1100)
    // changes touching exactly the buckets of keys 3 and 500
    val changes = Seq(
      (10L, 3L, "u", 33.3), (11L, 500L, "d", 0.0), (12L, 2000L, "c", 42.0))
      .toDF("lsn", "pk", "op", "val")
    val touched = PartitionedUpsert.merge(spark, dir, changes,
      "pk", "lsn", "op", Seq("val"), nBuckets = 16)
    val expectedBuckets = Seq(3L, 500L, 2000L)
      .map(k => spark.range(1).select(
        PartitionedUpsert.bucketOf(lit(k), 16)).head().getLong(0)).distinct.sorted
    assert(touched === expectedBuckets)
    // untouched buckets were not rewritten
    (0 until 16).filterNot(b => touched.contains(b.toLong)).foreach { b =>
      assert(new java.io.File(s"$dir/bucket=$b").lastModified() === before(b))
    }
    val state = PartitionedUpsert.read(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(state(3L) === 33.3)
    assert(!state.contains(500L))
    assert(state(2000L) === 42.0)
    assert(state.size === 1000)  // 1000 - 1 deleted + 1 inserted
  }

  test("PartitionedUpsert.merge is O(1) Spark jobs, not O(touched buckets)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pu3").toString + "/tgt"
    val snap = (0L until 1000L).map(i => (i, i * 1.0)).toDF("pk", "val")
    PartitionedUpsert.init(snap, dir, "pk", nBuckets = 16)
    // changes spread over (almost) every bucket
    val changes = (0L until 64L).map(i => (100L + i, i * 16L, "u", -1.0))
      .toDF("lsn", "pk", "op", "val")
    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val touched = PartitionedUpsert.merge(spark, dir, changes,
        "pk", "lsn", "op", Seq("val"), nBuckets = 16)
      Thread.sleep(1000) // listener events are async; margin is 48-vs-12
      assert(touched.size >= 10, s"want a many-bucket batch, got $touched")
      // the old per-bucket loop ran 3 jobs per touched bucket (~48 here);
      // the single-pass merge is a small constant regardless of fan-out
      // (~10 observed: AQE materializes each shuffle stage as a job)
      assert(jobs <= 12, s"merge ran $jobs jobs for ${touched.size} buckets")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("PartitionedUpsert.merge drops a bucket directory emptied by deletes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pu4").toString + "/tgt"
    val keys = (0L until 16L)
    val snap = keys.map(k => (k, 1.0)).toDF("pk", "val")
    PartitionedUpsert.init(snap, dir, "pk", nBuckets = 4)
    val bucketOfKey = keys.map { k =>
      k -> spark.range(1).select(PartitionedUpsert.bucketOf(lit(k), 4))
        .head().getLong(0)
    }.toMap
    // delete every key living in key 7's bucket → that bucket empties
    val b = bucketOfKey(7L)
    val toDelete = keys.filter(bucketOfKey(_) == b)
    assert(new java.io.File(s"$dir/bucket=$b").exists())
    val changes = toDelete.zipWithIndex
      .map { case (k, i) => (i.toLong + 1L, k, "d", 0.0) }
      .toDF("lsn", "pk", "op", "val")
    PartitionedUpsert.merge(spark, dir, changes, "pk", "lsn", "op", Seq("val"), 4)
    assert(!new java.io.File(s"$dir/bucket=$b").exists(),
      "emptied bucket directory must be removed, not left stale")
    assert(PartitionedUpsert.read(spark, dir).count() === 16L - toDelete.size)
  }

  test("PartitionedUpsert converges to batch Cdc.apply on the corpus log") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pu2").toString + "/tgt"
    val snap = spark.read.parquet(s"$sfSmoke/customer.parquet")
      .select($"c_custkey".as("pk"), $"c_acctbal".as("val"))
    val log = graft.ops.cdc.CdcQueries.changeLog(spark, sfSmoke)
      .withColumnRenamed("after_value", "val")
    PartitionedUpsert.init(snap, dir, "pk", nBuckets = 8)
    PartitionedUpsert.merge(spark, dir, log, "pk", "lsn", "op", Seq("val"), 8)
    val viaBuckets = PartitionedUpsert.read(spark, dir)
    val viaBatch = graft.ops.cdc.Cdc.apply(snap, log, Seq("pk"), "lsn", "op", Seq("val"))
      .drop("src")
    assert(viaBuckets.exceptAll(viaBatch).isEmpty &&
      viaBatch.exceptAll(viaBuckets).isEmpty)
  }

  test("hyperplane LSH finds planted cosine near-duplicates") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(16)(rnd.nextGaussian().toFloat)
    val base = (0L until 50L).map(i => (i, vec()))
    // plant near-dups: ids 1000+i are tiny perturbations of i (0..4)
    val dups = (0L until 5L).map(i =>
      (1000L + i, base(i.toInt)._2.map(x => x + 0.001f * rnd.nextGaussian().toFloat)))
    val corpus = (base ++ dups).toDF("vec_id", "embedding")
    val found = Knn.cosineNearDups(corpus, dim = 16, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 5L).foreach(i => assert(found.contains((i, 1000L + i)), s"missing pair $i"))
    // verified precision: every reported pair truly has cosine >= 0.99
    Knn.cosineNearDups(corpus, 16, 0.99)
      .collect().foreach(r => assert(r.getDouble(2) >= 0.99))
  }
}
