package graft.ops.cdc

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.functions.{JaroWinkler, ThetaSketchAgg}

/** Scalacheck invariants for the round-11 algebra: the Jaro-Winkler
  * kernel equals an independently-written reference over arbitrary
  * strings, theta exact-mode set algebra equals real set operations
  * over arbitrary set pairs, the blocked fuzzy join equals the brute
  * same-block cross product, and the maintained-sketch staleness
  * invariant (n − stale = live rows) holds under arbitrary op
  * interleavings (the Round10PropertiesSpec convention: fixed seed,
  * few-but-varied cases where each case runs Spark jobs, many cases
  * where it's driver-only arithmetic). */
class Round11PropertiesSpec extends SparkSpec {

  private def check(name: String, prop: Prop, cases: Int = 6): Unit = {
    val result = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(cases)
        .withInitialSeed(Seed(1142L)),
      prop)
    assert(result.passed, s"$name: $result")
  }

  /** Independent Jaro-Winkler reference: immutable-collection
    * formulation (indexOf-based greedy matching over an erasable
    * candidate list) — structurally different from the kernel's
    * mark-array scan. */
  private def jwReference(a: String, b: String): Double = {
    val s = a.getBytes("UTF-8").toSeq
    val t = b.getBytes("UTF-8").toSeq
    if (s.isEmpty || t.isEmpty) return 0.0
    val window = math.max(math.max(s.length, t.length) / 2 - 1, 0)
    // greedy in s-order: for each i, the first unused j in the window
    val matches = s.indices.foldLeft(List.empty[(Int, Int)]) { (acc, i) =>
      val used = acc.map(_._2).toSet
      val j = (math.max(0, i - window) to
        math.min(t.length - 1, i + window))
        .find(j => !used(j) && s(i) == t(j))
      j.map(jj => acc :+ (i -> jj)).getOrElse(acc)
    }
    val m = matches.length
    if (m == 0) return 0.0
    // transpositions: s-order matched bytes vs t-order matched bytes
    val sSeq = matches.map { case (i, _) => s(i) }
    val tSeq = matches.sortBy(_._2).map { case (_, j) => t(j) }
    val trans = sSeq.zip(tSeq).count { case (x, y) => x != y } / 2
    val md = m.toDouble
    val jaro = (md / s.length + md / t.length + (md - trans) / md) / 3.0
    if (jaro > 0.7) {
      val l = s.zip(t).take(4).takeWhile { case (x, y) => x == y }.length
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }

  test("property: JaroWinkler kernel == independent reference over " +
      "arbitrary byte strings (driver-only, many cases)") {
    val genStr = for {
      n <- Gen.chooseNum(0, 12)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd', 'é'))
    } yield cs.mkString
    check("jw-vs-reference", Prop.forAll(genStr, genStr) { (a, b) =>
      val kernel = JaroWinkler.similarity(
        UTF8String.fromString(a), UTF8String.fromString(b))
      val ref = jwReference(a, b)
      math.abs(kernel - ref) < 1e-12
    }, cases = 300)
  }

  test("property: theta exact-mode set algebra equals real set " +
      "operations over arbitrary set pairs") {
    import spark.implicits._
    ThetaSketchAgg.register(spark)
    val genSet = for {
      n <- Gen.chooseNum(0, 120)
      xs <- Gen.listOfN(n, Gen.chooseNum(0, 200))
    } yield xs.map(i => s"m$i").toSet
    check("theta-set-algebra", Prop.forAll(genSet, genSet) { (sa, sb) =>
      if (sa.isEmpty || sb.isEmpty) true // empty agg yields NULL blob
      else {
        def blob(s: Set[String]) = s.toSeq.toDF("v")
          .agg(ThetaSketchAgg.theta_agg($"v").as("sk"))
          .head().getAs[Array[Byte]]("sk")
        val (a, b) = (blob(sa), blob(sb))
        def est(x: Array[Byte]) = math.round(ThetaSketchAgg.estimate(x))
        est(a) == sa.size &&
          est(ThetaSketchAgg.union(a, b)) == (sa ++ sb).size &&
          est(ThetaSketchAgg.intersect(a, b)) == (sa & sb).size &&
          est(ThetaSketchAgg.aNotB(a, b)) == (sa -- sb).size
      }
    }, cases = 6)
  }

  test("property: uncapped blocked fuzzy join equals the brute " +
      "same-block cross product") {
    import spark.implicits._
    val genNames = for {
      n <- Gen.chooseNum(1, 25)
      xs <- Gen.listOfN(n, for {
        blk <- Gen.oneOf("app", "bat", "cat")
        tail <- Gen.listOfN(4, Gen.oneOf('x', 'y', 'z')).map(_.mkString)
      } yield blk + tail)
    } yield xs.distinct
    check("fuzzy-vs-brute", Prop.forAll(genNames, genNames) { (ls, rs) =>
      val left = ls.toDF("probe")
      val right = rs.toDF("name")
      val (pairs, _) = graft.ops.relational.FuzzyJoin.blockedJaroWithStats(
        left, right, "probe", "name", blockLen = 3, threshold = 0.8,
        maxBlockSize = 1000000)
      val got = pairs.select($"probe", $"name").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      val want = (for {
        p <- ls; n <- rs
        if p.take(3).toLowerCase == n.take(3).toLowerCase
        if jwReference(p, n) >= 0.8
      } yield (p, n)).toSet
      got == want
    }, cases = 5)
  }

  test("property: maintained-sketch staleness invariant n − stale = " +
      "live rows under arbitrary op interleavings (NDV instantiation)") {
    import spark.implicits._
    val genOps: Gen[List[(Long, String, String, String)]] = for {
      n <- Gen.chooseNum(2, 40)
      rows <- Gen.listOfN(n, for {
        pk <- Gen.chooseNum(0L, 9L)
        grp <- Gen.oneOf("a", "b")
        v <- Gen.chooseNum(0, 6).map(i => s"v$i")
        op <- Gen.frequency(6 -> Gen.const("u"), 2 -> Gen.const("d"))
      } yield (pk, grp, v, op))
    } yield rows
    check("ndv-staleness", Prop.forAll(genOps) { ops =>
      val base = java.nio.file.Files
        .createTempDirectory("graft_p11").toString
      val (srcDir, nDir) = (s"$base/src", s"$base/n")
      PartitionedUpsert.init(
        Seq((100L, "a", "seed")).toDF("pk", "grp", "v"), srcDir, "pk", 2)
      NdvMaintain.init(spark, srcDir, nDir, Seq("grp"), "v", 2)
      // split the op stream into two maintenance windows
      val (w1, w2) = ops.splitAt(ops.length / 2)
      Seq(w1, w2).filter(_.nonEmpty).zipWithIndex.foreach { case (w, i) =>
        PartitionedUpsert.merge(spark, srcDir,
          w.zipWithIndex.map { case ((pk, g, v, op), j) =>
            (pk, (i * 1000 + j + 1).toLong, op, g, v) }
            .toDF("pk", "lsn", "op", "grp", "v"),
          "pk", "lsn", "op", Seq("grp", "v"), nBuckets = 2)
        NdvMaintain.maintain(spark, srcDir, nDir, "v"): Unit
      }
      val live = PartitionedUpsert.read(spark, srcDir)
        .filter($"v".isNotNull).groupBy($"grp").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val prof = PartitionedUpsert.read(spark, nDir)
        .collect().map(r => r.getAs[String]("grp") ->
          (r.getAs[Long]("n") - r.getAs[Long]("stale"))).toMap
      prof.forall { case (g, liveFromProfile) =>
        liveFromProfile == live.getOrElse(g, 0L) }
    }, cases = 4)
  }
}
