package graft.ops.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Large-star/small-star connected components: label equivalence with
  * the hash-min propagator on the standard fixtures, and the
  * adversarial-diameter contract — a chain corpus collapses in
  * O(log n) iterations where hash-min's per-round one-hop propagation
  * needs O(n). */
class DedupStarSpec extends SparkSpec {

  test("star CC matches hash-min on the standard fixture") {
    import spark.implicits._
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("src", "dst")
    val hm = DedupCluster.connectedComponents(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val st = DedupCluster.connectedComponentsStar(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(st == hm)
    assert(Seq(1L, 2L, 3L, 4L).forall(st(_) == 1L))
  }

  test("star CC: direction, duplicates and self-loops don't matter") {
    import spark.implicits._
    val e = Seq((9L, 5L), (7L, 9L), (9L, 7L), (5L, 5L)).toDF("src", "dst")
    val st = DedupCluster.connectedComponentsStar(e, "src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(st == Set((5L, 5L), (7L, 5L), (9L, 5L)))
  }

  test("star CC handles an empty edge list") {
    import spark.implicits._
    val e = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(DedupCluster.connectedComponentsStar(e, "src", "dst").isEmpty)
  }

  test("star CC == union-find on random graphs (property)") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.rng.Seed
    val genEdges: Gen[List[(Long, Long)]] = for {
      n <- Gen.chooseNum(1, 60)
      es <- Gen.listOfN(n, for {
        a <- Gen.chooseNum(0L, 30L)
        b <- Gen.chooseNum(0L, 30L)
      } yield (a, b))
    } yield es
    def unionFind(es: List[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      parent.keys.toSeq.map(x => x -> find(x)).toMap
    }
    val prop = Prop.forAll(genEdges) { es =>
      // drop pure self-loop nodes from the reference: an edge list's
      // (x,x) row carries no component info and star CC (like the
      // canonical edge cut in hash-min's callers) drops it
      val expected = unionFind(es).filter { case (k, _) =>
        es.exists(e => (e._1 == k || e._2 == k) && e._1 != e._2) }
      val got = DedupCluster.connectedComponentsStar(
        es.toDF("src", "dst"), "src", "dst")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == expected
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8)
        .withInitialSeed(Seed(20260813L)), prop)
    assert(result.passed, result.status.toString)
  }

  test("chain corpus: star converges in O(log n) iterations where hash-min cannot") {
    import spark.implicits._
    // a 1024-node path — diameter 1023. Hash-min propagates ≤ 2 hops
    // per iteration (two folded rounds), so 10 iterations move the min
    // label at most 20 hops: provably NOT converged. Star collapses
    // chains multiplicatively: the SAME 10-iteration budget (≥ log2 n)
    // must fully label the component.
    val n = 1024
    val edges = spark.range(1, n)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
    val budget = 10
    val star = DedupCluster.connectedComponentsStar(
      edges, "src", "dst", maxIter = budget)
    assert(star.count() == n.toLong)
    assert(star.filter(col("cluster") =!= 1L).isEmpty,
      s"star CC must collapse the $n-chain to cluster 1 within $budget iterations")
    val hashMin = DedupCluster.connectedComponents(
      edges, "src", "dst", maxIter = budget)
    assert(hashMin.filter(col("cluster") =!= 1L).count() > 0,
      "hash-min at the same iteration budget must still be unconverged " +
        "on the chain — otherwise this fixture proves nothing")
  }
}
