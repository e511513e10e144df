package graft.ops.relational

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Graph substrate units beyond the oracled keys: the link-prediction
  * pair builder's mediator cap-and-flag contract. */
class GraphSpec extends SparkSpec {

  test("commonNeighborPairs: exact counts; a hub over the mediator cap " +
      "stops mediating and is flagged, never silently dropped") {
    import spark.implicits._
    // square 1-2-3-4-1 plus hub 0 adjacent to all four:
    // degrees d(0)=4, d(1..4)=3
    val e0 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L),
      (0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("u", "v")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // cap not engaged: (1,3) mediated by 2, 4 AND the hub
    val (pu, ou) = Graph.commonNeighborPairs(e0, maxMediatorDegree = 100)
    assert(ou.isEmpty)
    val mu = toMap(pu)
    assert(mu((1L, 3L)) === 3L && mu((2L, 4L)) === 3L)
    // cap 3: ONLY the hub is excluded, and it is returned in the flag
    // frame with its true degree; square pairs lose exactly the hub's
    // mediation, pairs the hub is PART of are unaffected (the cap
    // bounds mediators, not endpoints)
    val (pc, oc) = Graph.commonNeighborPairs(e0, maxMediatorDegree = 3)
    val over = oc.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(over.toSeq === Seq((0L, 4L)))
    val mc = toMap(pc)
    assert(mc((1L, 3L)) === 2L && mc((2L, 4L)) === 2L)
    assert(mc((0L, 2L)) === 2L, "hub-endpoint pairs keep their mediators")
    // no pair invents mediation: capped counts never exceed uncapped
    mc.foreach { case (k, v) => assert(v <= mu(k), s"pair $k grew under cap") }
  }

  test("connected components: labels are edge-consistent, canonical " +
      "(comp = min node id of its members), and sizes add up") {
    import spark.implicits._
    val cc = Graph.qGraphCc(spark, sfSmoke).collect()
      .map(r => (r.getAs[Long]("node"),
        (r.getAs[Long]("comp"), r.getAs[Long]("comp_size")))).toMap
    assert(cc.nonEmpty)
    // every edge's endpoints share a component (the fixed point IS a
    // valid labeling)
    val (e0, _) = Graph.coPurchaseGraph(spark, sfSmoke)
    e0.collect().foreach { r =>
      val (u, v) = (r.getAs[Long]("u"), r.getAs[Long]("v"))
      assert(cc(u)._1 === cc(v)._1, s"edge ($u,$v) straddles components")
    }
    // canonical label: the component id is the min member, and every
    // member's recorded size equals the member count
    cc.groupBy(_._2._1).foreach { case (comp, members) =>
      assert(members.keys.min === comp, s"comp $comp not the min member")
      members.values.foreach { case (_, sz) =>
        assert(sz === members.size.toLong, s"comp $comp size mismatch")
      }
    }
  }

  test("connected components: oracle cost guard — sum of comp_size^2 " +
      "stays inside the recursive-CTE budget at every oracled fixture") {
    // The DuckDB oracle materializes the reachability closure:
    // sum-over-components of comp_size^2 (node, m) pairs. That is fine
    // at the shipped fixtures (~3.5M pairs at sf0.01) but a regenerated
    // corpus with one dense giant component would blow the oracle up
    // SILENTLY — hours of CTE, not a wrong answer (ADVICE r13 /
    // VERDICT r13 #3). This guard fails LOUDLY first: if it trips,
    // either re-bound the co-purchase graph's edge threshold or switch
    // the oracle to an iterative min-label loop (FIXTURES.md §4).
    import spark.implicits._
    val budget = 50L * 1000 * 1000
    Seq(sfSmoke, sf("sf0.01")).foreach { d =>
      val pairs = Graph.qGraphCc(spark, d)
        .select($"comp", $"comp_size").distinct()
        .agg(sum($"comp_size" * $"comp_size")).head().getLong(0)
      assert(pairs < budget,
        s"$d: closure would materialize $pairs pairs (budget $budget) — " +
          "the q_graph_cc recursive-CTE oracle is no longer feasible " +
          "at this fixture; see FIXTURES.md §4")
    }
  }

  test("connected components: the jumping path and the large/small-star " +
      "fallback produce the IDENTICAL labeling on the real graph") {
    import spark.implicits._
    val viaKey = Graph.qGraphCc(spark, sfSmoke)
      .select($"node", $"comp")
    val (e0, _) = Graph.coPurchaseGraph(spark, sfSmoke)
    val es = e0.select($"u".as("src"), $"v".as("dst"))
      .union(e0.select($"v".as("src"), $"u".as("dst")))
    val viaStar = graft.ops.llm.DedupCluster
      .connectedComponentsStar(es, "src", "dst")
      .select($"id".as("node"), $"cluster".as("comp"))
    assert(viaKey.exceptAll(viaStar).isEmpty &&
      viaStar.exceptAll(viaKey).isEmpty,
      "jumping fixed point and star fixed point disagree")
  }

  test("degree histogram: masses sum to node count, cumulative share " +
      "reaches exactly 1") {
    val rows = Graph.qGraphDegreeHist(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    val degs = rows.map(_.getAs[Long]("degree"))
    assert(degs.sameElements(degs.sorted))
    val nodeSum = rows.map(_.getAs[Long]("n_nodes")).sum
    assert(rows.last.getAs[Long]("cum_nodes") === nodeSum)
    assert(rows.last.getAs[Double]("cum_share_4dp") === 1.0)
    // cumulative is the running sum of the masses
    var cum = 0L
    rows.foreach { r =>
      cum += r.getAs[Long]("n_nodes")
      assert(r.getAs[Long]("cum_nodes") === cum)
    }
  }
}
