package graft.ops.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate edge list — the step
  * that turns pairwise near-dup hits (MinHash/SimHash/shingle
  * verifiers in [[NearDup]]) into CLUSTERS, so a pipeline can keep one
  * canonical document per duplicate group instead of reasoning about
  * an unbounded pair soup.
  *
  * Algorithm: hash-min label propagation. Every node starts labelled
  * with its own id; each round every node takes the min label over
  * itself and its neighbors; fixpoint = every node carries the min id
  * of its component. Each round is ONE join + ONE groupBy (two
  * shuffles on node id) over the edge list — no driver-side graph
  * state, so the edge list can be arbitrarily large. Rounds needed =
  * graph diameter; near-dup clusters are small and dense (diameter a
  * handful), which is exactly the regime where hash-min beats the
  * fancier alternatives. For adversarial high-diameter graphs the
  * published fix is alternating large-star/small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) which
  * converges in O(log²) rounds — implemented as
  * [[connectedComponentsStar]] behind the same signature; DedupSpec
  * proves label equivalence on the standard fixture and O(log n)
  * convergence on a chain corpus where hash-min would need O(n)
  * rounds.
  *
  * `localCheckpoint` after every round truncates the lineage — an
  * iterative plan otherwise doubles per round until Catalyst analysis
  * time dominates (the classic iterative-algorithm trap at scale).
  */
object DedupCluster {

  /** Free the cached blocks behind a localCheckpoint-ed frame (or a
    * projection of one). `Dataset.unpersist` only clears CacheManager
    * entries — a localCheckpoint persists at the RDD layer, so without
    * this every propagation round leaks its predecessor's blocks on
    * the executors for the life of the job (review finding r5). */
  private def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = false))

  /** Cluster ids for every node appearing in `edges`: returns
    * (id, cluster) where cluster = min node id reachable over the
    * undirected edge set. Deterministic (min is order-free).
    *
    * @param maxIter hard bound on loop iterations (each runs TWO
    *                propagation rounds — see below), so label
    *                propagation reaches up to 2·maxIter hops; the
    *                fixpoint check stops earlier as soon as no label
    *                changes.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 50): DataFrame = {
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    // materialize the caller's edge pipeline ONCE before symmetrizing —
    // the union's two branches would otherwise each re-evaluate it
    // (candidate generation is the expensive stage: shingling, LSH,
    // verification; measured 2× on the shingle path)
    val e = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .localCheckpoint()
    // symmetrize: propagate both directions
    val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .localCheckpoint()
    unpersistCheckpoint(e) // sym is materialized; e's blocks are dead
    var labels = sym.select(col("a").as("id")).distinct()
      .select(col("id"), col("id").as("cluster"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // TWO propagation rounds per materialization: min-propagation is
      // monotone and idempotent, so overshooting a round past the
      // fixpoint changes nothing, and folding two rounds into one
      // checkpointed job halves the dominant cost at small diameters —
      // per-round job scheduling, not data volume
      def round(l: DataFrame): DataFrame =
        l.select(col("id"), col("cluster"), lit(true).as("self"))
          .union(sym.join(l.withColumnRenamed("id", "b"), "b")
            .select(col("a").as("id"), col("cluster"), lit(false).as("self")))
          .groupBy("id").agg(
            min("cluster").as("cluster"),
            // OLD label carried through the same aggregation (each id
            // has exactly one self row), so convergence is a cheap
            // filter over the checkpointed result — no old-vs-new join
            min(when(col("self"), col("cluster"))).as("prev"))
      val next = round(round(labels).select(col("id"), col("cluster")))
        .localCheckpoint()
      // prev spans only the SECOND round, but monotonicity makes the
      // check correct: a change in round 1 either persists into round 2
      // (caught) or round 1 already hit the fixpoint (nothing lost)
      converged = next.filter(col("cluster") =!= col("prev")).isEmpty
      // `next` is materialized — the previous round's checkpoint (which
      // `labels` projects over) can release its executor blocks now
      unpersistCheckpoint(labels)
      labels = next.select(col("id"), col("cluster"))
      iter += 1
    }
    unpersistCheckpoint(sym) // the caller only needs the final labels
    labels
  }

  /** Connected components by alternating large-star/small-star
    * (Kiveris et al., SoCC'14 — public algorithm): the adversarial-
    * diameter swap-in for [[connectedComponents]], same signature,
    * same output contract. Each iteration rewires the edge set —
    * large-star attaches every strictly-larger neighbor of a node to
    * the minimum of its closed neighborhood; small-star attaches the
    * smaller neighbors (and the node) to that minimum — so long
    * chains COLLAPSE multiplicatively instead of shrinking one hop
    * per round: O(log² n) iterations worst case vs hash-min's
    * diameter. Per-iteration cost is the same two-shuffle class
    * (groupBy min + join), edges stay an arbitrarily large
    * distributed frame, and every iteration localCheckpoints +
    * releases its predecessor exactly like the hash-min loop.
    *
    * Convergence = the edge multiset stops changing, detected by an
    * order-free (count, sum(xxhash64(a,b))) checksum — one tiny agg
    * per iteration instead of a self-join set compare. At the
    * fixpoint the graph is a union of stars centered at component
    * minima (the paper's invariant), so labels read directly off the
    * final edges. */
  def connectedComponentsStar(edges: DataFrame, srcCol: String,
                              dstCol: String, maxIter: Int = 50): DataFrame = {
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    // canonical a > b, self-loops dropped; both star steps preserve
    // the invariant (each emitted (v, m) has v > m by construction)
    var e = edges
      .select(greatest(col(srcCol), col(dstCol)).as("a"),
        least(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint()
    // order-free edge-set signature; the hash sum rides decimal(38,0)
    // because full-range longs overflow ANSI bigint sums
    def checksum(df: DataFrame): (Long, String) = {
      val r = df.agg(count(lit(1)),
        coalesce(sum(xxhash64(col("a"), col("b")).cast("decimal(38,0)")),
          lit(java.math.BigDecimal.ZERO))).head()
      (r.getLong(0), r.getDecimal(1).stripTrailingZeros.toPlainString)
    }
    var sig = checksum(e)
    var iter = 0
    var converged = sig._1 == 0L
    while (!converged && iter < maxIter) {
      // LARGE-STAR: per node u over the symmetrized neighborhood,
      // m = min(u, N(u)); every neighbor v > u re-attaches to m
      val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
      val mins = sym.groupBy("a")
        .agg(least(col("a"), min(col("b"))).as("m"))
      val ls = sym.join(mins, "a").filter(col("b") > col("a"))
        .select(col("b").as("a"), col("m").as("b"))
        .distinct()
      // SMALL-STAR: edges now point large→small; per node a,
      // m = min neighbor; the other small neighbors and a itself
      // attach to m
      val mins2 = ls.groupBy("a").agg(min(col("b")).as("m"))
      val next = ls.join(mins2, "a").filter(col("b") =!= col("m"))
        .select(col("b").as("a"), col("m").as("b"))
        .union(mins2.select(col("a"), col("m").as("b")))
        .distinct()
        .localCheckpoint()
      val nsig = checksum(next)
      converged = nsig == sig
      sig = nsig
      unpersistCheckpoint(e)
      e = next
      iter += 1
    }
    // fixpoint: stars centered at component minima — label every
    // endpoint; min() is a safety net, at the fixpoint each non-center
    // node already carries exactly its component min
    val labels = e.select(col("a").as("id"), col("b").as("cluster"))
      .union(e.select(col("b").as("id"), col("b").as("cluster")))
      .groupBy("id").agg(min(col("cluster")).as("cluster"))
    labels
  }

  /** Assign every document a duplicate-cluster id: nodes in `edges`
    * get their component's min doc id, everything else is a singleton
    * (its own id) — the shape a "keep one per cluster" filter wants.
    * `docs` must carry `idCol`; output = docs + `cluster`. */
  def assignClusters(docs: DataFrame, edges: DataFrame, idCol: String,
                     srcCol: String, dstCol: String,
                     maxIter: Int = 50): DataFrame = {
    val cc = connectedComponents(edges, srcCol, dstCol, maxIter)
      .withColumnRenamed("id", idCol)
    // components are ≤ |edge endpoints| rows — broadcast-sized for any
    // sane duplicate rate; at pathological rates AQE picks the join
    docs.join(cc, Seq(idCol), "left")
      .withColumn("cluster", coalesce(col("cluster"), col(idCol)))
  }
}
