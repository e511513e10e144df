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
  * converges in O(log²) rounds — same per-round shuffle shape, so it
  * can be swapped in behind this signature if a corpus ever produces
  * chain-shaped duplicate graphs.
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
