package graft.ops.cdc

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Derived tables compose into a DAG: fact + dim → maintained join →
  * maintained aggregate, every hop incremental. The join
  * materialization is itself a PartitionedUpsert target, so
  * AggMaintain consumes ITS change data feed with zero new machinery —
  * after every window, the aggregate at the end of the chain must
  * equal a from-scratch recompute through both hops. */
class DerivedDagSpec extends SparkSpec {

  private val FactCols = Seq("cents", "fk")
  private val DimCols = Seq("dname")

  private def dirs(): (String, String, String, String) = {
    val base = java.nio.file.Files.createTempDirectory("graft_dag").toString
    (s"$base/fact", s"$base/dim", s"$base/join", s"$base/agg")
  }

  /** From-scratch reference through BOTH hops: re-join the committed
    * states, aggregate the result per dname (null dname = the
    * unmatched rows' group — a real SQL group). */
  private def direct(factDir: String, dimDir: String) =
    AggMaintain.exposed(
      AggMaintain.fullAggregate(
        JoinMaintain.fullJoin(
          PartitionedUpsert.read(spark, factDir),
          PartitionedUpsert.read(spark, dimDir),
          "pk", "fk", "dk", FactCols, DimCols),
        DimCols, Seq("cents")),
      DimCols, Seq("cents"))

  private def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (Option(r.getAs[String]("dname")), r.getAs[Long]("cnt"),
      Option(r.getAs[java.lang.Long]("sum_cents")).map(_.longValue)))
    .sortBy(_._1).toSeq

  private def step(factDir: String, dimDir: String, joinDir: String,
                   aggDir: String): Unit = {
    JoinMaintain.maintainJoin(spark, factDir, dimDir, joinDir)
    AggMaintain.maintainAggregate(spark, joinDir, aggDir): Unit
  }

  private def assertChain(factDir: String, dimDir: String,
                          aggDir: String): Unit =
    assert(rows(AggMaintain.readAggregate(spark, aggDir)) ===
      rows(direct(factDir, dimDir)),
      "the end of the incremental chain must equal a two-hop recompute")

  private def jLong(v: Long): java.lang.Long = java.lang.Long.valueOf(v)
  private val nullLong = null.asInstanceOf[java.lang.Long]

  test("fact and dim windows propagate through join → aggregate, " +
      "including a dim rename that migrates a whole group and a dim " +
      "delete that moves rows into the null-dname group") {
    import spark.implicits._
    val (factDir, dimDir, joinDir, aggDir) = dirs()
    val fact = Seq(
      (1L, jLong(100L), jLong(10L)), (2L, jLong(200L), jLong(10L)),
      (3L, jLong(300L), jLong(20L)), (4L, nullLong, jLong(99L))
    ).toDF("pk", "cents", "fk")
    val dim = Seq((10L, "ten"), (20L, "twenty")).toDF("dk", "dname")
    PartitionedUpsert.init(fact, factDir, "pk", 4)
    PartitionedUpsert.init(dim, dimDir, "dk", 2)
    JoinMaintain.initJoin(spark, factDir, dimDir, joinDir, "fk", 4)
    AggMaintain.initAggregate(spark, joinDir, aggDir, DimCols,
      Seq("cents"), nBuckets = 2)
    assertChain(factDir, dimDir, aggDir)
    // the dangler starts in the null-dname group
    assert(rows(AggMaintain.readAggregate(spark, aggDir))
      .exists(r => r._1.isEmpty && r._2 === 1L))

    // window 1 — fact: insert into 'ten', retarget pk3 20→10, delete
    // pk2 (all three mutate group sums through the join hop)
    PartitionedUpsert.merge(spark, factDir,
      Seq((100L, 5L, "c", jLong(500L), jLong(10L)),
        (101L, 3L, "u", jLong(310L), jLong(10L)),
        (102L, 2L, "d", nullLong, nullLong))
        .toDF("lsn", "pk", "op", "cents", "fk"),
      "pk", "lsn", "op", FactCols, 4)
    step(factDir, dimDir, joinDir, aggDir)
    assertChain(factDir, dimDir, aggDir)

    // window 2 — dim: rename 'ten'→'TEN' (EVERY member row changes
    // group: the old group must vanish, the new one inherit), insert
    // dk=99 (the dangler leaves the null group), delete dk=20 (its
    // members fall INTO the null group)
    PartitionedUpsert.merge(spark, dimDir,
      Seq((200L, 10L, "u", "TEN"), (201L, 99L, "c", "ninetynine"),
        (202L, 20L, "d", null.asInstanceOf[String]))
        .toDF("lsn", "dk", "op", "dname"),
      "dk", "lsn", "op", DimCols, 2)
    step(factDir, dimDir, joinDir, aggDir)
    assertChain(factDir, dimDir, aggDir)
    val byGroup = rows(AggMaintain.readAggregate(spark, aggDir))
      .map(r => r._1 -> r).toMap
    assert(!byGroup.contains(Some("ten")) && byGroup.contains(Some("TEN")),
      "a dim rename must migrate the whole group through the chain")
    assert(byGroup(Some("ninetynine"))._2 === 1L,
      "the resurrected dangler must reach its new group")

    // windows 3+4 — one step catches up TWO join windows: the join
    // maintains twice before the aggregate maintains once
    PartitionedUpsert.merge(spark, factDir,
      Seq((300L, 6L, "c", jLong(600L), jLong(99L)))
        .toDF("lsn", "pk", "op", "cents", "fk"),
      "pk", "lsn", "op", FactCols, 4)
    JoinMaintain.maintainJoin(spark, factDir, dimDir, joinDir)
    PartitionedUpsert.merge(spark, factDir,
      Seq((400L, 6L, "u", jLong(610L), jLong(99L)))
        .toDF("lsn", "pk", "op", "cents", "fk"),
      "pk", "lsn", "op", FactCols, 4)
    JoinMaintain.maintainJoin(spark, factDir, dimDir, joinDir)
    val (f, t) = AggMaintain.maintainAggregate(spark, joinDir, aggDir)
    assert(t - f === 2L, "the aggregate hop must span both join versions")
    assertChain(factDir, dimDir, aggDir)
  }
}
