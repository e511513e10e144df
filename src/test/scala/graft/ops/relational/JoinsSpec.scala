package graft.ops.relational

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.plans.AsofJoin

class JoinsSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("physical strategies match the declared operator") {
    assert(plan(Joins.qJoinBroadcast(spark, sfSmoke)).contains("BroadcastHashJoin"))
    assert(plan(Joins.qJoinSortmerge(spark, sfSmoke)).contains("SortMergeJoin"))
    assert(plan(Joins.qJoinShufflehash(spark, sfSmoke)).contains("ShuffledHashJoin"))
    assert(plan(Joins.qJoinTheta(spark, sfSmoke)).contains("BroadcastNestedLoopJoin"))
  }

  test("semi + anti partition the customer table") {
    val semi = Joins.qJoinSemi(spark, sfSmoke).count()
    val anti = Joins.qJoinAnti(spark, sfSmoke).count()
    val total = spark.read.parquet(s"$sfSmoke/customer.parquet").count()
    assert(semi > 0 && anti > 0 && semi + anti === total)
  }

  test("theta join covers every order exactly once") {
    val n = Joins.qJoinTheta(spark, sfSmoke).count()
    assert(n === spark.read.parquet(s"$sfSmoke/orders.parquet").count())
  }

  test("asofBackward: literal semantics — inclusive, backward, tie-broken, outer") {
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")),  // exact tie with r2/r3
      (2L, "u1", ts("2024-01-01 09:00:00")),  // before any right → null
      (3L, "u2", ts("2024-01-01 12:00:00")),  // normal backward pick
      (4L, "u3", ts("2024-01-01 12:00:00"))   // key with no right rows
    ).toDF("lid", "k", "t")
    val right = Seq(
      (10L, "u1", ts("2024-01-01 10:00:00"), 1.0), // tie, smaller id
      (11L, "u1", ts("2024-01-01 10:00:00"), 2.0), // tie, larger id → wins
      (12L, "u2", ts("2024-01-01 11:00:00"), 3.0),
      (13L, "u2", ts("2024-01-01 11:30:00"), 4.0), // latest <= 12:00 → wins
      (14L, "u2", ts("2024-01-01 12:30:00"), 5.0)  // after left → ignored
    ).toDF("rid", "k", "t", "v")
    val out = AsofJoin.asofBackward(left, right, Seq("k"), "t", "t",
        Seq("rid", "v"), tieBreak = "rid")
      .select($"lid", $"asof_rid", $"asof_v").collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(out(1L) === (Some(11L), Some(2.0)))   // inclusive + max-tieBreak
    assert(out(2L) === (None, None))             // nothing at-or-before
    assert(out(3L) === (Some(13L), Some(4.0)))   // backward latest
    assert(out(4L) === (None, None))             // unmatched key
  }

  test("asofForward: literal semantics — inclusive, forward, min-tie, outer") {
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")),  // exact tie with r10/r11
      (2L, "u1", ts("2024-01-01 11:00:00")),  // after all right → null
      (3L, "u2", ts("2024-01-01 10:00:00")),  // normal forward pick
      (4L, "u3", ts("2024-01-01 12:00:00"))   // key with no right rows
    ).toDF("lid", "k", "t")
    val right = Seq(
      (10L, "u1", ts("2024-01-01 10:00:00"), 1.0), // tie, smaller id → wins
      (11L, "u1", ts("2024-01-01 10:00:00"), 2.0), // tie, larger id
      (12L, "u2", ts("2024-01-01 09:00:00"), 3.0), // before left → ignored
      (13L, "u2", ts("2024-01-01 10:30:00"), 4.0), // earliest >= 10:00 → wins
      (14L, "u2", ts("2024-01-01 11:30:00"), 5.0)
    ).toDF("rid", "k", "t", "v")
    val out = AsofJoin.asofForward(left, right, Seq("k"), "t", "t",
        Seq("rid", "v"), tieBreak = "rid")
      .select($"lid", $"asof_rid", $"asof_v").collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(out(1L) === (Some(10L), Some(1.0)))   // inclusive + min-tieBreak
    assert(out(2L) === (None, None))             // nothing at-or-after
    assert(out(3L) === (Some(13L), Some(4.0)))   // forward earliest
    assert(out(4L) === (None, None))             // unmatched key
  }

  test("asofForward plan: single shuffle, no nested loop; count preserved") {
    import spark.implicits._
    val ev = graft.Tables.table(spark, sfSmoke, "events")
    val l = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("pid"), $"user_id", $"ts")
    val r = ev.filter($"event_type" === "view")
      .select($"event_id", $"user_id", $"ts", $"value")
    val out = AsofJoin.asofForward(l, r, Seq("user_id"), "ts", "ts",
      Seq("event_id"), "event_id")
    assert(out.count() === l.count())
    val p = plan(out)
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
    assert(p.contains("Window"), p)
  }

  test("asofBackward: NULL right values never tear rows apart") {
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq((1L, "u", ts("2024-01-01 12:00:00"))).toDF("lid", "k", "t")
    val right = Seq(
      (5L, "u", ts("2024-01-01 10:00:00"), Some(3.0)),
      (9L, "u", ts("2024-01-01 11:00:00"), None)  // latest, value NULL
    ).toDF("rid", "k", "t", "v")
    val out = AsofJoin.asofBackward(left, right, Seq("k"), "t", "t",
      Seq("rid", "v"), tieBreak = "rid").head()
    // must be the (9, NULL) row — not a chimera of rid=9 with v=3.0
    assert(out.getAs[Long]("asof_rid") === 9L)
    assert(out.isNullAt(out.fieldIndex("asof_v")))
  }

  test("asofBackward matches the naive theta-join implementation on the corpus") {
    import spark.implicits._
    val ev = graft.Tables.table(spark, sfSmoke, "events")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id", $"ts")
    val views = ev.filter($"event_type" === "view")
      .select($"event_id", $"user_id", $"ts", $"value")
    val fast = AsofJoin.asofBackward(purchases, views, Seq("user_id"), "ts", "ts",
      Seq("event_id", "value"), "event_id").select("purchase_id", "asof_event_id")
    val naive = AsofJoin.asofBackwardNaive(purchases, views, Seq("user_id"), "ts", "ts",
      Seq("event_id", "value"), "event_id").select("purchase_id", "asof_event_id")
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
    assert(fast.count() === purchases.count())
  }

  test("asofBackward plan: single shuffle on keys, no nested-loop join") {
    import spark.implicits._
    val ev = graft.Tables.table(spark, sfSmoke, "events")
    val l = ev.filter($"event_type" === "purchase").select($"event_id".as("pid"), $"user_id", $"ts")
    val r = ev.filter($"event_type" === "view").select($"event_id", $"user_id", $"ts", $"value")
    val p = plan(AsofJoin.asofBackward(l, r, Seq("user_id"), "ts", "ts", Seq("event_id"), "event_id"))
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
    assert(p.contains("Window"), p)
  }

  test("q_join_skew_salted: equals the unsalted join; hot key present") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val salted = Joins.qJoinSkewSalted(spark, sfSmoke)
    assert(!salted.columns.contains("__salt"))
    val fact = graft.Tables.table(spark, sfSmoke, "lineitem")
      .select(
        when($"l_orderkey" % 3 === 0, 0L)
          .otherwise(pmod($"l_suppkey", lit(100L))).as("k"),
        round($"l_extendedprice" * 100).cast("long").as("cents"))
    val dim = graft.Tables.table(spark, sfSmoke, "supplier")
      .groupBy(pmod($"s_suppkey", lit(100L)).as("k"))
      .agg(min($"s_name").as("dim_name"))
    val plain = fact.join(dim, Seq("k"))
      .groupBy($"k", $"dim_name")
      .agg(count(lit(1)).as("n_rows"), sum($"cents").as("sum_cents"))
      .orderBy($"k")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // the planted hot key dominates: ~1/3 of the fact on key 0
    val hot = salted.filter($"k" === 0).head().getAs[Long]("n_rows")
    val total = salted.agg(sum($"n_rows")).head().getLong(0)
    assert(hot * 2 > total / 2, s"hot=$hot total=$total — skew fixture lost")
  }
}
