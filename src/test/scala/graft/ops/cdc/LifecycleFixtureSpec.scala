package graft.ops.cdc

import graft.SparkSpec

/** The shared bench-fixture discipline (r16 verdict #3) plus the
  * ADVICE-r17 refinement: a PRISTINE, never-written fixture is a true
  * no-op on warm calls — no restore commit, no manifest-chain growth —
  * while a mutated fixture still rolls back to v1 state. */
class LifecycleFixtureSpec extends SparkSpec {

  test("pristine on a never-written fixture is a true no-op: the " +
      "manifest chain stays at v1 across warm calls (ADVICE r17 — " +
      "clone's source must not grow one version per bench rep)") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_fixture_noop").toString + "/t"
    var evals = 0
    def snap = { evals += 1; Seq((1L, 10L), (2L, 20L)).toDF("k", "v") }
    LifecycleFixture.pristine(spark, dir, "k", 2)(snap) // cold: init v1
    assert(evals == 1)
    assert(PartitionedUpsert.manifestOrFail(spark, dir).version == 1L)
    LifecycleFixture.pristine(spark, dir, "k", 2)(snap) // warm
    LifecycleFixture.pristine(spark, dir, "k", 2)(snap) // warm
    assert(evals == 1, "warm calls must not re-evaluate the snapshot")
    assert(PartitionedUpsert.manifestOrFail(spark, dir).version == 1L,
      "a never-written fixture must not accrete restore commits")
  }

  test("pristine on a MUTATED fixture restores v1 state (metadata-only " +
      "commit; snapshot expression untouched)") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_fixture_restore").toString + "/t"
    var evals = 0
    def snap = { evals += 1; Seq((1L, 10L), (2L, 20L)).toDF("k", "v") }
    LifecycleFixture.pristine(spark, dir, "k", 2)(snap) // v1
    // the measured statements mutate the table
    PartitionedUpsert.merge(spark, dir,
      Seq(("u", 5L, 1L, 111L)).toDF("__op", "__lsn", "k", "v"),
      "k", "__lsn", "__op", Seq("v"), 2) // v2
    LifecycleFixture.pristine(spark, dir, "k", 2)(snap) // restore → v3
    assert(evals == 1, "restore is metadata-only — no snapshot re-eval")
    val st = PartitionedUpsert.read(spark, dir).collect()
      .map(r => r.getLong(r.fieldIndex("k")) ->
        r.getLong(r.fieldIndex("v"))).toMap
    assert(st == Map(1L -> 10L, 2L -> 20L), "restored head IS v1 state")
  }
}
