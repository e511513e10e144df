package graft.ops.cdc

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Table-backed maintained COUNT DISTINCT — the production twin of
  * q_cdc_incr_distinct: the re-keyed (group, value) multiplicity table
  * is an ORDINARY maintained aggregate (AggMaintain keyed by
  * gkey=(grp, v)), so the whole exactly-once/no-op/CDF machinery comes
  * for free; the distinct count reads off its surviving rows. This
  * spec proves the composition through the last-copy discipline and a
  * value-move, against direct count(DISTINCT) recomputes. */
class DistinctMaintainSpec extends SparkSpec {

  test("maintained (grp, v) multiplicity table yields exact COUNT " +
      "DISTINCT through duplicate deletes, last-copy deletes, and " +
      "value moves") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_dm").toString
    val (srcDir, aggDir) = (s"$base/src", s"$base/agg")
    // source: pk -> (grp, v); v=10 duplicated in grp a
    PartitionedUpsert.init(
      Seq((1L, "a", 10L), (2L, "a", 10L), (3L, "a", 20L),
        (4L, "b", 30L)).toDF("pk", "grp", "v"),
      srcDir, "pk", nBuckets = 4)
    AggMaintain.initAggregate(spark, srcDir, aggDir,
      groupCols = Seq("grp", "v"), sumCols = Seq.empty, nBuckets = 4)

    def maintainedDistinct(): Map[String, (Long, Long)] =
      AggMaintain.readAggregate(spark, aggDir)
        .groupBy($"grp")
        .agg(count(lit(1)).as("nd"), sum($"cnt").as("nr"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2))).toMap

    def directDistinct(): Map[String, (Long, Long)] =
      PartitionedUpsert.read(spark, srcDir)
        .groupBy($"grp")
        .agg(countDistinct($"v").as("nd"), count($"v").as("nr"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2))).toMap

    assert(maintainedDistinct() === directDistinct())
    assert(maintainedDistinct()("a") === ((2L, 3L)))

    def window(rows: Seq[(Long, Long, String, String, Long)]): Unit = {
      PartitionedUpsert.merge(spark, srcDir,
        rows.toDF("pk", "lsn", "op", "grp", "v"),
        "pk", "lsn", "op", Seq("grp", "v"), nBuckets = 4)
      AggMaintain.maintainAggregate(spark, srcDir, aggDir): Unit
    }

    // duplicate delete: one copy of (a, 10) goes — distinct HOLDS at 2
    window(Seq((2L, 100L, "d", "a", 10L)))
    assert(maintainedDistinct() === directDistinct())
    assert(maintainedDistinct()("a") === ((2L, 2L)),
      "count must not drop while a copy survives")
    // last-copy delete: (a, 10) fully gone — distinct drops to 1
    window(Seq((1L, 101L, "d", "a", 10L)))
    assert(maintainedDistinct() === directDistinct())
    assert(maintainedDistinct()("a") === ((1L, 1L)))
    // value move: pk=4 changes value within grp b — distinct stays 1,
    // and a group-move (b -> a) shifts both counts
    window(Seq((4L, 102L, "u", "b", 31L)))
    assert(maintainedDistinct() === directDistinct())
    window(Seq((4L, 103L, "u", "a", 31L)))
    val m = maintainedDistinct()
    assert(m === directDistinct())
    assert(m("a") === ((2L, 2L)) && !m.contains("b"),
      "group move must shift the distinct count across groups")
  }
}
