package graft.ops.relational

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class RelationalBasicsSpec extends SparkSpec {

  test("q_scan_parquet: one row per table with exact smoke counts") {
    val rows = Scans.qScanParquet(spark, sfSmoke).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("region") === 5L && rows("nation") === 25L &&
      rows("lineitem") === 6000L && rows("documents") === 500L)
  }

  test("q_scan_pruned: filter + projection are pushed into the parquet scan") {
    val df = Scans.qScanPruned(spark, sfSmoke)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThan(l_extendedprice,90000.0)"), plan)
    // pruned read schema: only the 3 projected columns reach the reader
    assert(plan.contains("ReadSchema") && !plan.contains("l_returnflag"), plan)
    assert(df.count() > 0)
  }

  test("q_scan_csv: round-trip equals the parquet-direct projection") {
    import spark.implicits._
    val back = Scans.qScanCsv(spark, sfSmoke)
    val direct = graft.Tables.table(spark, sfSmoke, "orders")
      .select($"o_orderkey",
        when($"o_orderkey" % 7 === 0, lit(null)).otherwise($"o_custkey")
          .cast("long").as("nk"),
        $"o_orderstatus",
        concat(lit("a,\"b "), $"o_orderpriority").as("tricky"),
        $"o_totalprice",
        $"o_orderdate".cast("date").as("o_date"))
    assert(back.count() === direct.count())
    assert(back.exceptAll(direct).isEmpty && direct.exceptAll(back).isEmpty)
    // the nullable-bigint empty-string path actually exercised
    assert(back.filter($"nk".isNull).count() > 0)
  }

  test("q_scan_jsonl: JSON write→read preserves FULL-µs timestamps") {
    import spark.implicits._
    // the oracled key truncates ts to seconds per the §5.4 convention;
    // this asserts the round-trip itself is µs-exact
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_us").toString
    val src = graft.Tables.table(spark, sfSmoke, "events")
      .select($"event_id", $"ts", $"value", $"props")
    // the JSON default timestamp formats carry only millis — µs
    // fidelity requires an explicit .SSSSSS on BOTH sides
    val usFmt = Map(
      "timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
      "timestampNTZFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    src.write.mode("overwrite").options(usFmt).json(dir)
    val back = Scans.readJsonl(spark, dir, src.schema, usFmt)
    assert(back.count() === src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
    // sub-second precision genuinely present in the fixture
    // ts is TIMESTAMP_NTZ — unix_micros needs LTZ, cast under UTC
    assert(src.filter(
      expr("unix_micros(cast(ts as timestamp)) % 1000000 != 0")).count() > 0)
  }

  test("q_filter_predicates selects a strict non-empty subset") {
    val n = Basics.qFilterPredicates(spark, sfSmoke).count()
    val total = spark.read.parquet(s"$sfSmoke/orders.parquet").count()
    assert(n > 0 && n < total)
  }

  test("q_null_handling: BUILDING maps to (none)/unknown, nation 0 to -1") {
    val rows = Basics.qNullHandling(spark, sfSmoke).collect()
    assert(rows.exists(_.getString(1) == "(none)"))
    assert(rows.filter(_.getString(1) == "(none)").forall(_.getString(2) == "unknown"))
    assert(rows.forall(_.getInt(3) != 0))
  }

  test("q_sort: nulls first, then acctbal descending within segment") {
    val rows = SortLimit.qSort(spark, sfSmoke).collect()
    val segs = rows.map(r => Option(r.getString(1)))
    val firstNonNull = segs.indexWhere(_.isDefined)
    assert(segs.take(firstNonNull).forall(_.isEmpty), "null segment rows lead")
    val nullBals = rows.take(firstNonNull).map(_.getDouble(2))
    assert(nullBals.zip(nullBals.tail).forall { case (a, b) => a >= b })
  }

  test("q_topk_global compiles to TakeOrderedAndProject (no global sort)") {
    val df = SortLimit.qTopkGlobal(spark, sfSmoke)
    assert(df.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    assert(df.count() === 100)
  }

  test("pagination: disjoint, ordered, exhaustive pages") {
    val base = spark.read.parquet(s"$sfSmoke/nation.parquet")
    val pages = (0 until 3).map(i =>
      SortLimit.page(base, Seq("n_nationkey"), 10, i).collect().map(_.getInt(0)).toSeq)
    assert(pages(0).size === 10 && pages(2).size === 5)
    assert(pages.flatten === (0 until 25))
  }

  test("set ops: ALL variants and unionByName with missing columns") {
    import spark.implicits._
    val a = Seq(1, 1, 2, 3).toDF("x")
    val b = Seq(1, 2, 2).toDF("x")
    assert(a.intersectAll(b).collect().map(_.getInt(0)).sorted.toSeq === Seq(1, 2))
    assert(a.exceptAll(b).collect().map(_.getInt(0)).sorted.toSeq === Seq(1, 3))
    val wide = Seq((1, "a")).toDF("x", "tag")
    val merged = wide.unionByName(b.withColumn("x", $"x"), allowMissingColumns = true)
    assert(merged.count() === 4 && merged.filter($"tag".isNull).count() === 3)
  }

  test("CSV and JSONL sources round-trip with explicit schemas") {
    val dir = java.nio.file.Files.createTempDirectory("graft_src").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("ts", TimestampType)))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/in.csv"),
      "id,name,ts\n1,alpha,2024-01-01 00:00:01\n2,beta,2024-01-02 12:30:00\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/in.jsonl"),
      """{"id":3,"name":"gamma","ts":"2024-01-03T04:05:06.000Z"}""" + "\n")
    val csv = Scans.readCsv(spark, s"$dir/in.csv", schema)
    val jsonl = Scans.readJsonl(spark, s"$dir/in.jsonl", schema)
    assert(csv.count() === 2 && jsonl.count() === 1)
    assert(csv.schema === schema && jsonl.schema === schema)
    assert(jsonl.select("name").head().getString(0) === "gamma")
  }

  test("ORC source/sink: round-trip preserves data; filters push to the ORC scan") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val src = spark.read.parquet(s"$sfSmoke/orders.parquet")
    Scans.writeOrc(src, s"$dir/orders_orc")
    val back = Scans.readOrc(spark, s"$dir/orders_orc")
    assert(back.count() === src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
    val filtered = back.select($"o_orderkey", $"o_totalprice")
      .filter($"o_totalprice" > 100000.0)
    filtered.collect()
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_totalprice), " +
      "GreaterThan(o_totalprice,100000.0)]") ||
      plan.contains("GreaterThan(o_totalprice,100000.0)"), plan)
    // column pruning reaches the ORC reader
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>"),
      plan)
  }

  test("partitioned parquet sink: hive layout + partition pruning on read-back") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val df = spark.read.parquet(s"$sfSmoke/orders.parquet")
      .withColumn("order_month", date_format($"o_orderdate", "yyyy-MM"))
    Scans.writePartitioned(df, s"$dir/orders_part", Seq("order_month"))
    assert(new java.io.File(s"$dir/orders_part").list().exists(_.startsWith("order_month=")))
    val back = spark.read.parquet(s"$dir/orders_part").filter($"order_month" === "1995-03")
    val expected = df.filter($"order_month" === "1995-03").count()
    assert(back.count() === expected && expected > 0)
    // partition filter must prune, not read-and-filter
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("order_month"), plan)
  }
}
