package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale smoke: synthesizes a ~10× corpus (sf≈1: 6M lineitem / 1.5M
  * orders / 1M events / 50k docs / 20k embeddings) from sf0.1 by
  * key-shifted replication (join semantics preserved), then times the
  * heavy operators to verify the plans hold at 10× data — the
  * empirical check behind the 100 TB design claims.
  * Usage: sbt "runMain graft.ScaleSmoke [factor] [workDir]" */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val work = args.lift(1).getOrElse("/tmp/graft_scale")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val src = "/root/testdata/sf0.1"

    def replicate(df: DataFrame, keyCols: Map[String, Long]): DataFrame = {
      val reps = explode(sequence(lit(0), lit(factor - 1))).as("__rep")
      keyCols.foldLeft(df.select(col("*"), reps)) { case (d, (c, stride)) =>
        d.withColumn(c, col(c) + col("__rep") * stride)
      }.drop("__rep")
        // spread output over many files: a single ~50 MB parquet file
        // reads as ONE task and serializes every downstream map stage
        // (observed: 36 s single-threaded dedup before this)
        .repartition(32)
    }

    if (!new java.io.File(s"$work/lineitem.parquet").exists) {
      println(s"[gen] materializing ${factor}x corpus at $work")
      replicate(Tables.table(spark, src, "lineitem"),
        Map("l_orderkey" -> 1000000L, "l_partkey" -> 100000L, "l_suppkey" -> 10000L))
        .write.mode("overwrite").parquet(s"$work/lineitem.parquet")
      replicate(Tables.table(spark, src, "orders"),
        Map("o_orderkey" -> 1000000L, "o_custkey" -> 100000L))
        .write.mode("overwrite").parquet(s"$work/orders.parquet")
      replicate(Tables.table(spark, src, "customer"), Map("c_custkey" -> 100000L))
        .write.mode("overwrite").parquet(s"$work/customer.parquet")
      replicate(Tables.table(spark, src, "part"), Map("p_partkey" -> 100000L))
        .write.mode("overwrite").parquet(s"$work/part.parquet")
      replicate(Tables.table(spark, src, "supplier"), Map("s_suppkey" -> 10000L))
        .write.mode("overwrite").parquet(s"$work/supplier.parquet")
      replicate(Tables.table(spark, src, "events"),
        Map("event_id" -> 10000000L, "user_id" -> 100000L))
        .write.mode("overwrite").parquet(s"$work/events.parquet")
      replicate(Tables.table(spark, src, "documents"), Map("doc_id" -> 1000000L))
        .write.mode("overwrite").parquet(s"$work/documents.parquet")
      replicate(Tables.table(spark, src, "embeddings"), Map("vec_id" -> 1000000L))
        .write.mode("overwrite").parquet(s"$work/embeddings.parquet")
      Seq("region", "nation").foreach(t =>
        Tables.table(spark, src, t).write.mode("overwrite").parquet(s"$work/$t.parquet"))
    }

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scale] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
    }
    // warmup
    Tables.table(spark, work, "lineitem").count()

    time("agg_basic (6M)") {
      ops.relational.Aggregations.qAggBasic(spark, work).count() }
    time("join_sortmerge (1.5M x 150k)") {
      ops.relational.Joins.qJoinSortmerge(spark, work).count() }
    time("join_broadcast (6M x 200k)") {
      ops.relational.Joins.qJoinBroadcast(spark, work).count() }
    time("topk_per_group (1.5M)") {
      ops.relational.Windows.qTopkPerGroup(spark, work).count() }
    time("cdc_apply (150k x 1M)") {
      ops.cdc.CdcQueries.qCdcApply(spark, work).count() }
    time("llm_dedup_exact (50k docs)") {
      ops.llm.LlmQueries.qLlmDedupExact(spark, work).count() }
    time("minhash_neardups (50k docs)") {
      // the production pipeline shape: exact dedup FIRST so identical-
      // text clusters (10x replication here; boilerplate at real scale)
      // never reach LSH banding — without this, mega-buckets make
      // candidate generation quadratic (observed: >20 min vs seconds)
      functions.NormalizeText.register(spark)
      val docs = Tables.table(spark, work, "documents")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"h").orderBy($"doc_id")
      val uniq = docs
        .withColumn("h",
          sha2(functions.NormalizeText.normalize_native($"text"), 256))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1).drop("h", "rn")
      ops.llm.NearDup.minHashNearDups(uniq, "doc_id", "text").count() }
    time("knn 100q x 20k corpus") {
      val emb = Tables.table(spark, work, "embeddings")
      ops.llm.Knn.bruteForceTopK(emb.filter($"vec_id" < 100), emb, 5).count() }
    time("asof join (events 1M)") {
      ops.relational.Joins.qJoinAsof(spark, work).count() }
    spark.stop()
  }
}
