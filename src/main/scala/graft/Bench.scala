package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Per key: 3 timed runs, report the median (the first
  * run absorbs residual JIT/codegen warmup; the median hides one-off
  * machine noise — rounds 1→2 drifted 11% with zero code changes).
  *
  * Output contract: the FINAL stdout line is one bare compact JSON
  * object small enough (values %.3f) that the driver's 2000-char output
  * tail contains it whole even with sbt's trailing [success] line. The
  * full result (all runs, 6-decimal) is also written to bench_results
  * .json in the working directory for the judge.
  */
object Bench {
  private def median3(a: Double, b: Double, c: Double): Double =
    Seq(a, b, c).sorted.apply(1)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/session warmup: exercise scan + shuffle + window + parquet paths
    // once so the first measured key isn't charged for startup.
    try {
      SparkEntry.queries.get("q_agg_basic").foreach(f => f(spark, sfDir).count())
      SparkEntry.queries.get("q_topk_per_group").foreach(f => f(spark, sfDir).count())
    } catch { case _: Throwable => () }

    val failed = scala.collection.mutable.ListBuffer[String]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() }
        catch { case e: Throwable =>
          if (!failed.contains(name)) {
            failed += name
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          }
        }
        (System.nanoTime() - t0) / 1e9
      }
      val runs = (once(), once(), once())
      (name, median3(runs._1, runs._2, runs._3), runs)
    }
    val total = results.map(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")

    // Full-precision artifact (all three runs per key) for offline reads.
    val fullQs = results.map { case (k, m, (a, b, c)) =>
      f""""$k":{"median":$m%.6f,"runs":[$a%.6f,$b%.6f,$c%.6f]}"""
    }.mkString("{", ",", "}")
    val full = f"""{"metric":"total","value":$total%.6f,"unit":"sec","reps":3,"stat":"median","queries":$fullQs,"failed":$failedJson,"sf":"$sfDir"}"""
    try {
      val w = new java.io.PrintWriter("bench_results.json")
      try w.println(full) finally w.close()
    } catch { case _: Throwable => () }

    // Per-key line first (may exceed the driver's 2000-char output tail at
    // 95+ keys), then a SHORT total-only line as the true final line so the
    // tail always contains a parseable total even when the per-key line's
    // head is truncated (BENCH_r05 "parsed": null — VERDICT r5 #4). Full
    // per-key data lives in bench_results.json either way.
    val qs = results.map { case (k, m, _) => f""""$k":$m%.3f""" }
      .mkString("{", ",", "}")
    println(f"""{"metric":"per_key","queries":$qs,"sf":"$sfDir"}""")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","reps":3,"stat":"median","keys":${results.size},"failed":$failedJson,"detail":"bench_results.json","sf":"$sfDir"}""")
    spark.stop()
  }
}
