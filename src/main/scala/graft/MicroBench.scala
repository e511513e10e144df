package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-benchmark: HOF dot product (aggregate+zip_with) vs the native
  * codegen DotProduct expression on an all-pairs cosine workload.
  * Usage: sbt "runMain graft.MicroBench [sfDir] [nQueries]" */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nQ = args.lift(1).map(_.toInt).getOrElse(200)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    functions.VectorExpressions.register(spark)

    val emb = Tables.table(spark, sfDir, "embeddings")
      .withColumn("v", ops.llm.Knn.asDouble($"embedding")).select($"vec_id", $"v")
    val q = emb.filter($"vec_id" < nQ)
      .select($"vec_id".as("qid"), $"v".as("qv"))
    def workload(dotCol: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      emb.crossJoin(broadcast(q))
        .select(sum(dotCol($"v")).as("s")).head().getDouble(0)

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s  (result=$r)"); r
    }
    // warmup both paths
    workload(v => ops.llm.Knn.dot(v, $"qv"))
    workload(v => functions.VectorExpressions.dot_native(v, $"qv"))
    val h = time("HOF   aggregate+zip_with")(workload(v => ops.llm.Knn.dot(v, $"qv")))
    val n = time("NATIVE graft_dot codegen")(workload(v => functions.VectorExpressions.dot_native(v, $"qv")))
    assert(math.abs(h - n) < 1e-6 * math.abs(h).max(1.0), "results diverge")
    spark.stop()
  }
}
