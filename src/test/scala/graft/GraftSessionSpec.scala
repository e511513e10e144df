package graft

class GraftSessionSpec extends SparkSpec {
  test("registerFunctions makes native functions SQL-resolvable, idempotently") {
    GraftSession.registerFunctions(spark)
    GraftSession.registerFunctions(spark)  // idempotent
    val d = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d," +
        " graft_normalize_text('  A  B!! ') AS n," +
        " graft_char_shingles('AB cd', 3) AS s")
      .head()
    assert(d.getDouble(0) === 11.0)
    assert(d.getString(1) === "a b")
    assert(d.getSeq[String](2) === Seq("ab ", "b c", " cd"))
  }

  test("builder posture: AQE on, UTC, sized shuffle partitions") {
    // verify against the active session (same posture, set by harness)
    assert(spark.conf.get("spark.sql.session.timeZone") === "UTC")
    assert(spark.conf.get("spark.sql.adaptive.enabled") === "true")
    assert(spark.conf.get("spark.sql.shuffle.partitions").toInt < 200)
  }
}
