package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling salted equi-join (§4.2 100 TB design rules).
  *
  * AQE's OptimizeSkewedJoin splits oversized partitions at runtime and
  * is the first line of defense; explicit salting is the deterministic
  * fallback for *pathological* hot keys (one key ≫ a partition) or for
  * engines/paths where AQE can't rewrite (e.g. inside streaming
  * foreachBatch).
  *
  * Mechanics: the skewed (large) side gets a random salt in
  * [0, saltFactor); the small side is replicated saltFactor× with an
  * exploded salt column; the join key becomes (key, salt) — one hot
  * key now spreads over saltFactor reducers. Cost: small side
  * replicated saltFactor× through the shuffle; pick saltFactor ≈
  * (hot-key rows / target partition rows).
  */
object SaltedJoin {

  def saltedEquiJoin(large: DataFrame, small: DataFrame, key: String,
                     saltFactor: Int): DataFrame = {
    val salted = large.withColumn("__salt",
      pmod(pmod(rand(42) * saltFactor, lit(saltFactor)).cast("int"), lit(saltFactor)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
