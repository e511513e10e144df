package graft.ops.relational

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Blocked Jaro-Winkler join: planted typos match their originals,
  * oversized blocks overflow observably instead of pairing (and the
  * surviving blocks' pairs are bit-identical to the uncapped run),
  * and the candidate generator is an equi join — never a loop join. */
class FuzzyJoinSpec extends SparkSpec {

  test("planted typos match; cap-and-flag excludes the hot block; " +
      "surviving pairs equal the uncapped run; plan is an equi join") {
    import spark.implicits._
    val refs = (Seq("alpha rotor", "alpha stator", "beta casing",
      "gamma valve", "delta pump") ++
      // a boilerplate-prefix family: 60 names sharing block 'bpx'
      (1 to 60).map(i => f"bpx item $i%03d")).toDF("name")
    // probes: adjacent transposition past the block for the 5 organic
    // names + one boilerplate probe
    val probes = Seq("alpah rotor", "alpah stator", "beat casing",
      "gamam valve", "detla pump", "bpx itme 001").toDF("probe")

    val (pairs, overflow) = FuzzyJoin.blockedJaroWithStats(
      probes, refs, "probe", "name", blockLen = 3, threshold = 0.85,
      maxBlockSize = 50)
    val got = pairs.select($"probe", $"name").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // corruptions PAST the block match ('alpah' keeps block 'alp',
    // 'gamam' keeps 'gam'); corruptions INSIDE the prefix ('beat'
    // block 'bea' vs 'bet', 'detla' block 'det' vs 'del') are the
    // scaladoc's stated limitation — prefix blocking cannot recall
    // them, a second pass on a different key would
    assert(got.contains(("alpah rotor", "alpha rotor")))
    assert(got.contains(("alpah stator", "alpha stator")))
    assert(got.contains(("gamam valve", "gamma valve")))
    assert(!got.exists(_._1 == "detla pump"),
      "inside-prefix corruption must miss under prefix blocking")
    assert(!got.exists(_._1 == "beat casing"))
    // the hot block overflowed: flagged with its size, no bpx pairs
    val of = overflow.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(of === Map("bpx" -> 60L))
    assert(!got.exists(_._1.startsWith("bpx")),
      "capped block must not pair")
    // surviving blocks: bit-identical to the uncapped run
    val (uncapped, _) = FuzzyJoin.blockedJaroWithStats(
      probes, refs, "probe", "name", blockLen = 3, threshold = 0.85,
      maxBlockSize = 1000000)
    assert(pairs.select($"probe", $"name", $"jw")
      .exceptAll(uncapped.filter(!$"name".startsWith("bpx"))
        .select($"probe", $"name", $"jw")).isEmpty)
    // candidate generation is an equi join on the block key
    val s = pairs.queryExecution.executedPlan.toString
    assert(!s.contains("BroadcastNestedLoopJoin") &&
      !s.contains("CartesianProduct"), s)
  }

  test("two-pass blocking recalls inside-prefix corruptions the single " +
      "pass misses, without double-counting pairs both passes find") {
    import spark.implicits._
    val refs = Seq("alpha rotor", "alpha stator", "beta casing",
      "gamma valve", "delta pump").toDF("name")
    val probes = Seq("alpah rotor", "beat casing", "detla pump").toDF("probe")
    val (pairs, overflow) = FuzzyJoin.blockedJaroTwoPassWithStats(
      probes, refs, "probe", "name", blockLen = 3, threshold = 0.85,
      maxBlockSize = 1000)
    val got = pairs.select($"probe", $"name").collect()
      .map(r => (r.getString(0), r.getString(1)))
    // the r14 verdict's flip: 'beat casing' (beta, swap at 3/4 -> block
    // 'bea' != 'bet') and 'detla pump' ('det' != 'del') now match via
    // the untouched suffix block; 'alpah rotor' still matches via pass 1
    assert(got.toSet === Set(
      ("alpah rotor", "alpha rotor"),
      ("beat casing", "beta casing"),
      ("detla pump", "delta pump")))
    // no double-count: 'alpah rotor' shares BOTH blocks with its
    // original ('alp'/'rot'-reversed) — exactly one pair row
    assert(got.count(_ == ("alpah rotor", "alpha rotor")) === 1)
    assert(overflow.isEmpty)
    // plan: two equi joins, never a loop join
    val s = pairs.queryExecution.executedPlan.toString
    assert(!s.contains("BroadcastNestedLoopJoin") &&
      !s.contains("CartesianProduct"), s)
  }

  test("two-pass: a right row in an overflowed PREFIX block still pairs " +
      "via the suffix pass (the of1 exemption), and per-pass overflow " +
      "is reported with its pass tag") {
    import spark.implicits._
    // 60 rows share prefix 'bpx' (overflow at cap 50) but have unique
    // suffixes; the probe corrupts nothing — suffix pass must recover
    // the pair pass 1 dropped to the cap
    val refs = (1 to 60).map(i => f"bpx item $i%03d").toDF("name")
    val probes = Seq("bpx item 007").toDF("probe")
    val (pairs, overflow) = FuzzyJoin.blockedJaroTwoPassWithStats(
      probes, refs, "probe", "name", blockLen = 3, threshold = 0.99,
      maxBlockSize = 50)
    val got = pairs.select($"probe", $"name").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq === Seq(("bpx item 007", "bpx item 007")))
    val of = overflow.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(of === Set(("bpx", 60L, "prefix")))
  }
}
