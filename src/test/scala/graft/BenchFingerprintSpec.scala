package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-fingerprint normalization invariants (Bench
  * .sortTopLevelConjuncts): the whole point of the conjunct sort is
  * that two ExpressionSet iteration orders of the SAME conjunct set
  * normalize to ONE string, while genuinely different plans stay
  * distinct — both directions are asserted here. */
class BenchFingerprintSpec extends AnyFunSuite {

  private def norm(s: String) = Bench.sortTopLevelConjuncts(s)

  test("two iteration orders of the same conjunct set normalize " +
      "identically (operator prefix must not ride on a conjunct)") {
    val o1 = "Filter ((a# > 1) AND (isnotnull(b#)))"
    val o2 = "Filter ((isnotnull(b#)) AND (a# > 1))"
    assert(norm(o1) === norm(o2))
    val j1 = "+- Join Inner, ((x# = y#) AND (p# = q#))"
    val j2 = "+- Join Inner, ((p# = q#) AND (x# = y#))"
    assert(norm(j1) === norm(j2))
    // three conjuncts, all orders agree
    val perms = Seq(
      "Filter ((a#) AND (b#) AND (c#))",
      "Filter ((c#) AND (a#) AND (b#))",
      "Filter ((b#) AND (c#) AND (a#))").map(norm).distinct
    assert(perms.size === 1)
  }

  test(" AND inside a nested expression or string literal does not " +
      "reorder (ADVICE r13: distinct plans must not alias)") {
    // the nested AND sits one paren level deeper than the conjunction
    val l = "Filter ((contains(s#, foo AND bar)) AND (isnotnull(s#)))"
    val n = norm(l)
    assert(n.contains("foo AND bar"), n) // literal survives intact
    // a DIFFERENT plan whose literal swaps words must stay distinct
    val other = "Filter ((contains(s#, bar AND foo)) AND (isnotnull(s#)))"
    assert(norm(other) !== n)
  }

  test("lines without conjunctions or parens pass through unchanged") {
    val lines = Seq(
      "Sort [a# ASC NULLS FIRST], true, 0",
      "Aggregate [k#], [k#, sum(v#) AS s#]",
      "+- Scan parquet [a#,b#]")
    lines.foreach(l => assert(norm(l) === l))
  }

  test("normalization is deterministic and idempotent on " +
      "prefix-peelable lines") {
    val l = "Filter ((z#) AND (a#) AND (m#))"
    assert(norm(norm(l)) === norm(l))
  }

  test("OR-of-ANDs has no top-level conjunction — the line passes " +
      "through verbatim (r14 review: the min-depth fallback cut inside " +
      "both OR branches, aliasing genuinely different plans)") {
    val p1 = "Filter ((c# AND d#) OR (a# AND b#))"
    val p2 = "Filter ((c# AND b#) OR (a# AND d#))" // different plan!
    assert(norm(p1) === p1)
    assert(norm(p2) === p2)
    assert(norm(p1) !== norm(p2))
  }

  test("trailing args after the condition group (join hints) stay " +
      "outside the sort — same set, two orders, one string; hint intact") {
    val h1 = "Join Inner, ((x# = y#) AND (p# = q#)), rightHint=(strategy=broadcast)"
    val h2 = "Join Inner, ((p# = q#) AND (x# = y#)), rightHint=(strategy=broadcast)"
    assert(norm(h1) === norm(h2))
    assert(norm(h1).endsWith("rightHint=(strategy=broadcast)"), norm(h1))
  }

  test("a segment that would split unbalanced abandons the sort " +
      "instead of splicing text across paren groups") {
    // depth-0 AND but the right segment closes a paren it never opened
    val l = "Filter (a#) AND (b#)) tail ("
    assert(norm(l) === l)
  }

  test("a depth-0 string literal containing ' AND ' is never split " +
      "(r14 ADVICE: two different literals must not alias)") {
    // the AND inside the quoted literal sits at paren depth 0 —
    // without quote-awareness it would cut and reorder
    val a = "Filter ((s# = 'x AND y') AND (isnotnull(s#)))"
    val b = "Filter ((s# = 'y AND x') AND (isnotnull(s#)))" // different!
    assert(norm(a).contains("'x AND y'"), norm(a))
    assert(norm(a) !== norm(b))
    // and the REAL conjunction around it still normalizes both orders
    val a2 = "Filter ((isnotnull(s#)) AND (s# = 'x AND y'))"
    assert(norm(a) === norm(a2))
    // unbalanced quote: verbatim passthrough, never a mangled sort
    val odd = "Filter ((s# = 'abc) AND (b#))"
    assert(norm(odd) === odd)
  }

  test("only Filter/Join lines sort — an Aggregate expression list " +
      "with a depth-0 AND renders in stable field order and must " +
      "pass through verbatim (r15 operator gate)") {
    val agg = "Aggregate [k#], [(b#) AND (a#) AS both#, k#]"
    assert(norm(agg) === agg)
    val proj = "+- Project [(z#) AND (a#) AS f#]"
    assert(norm(proj) === proj)
    // tree-drawing prefixes still reach the gate for real Filter/Join
    val f = ":  +- Filter ((b#) AND (a#))"
    assert(norm(f) === ":  +- Filter ((a#) AND (b#))")
  }

  test("per-PID fixture paths normalize (a fresh JVM must not flap a " +
      "fixture-reading key's fingerprint) — covered via the full " +
      "normalization path in Bench.main; here the regex itself") {
    val line = "Relation [k#] parquet, file:/tmp/graft_fixtures/p12345/sf/dml"
    val norm = line.replaceAll("/graft_fixtures/p\\d+", "/graft_fixtures/p#")
    assert(norm.contains("/graft_fixtures/p#/sf/dml"))
    assert(norm === line.replace("p12345", "p#"))
  }

  test("graft fixture RelationV2 version pins normalize to @v# (the " +
      "r17 pristine-restore discipline grows the version per rep); a " +
      "user table's time-travel pin outside the fixture root stays " +
      "distinct") {
    val re = "(/graft_fixtures/[^`]*`)@v\\d+"
    val line =
      "RelationV2[k#] graft.`/tmp/graft_fixtures/p#/sf/graft_dsv2`@v8"
    assert(line.replaceAll(re, "$1@v#").endsWith("graft_dsv2`@v#"))
    val user = "RelationV2[k#] graft.`/data/tables/events`@v8"
    assert(user.replaceAll(re, "$1@v#") === user,
      "a genuine versionAsOf pin must keep its distinct fingerprint")
  }

  test("control characters in plan text survive the jsonEsc/" +
      "parsePlanTexts round-trip (r14 review: \\u00xx was not inverted)") {
    val plans = Map("q_ctl" -> "Filter contains(s#, bell)")
    val json = plans.map { case (k, t) =>
      s""""$k":"${Bench.jsonEsc(t)}"""" }.mkString("{", ",", "}")
    assert(Bench.parsePlanTexts(json) === plans)
  }

  test("bench_plans.json round-trips through jsonEsc/parsePlanTexts, " +
      "including multi-KB plan strings (the Java-regex StackOverflow " +
      "class r14 hit)") {
    val big = (1 to 2000).map(i =>
      s"""+- Filter ((a#$i > 1) AND contains(s#, "x\\y"))""")
      .mkString("\n")
    val plans = Map(
      "q_small" -> "Project [a#]\n+- Scan parquet",
      "q_big" -> big,
      "q_tabs" -> "line\twith\ttabs\r\nand crlf")
    val json = plans.map { case (k, t) =>
      s""""$k":"${Bench.jsonEsc(t)}"""" }.mkString("{", ",", "}")
    // keys in the real file all start with q_ — the scanner keys on it
    val back = Bench.parsePlanTexts(json)
    assert(back === plans)
  }

  test("outlier-rep rule (r18): a mid-sweep load spike is >2x the " +
      "triple min AND >0.15s over it; ordinary variance is not") {
    // the observed r17 poisoning triple: [6.28, 4.28, 9.45] — 9.45 is
    // the spike (>2x 4.28), 6.28 is NOT (within 2x)
    assert(Bench.isOutlierRep(9.45, 4.28))
    assert(!Bench.isOutlierRep(6.28, 4.28))
    // trivia-key jitter: 0.04 -> 0.09 doubles but is under the 0.15s
    // absolute floor — no re-run burned
    assert(!Bench.isOutlierRep(0.09, 0.04))
    // a small key genuinely spiking past the floor IS rejected
    assert(Bench.isOutlierRep(0.60, 0.20))
  }

  test("distinct-aggregate gid renumbering normalizes to ONE " +
      "fingerprint text; genuinely different Expand contents stay " +
      "distinct (r18 — the q_agg_distinct per-JVM flap)") {
    val n = Bench.normalizeDistinctGids _
    // the observed flap: gids 2 and 3 swapped consistently
    val agg1 = "+- Aggregate [f#], [count(p#) FILTER (WHERE (gid# = 2))" +
      " AS nd_p#, count(s#) FILTER (WHERE (gid# = 3)) AS nd_s#]"
    val agg2 = "+- Aggregate [f#], [count(p#) FILTER (WHERE (gid# = 3))" +
      " AS nd_p#, count(s#) FILTER (WHERE (gid# = 2)) AS nd_s#]"
    assert(n(agg1) === n(agg2))
    val ex1 = "   +- Expand [[f#, null, null, 0], [f#, p#, s#, 1], " +
      "[f#, p#, null, 2], [f#, null, s#, 3]], [f#, p#, s#, gid#]"
    val ex2 = "   +- Expand [[f#, null, null, 0], [f#, p#, s#, 1], " +
      "[f#, null, s#, 2], [f#, p#, null, 3]], [f#, p#, s#, gid#]"
    assert(n(ex1) === n(ex2))
    // a REAL content difference (an extra projected column in a row)
    // must stay distinct
    val ex3 = "   +- Expand [[f#, null, null, 0], [f#, p#, s#, 1], " +
      "[f#, p#, s#, 2], [f#, null, s#, 3]], [f#, p#, s#, gid#]"
    assert(n(ex1) !== n(ex3))
    // the rewrite's INTERMEDIATE aggregate renders its grouping and
    // output lists in the same flapping order — both normalize, and
    // only on gid-bearing lines (an ordinary Aggregate is untouched)
    val mid1 = "   +- Aggregate [f#, s#, p#, gid#], [f#, s#, p#, gid#," +
      " count(1) AS count(1)#]"
    val mid2 = "   +- Aggregate [f#, p#, s#, gid#], [f#, p#, s#, gid#," +
      " count(1) AS count(1)#]"
    assert(n(mid1) === n(mid2))
    val plain = "+- Aggregate [b#, a#], [b#, a#, sum(x#) AS s#]"
    assert(n(plain) === plain)
    // Expand OUTPUT lists normalize too (gid-bearing only)
    val exOut1 = "   +- Expand [[f#, s#, null, 1]], [f#, s#, p#, gid#]"
    val exOut2 = "   +- Expand [[f#, s#, null, 1]], [f#, p#, s#, gid#]"
    assert(n(exOut1) === n(exOut2))
    // WITHIN-row attr order flaps with the same renumbering (rows are
    // positional twins of the output list) — the second observed leak
    val exIn1 = "   +- Expand [[f#, p#, s#, 1], [f#, p#, null, 2], " +
      "[f#, null, s#, 3]], [gid#, p#, f#, s#]"
    val exIn2 = "   +- Expand [[f#, s#, p#, 1], [f#, s#, null, 2], " +
      "[f#, null, p#, 3]], [gid#, p#, f#, s#]"
    assert(n(exIn1) === n(exIn2))
    // non-Expand, non-gid lines pass through verbatim
    val other = "+- Filter ((a# > 1) AND (b# = 2))"
    assert(n(other) === other)
  }

  test("non-gid Expand lines pass through VERBATIM (r18 ADVICE: the " +
      "unconditional row mask/sort hid genuine plan changes that only " +
      "moved cube/rollup/unpivot Expand literals or row order)") {
    val n = Bench.normalizeDistinctGids _
    // a cube-style Expand keyed by spark_grouping_id — ids are
    // DETERMINISTIC bitmasks, so two different id assignments are two
    // different plans and must stay distinct
    val cube1 = "   +- Expand [[a#, b#, 0], [a#, null, 1]], " +
      "[a#, b#, spark_grouping_id#]"
    val cube2 = "   +- Expand [[a#, b#, 0], [a#, null, 3]], " +
      "[a#, b#, spark_grouping_id#]"
    assert(n(cube1) === cube1)
    assert(n(cube1) !== n(cube2))
    // row ORDER is deterministic too — a reorder is a plan change
    val u1 = "   +- Expand [[k#, x, v1#], [k#, y, v2#]], [k#, n#, v#]"
    val u2 = "   +- Expand [[k#, y, v2#], [k#, x, v1#]], [k#, n#, v#]"
    assert(n(u1) === u1)
    assert(n(u1) !== n(u2))
  }

  test("spikeOf (r19): the max is rejected only when the other two " +
      "reps AGREE — one anomalously FAST rep must not get legitimate " +
      "reps rejected and the median biased low") {
    val s = Bench.spikeOf _
    // the r17 poisoning triple still rejects: 6.28 ≤ 1.5×4.28 — the
    // two non-max reps agree, so 9.45 is the spike
    assert(s(Vector(6.28, 4.28, 9.45)).contains(9.45))
    // a genuine spike over two agreeing reps rejects
    assert(s(Vector(4.4, 4.1, 9.45)).contains(9.45))
    // the r18 ADVICE failure mode: one cache-artifact FAST rep made
    // ordinary reps look like >2×-min spikes — now: no agreement
    // between the two non-max reps (1.0 vs 0.2), nothing rejected
    assert(s(Vector(0.2, 1.0, 1.05)).isEmpty)
    // under the absolute floor: no rejection
    assert(s(Vector(0.04, 0.05, 0.09)).isEmpty)
    // pairs (post-drop survivors) never re-reject
    assert(s(Vector(4.4, 9.45)).isEmpty)
  }

  test("medianOf: middle of odd counts, mean of the middle pair even " +
      "(the 2-survivor case after replacement-bound exhaustion)") {
    assert(Bench.medianOf(Seq(6.28, 4.28, 9.45)) === 6.28)
    assert(Bench.medianOf(Seq(4.28, 6.28)) === (4.28 + 6.28) / 2)
    assert(Bench.medianOf(Seq(1.0, 2.0, 3.0, 10.0)) === 2.5)
    assert(Bench.medianOf(Seq(5.0)) === 5.0)
  }
}
