package graft.ops.cdc

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Scalacheck invariant for conditional MERGE: [[MergeInto.resolve]]
  * over ARBITRARY clause ladders equals a pure-Scala reference
  * interpreter of the ANSI semantics (clauses in order, first hit
  * wins, unmatched passthrough, NOT MATCHED insert-or-drop) — over
  * generated target/source frames and random clause sequences whose
  * combination space dwarfs the hand-written MergeIntoSpec fixtures.
  * Every condition exists twice (Column + Scala lambda on the same
  * tuple), so a divergence is an ENGINE-side bug, not a fixture
  * artifact. */
class MergeIntoPropertiesSpec extends SparkSpec {

  import MergeInto._

  // a target row (k, bal, tag); a source row (k, add, n)
  private type T = (Long, Long, String)
  private type S = (Long, Long, Long)

  /** One clause in dual representation: the Spark Clause and the
    * reference interpreter's (matched-cond, apply) pair. */
  private case class DualClause(
      spark: Clause,
      kind: Int, // 0 = update, 1 = delete, 2 = insert,
                 // 3 = by-source update, 4 = by-source delete
      cond: (Option[T], Option[S]) => Boolean,
      update: (T, S) => T,
      insert: S => T)

  private val genCond: Gen[(Column, (Option[T], Option[S]) => Boolean)] =
    Gen.oneOf(
      (lit(true), (_: Option[T], _: Option[S]) => true),
      (col("s.n") >= 3, (_: Option[T], s: Option[S]) => s.exists(_._3 >= 3)),
      (col("s.add") > 20L,
        (_: Option[T], s: Option[S]) => s.exists(_._2 > 20L)),
      (col("t.bal") > 0L,
        (t: Option[T], _: Option[S]) => t.exists(_._2 > 0L)),
      (col("s.add") > col("t.bal"),
        (t: Option[T], s: Option[S]) =>
          t.nonEmpty && s.nonEmpty && s.get._2 > t.get._2))

  // by-source conditions may reference only t
  private val genCondT: Gen[(Column, (Option[T], Option[S]) => Boolean)] =
    Gen.oneOf(
      (lit(true), (_: Option[T], _: Option[S]) => true),
      (col("t.bal") > 0L,
        (t: Option[T], _: Option[S]) => t.exists(_._2 > 0L)),
      (col("t.tag") === "a",
        (t: Option[T], _: Option[S]) => t.exists(_._3 == "a")))

  private val genClause: Gen[DualClause] = for {
    kind <- Gen.chooseNum(0, 4)
    (cc, cf) <- if (kind >= 3) genCondT else genCond
  } yield kind match {
    case 0 => DualClause(
      MatchedUpdate(Some(cc), Map(
        "bal" -> (col("t.bal") + col("s.add")), "tag" -> lit("up"))),
      0, cf, (t, s) => (t._1, t._2 + s._2, "up"), _ => sys.error("n/a"))
    case 1 => DualClause(
      MatchedDelete(Some(cc)), 1, cf,
      (_, _) => sys.error("n/a"), _ => sys.error("n/a"))
    case 2 => DualClause(
      NotMatchedInsert(Some(cc), Map(
        "k" -> col("s.k"), "bal" -> col("s.add"), "tag" -> lit("new"))),
      2, cf, (_, _) => sys.error("n/a"), s => (s._1, s._2, "new"))
    case 3 => DualClause(
      NotMatchedBySourceUpdate(Some(cc), Map(
        "bal" -> (col("t.bal") - 1L), "tag" -> lit("stale"))),
      3, cf, (t, _) => (t._1, t._2 - 1L, "stale"), _ => sys.error("n/a"))
    case _ => DualClause(
      NotMatchedBySourceDelete(Some(cc)), 4, cf,
      (_, _) => sys.error("n/a"), _ => sys.error("n/a"))
  }

  private val genTarget: Gen[List[T]] = for {
    n <- Gen.chooseNum(0, 12)
    ks <- Gen.pick(n, 0L until 20L)
    rows <- Gen.sequence[List[T], T](ks.map(k => for {
      bal <- Gen.chooseNum(-30L, 60L)
      tag <- Gen.oneOf("a", "b")
    } yield (k, bal, tag)))
  } yield rows

  private val genSource: Gen[List[S]] = for {
    n <- Gen.chooseNum(0, 12)
    ks <- Gen.pick(n, 0L until 25L) // overlaps and misses the target
    rows <- Gen.sequence[List[S], S](ks.map(k => for {
      add <- Gen.chooseNum(-10L, 50L)
      cnt <- Gen.chooseNum(1L, 5L)
    } yield (k, add, cnt)))
    // duplicated UNMATCHED keys (>= 20, outside the target domain)
    // are legal ANSI: each row feeds the insert ladder individually
    nDup <- Gen.chooseNum(0, 3)
    dups <- Gen.listOfN(nDup, for {
      k <- Gen.chooseNum(20L, 24L)
      add <- Gen.chooseNum(-10L, 50L)
      cnt <- Gen.chooseNum(1L, 5L)
    } yield (k, add, cnt))
  } yield rows ++ dups

  /** The ANSI reference: first matching clause wins per row class.
    * Returns a SORTED multiset — duplicate inserts from duplicated
    * unmatched source keys must appear once per source row, which a
    * Set comparison would mask. */
  private def reference(tgt: List[T], src: List[S],
                        clauses: List[DualClause]): List[T] = {
    val srcByKey = src.map(s => s._1 -> s).toMap
    val tgtKeys = tgt.map(_._1).toSet
    val fromTarget = tgt.flatMap { t =>
      srcByKey.get(t._1) match {
        case None => // unmatched target: the by-source ladder
          clauses.find(c => c.kind >= 3 && c.cond(Some(t), None)) match {
            case Some(c) if c.kind == 3 => Some(c.update(t, (0L, 0L, 0L)))
            case Some(_) => None // by-source delete
            case None => Some(t) // no by-source clause hit: keep
          }
        case Some(s) =>
          clauses.find(c => c.kind <= 1 && c.cond(Some(t), Some(s))) match {
            case Some(c) if c.kind == 0 => Some(c.update(t, s))
            case Some(_) => None // delete
            case None => Some(t) // no matched clause hit: keep
          }
      }
    }
    val fromSource = src.filterNot(s => tgtKeys.contains(s._1)).flatMap { s =>
      clauses.find(c => c.kind == 2 && c.cond(None, Some(s))).map(_.insert(s))
    }
    (fromTarget ++ fromSource).sorted
  }

  test("property: resolve() == the ANSI reference interpreter over " +
      "arbitrary targets, sources, and clause ladders") {
    import spark.implicits._
    val prop = Prop.forAll(genTarget, genSource,
      Gen.chooseNum(0, 4).flatMap(Gen.listOfN(_, genClause))) {
      (tgt, src, clauses) =>
        val out = resolve(
          tgt.toDF("k", "bal", "tag"),
          src.toDF("k", "add", "n"),
          Seq("k"), clauses.map(_.spark).toVector)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
          .toList.sorted
        val expect = reference(tgt, src, clauses)
        if (out != expect)
          println(s"MISMATCH\n tgt=$tgt\n src=$src\n " +
            s"clauses=${clauses.map(c => (c.kind, c.spark))}\n " +
            s"got=$out\n want=$expect")
        out == expect
    }
    val result = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(12)
        .withInitialSeed(Seed(20260815L)),
      prop)
    assert(result.passed, result.status.toString)
  }
}
