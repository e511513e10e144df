package graft.ops.cdc

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Scalacheck invariant for the STATEMENT parser: for arbitrary
  * generated clause ladders, rendering the ladder as MERGE statement
  * TEXT and running it through [[MergeSql.resolveStatement]] equals
  * building the same ladder directly on [[MergeInto.MergeBuilder]] —
  * over generated target/source frames. Every clause exists twice
  * (text fragment + builder Clause built from independent Column
  * code), so a divergence is a parser/lowering bug, never a fixture
  * artifact. The dual of MergeIntoPropertiesSpec one level up the
  * stack: that one proves the builder against a Scala interpreter;
  * this one proves the parser against the builder. */
class MergeSqlPropertiesSpec extends SparkSpec {

  import MergeInto._

  /** (statement text with aliases a=target/b=source, builder Clause). */
  private case class DualClause(text: String, spark: Clause)

  private val conds: Seq[(String, Column)] = Seq(
    ("b.n >= 3", col("s.n") >= 3),
    ("b.add > 20", col("s.add") > 20L),
    ("a.bal > 0", col("t.bal") > 0L),
    ("b.add > a.bal", col("s.add") > col("t.bal")),
    // CASE with THEN/END inside — the clause-boundary stressor
    ("CASE WHEN a.bal > 0 THEN true ELSE false END",
      when(col("t.bal") > 0L, true).otherwise(false)))

  private val condsT: Seq[(String, Column)] = Seq(
    ("a.bal > 0", col("t.bal") > 0L),
    ("a.tag = 'a'", col("t.tag") === "a"))

  private def opt[A](g: Gen[A]): Gen[Option[A]] =
    Gen.oneOf(Gen.const(None), g.map(Some(_)))

  private val genClause: Gen[DualClause] = for {
    kind <- Gen.chooseNum(0, 4)
    c <- if (kind >= 3) opt(Gen.oneOf(condsT)) else opt(Gen.oneOf(conds))
  } yield {
    val andTxt = c.map { case (t, _) => s" AND $t" }.getOrElse("")
    val cc = c.map(_._2)
    kind match {
      case 0 => DualClause(
        s"WHEN MATCHED$andTxt THEN UPDATE SET bal = a.bal + b.add, tag = 'up'",
        MatchedUpdate(cc, Map(
          "bal" -> (col("t.bal") + col("s.add")), "tag" -> lit("up"))))
      case 1 => DualClause(
        s"WHEN MATCHED$andTxt THEN DELETE",
        MatchedDelete(cc))
      case 2 => DualClause(
        s"WHEN NOT MATCHED$andTxt THEN INSERT (k, bal, tag) " +
          "VALUES (b.k, b.add, 'new')",
        NotMatchedInsert(cc, Map(
          "k" -> col("s.k"), "bal" -> col("s.add"), "tag" -> lit("new"))))
      case 3 => DualClause(
        s"WHEN NOT MATCHED BY SOURCE$andTxt THEN " +
          "UPDATE SET bal = a.bal - 1, tag = 'stale'",
        NotMatchedBySourceUpdate(cc, Map(
          "bal" -> (col("t.bal") - 1L), "tag" -> lit("stale"))))
      case _ => DualClause(
        s"WHEN NOT MATCHED BY SOURCE$andTxt THEN DELETE",
        NotMatchedBySourceDelete(cc))
    }
  }

  private type T = (Long, Long, String)
  private type S = (Long, Long, Long)

  private val genTarget: Gen[List[T]] = for {
    n <- Gen.chooseNum(0, 10)
    ks <- Gen.pick(n, 0L until 18L)
    rows <- Gen.sequence[List[T], T](ks.map(k => for {
      bal <- Gen.chooseNum(-30L, 60L)
      tag <- Gen.oneOf("a", "b")
    } yield (k, bal, tag)))
  } yield rows

  private val genSource: Gen[List[S]] = for {
    n <- Gen.chooseNum(0, 10)
    ks <- Gen.pick(n, 0L until 22L)
    rows <- Gen.sequence[List[S], S](ks.map(k => for {
      add <- Gen.chooseNum(-10L, 50L)
      cnt <- Gen.chooseNum(1L, 5L)
    } yield (k, add, cnt)))
  } yield rows

  test("property: statement text == builder over arbitrary clause " +
      "ladders and frames (parser/lowering equivalence)") {
    import spark.implicits._
    val prop = Prop.forAll(genTarget, genSource,
      Gen.chooseNum(1, 4).flatMap(Gen.listOfN(_, genClause))) {
      (tgt, src, clauses) =>
        val tDf = tgt.toDF("k", "bal", "tag")
        val sDf = src.toDF("k", "add", "n")
        tDf.createOrReplaceTempView("msp_tgt")
        sDf.createOrReplaceTempView("msp_src")
        val stmt =
          "MERGE INTO msp_tgt AS a USING msp_src AS b ON a.k = b.k\n" +
            clauses.map(_.text).mkString("\n")
        val viaText = MergeSql.resolveStatement(spark, stmt)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
          .toList.sorted
        val viaBuilder = MergeBuilder(tDf, sDf, Seq("k"),
          clauses.map(_.spark).toVector).resolve()
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
          .toList.sorted
        if (viaText != viaBuilder)
          println(s"MISMATCH\n stmt=$stmt\n tgt=$tgt src=$src\n " +
            s"text=$viaText\n bldr=$viaBuilder")
        viaText == viaBuilder
    }
    val result = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(12)
        .withInitialSeed(org.scalacheck.rng.Seed(20260815L)),
      prop)
    assert(result.passed, result.status.toString)
  }
}
