package graft.ops.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Conditional MERGE — the user-facing SQL face of upsert (`MERGE
  * INTO target USING source ON keys WHEN MATCHED [AND cond] THEN
  * UPDATE/DELETE, WHEN NOT MATCHED [AND cond] THEN INSERT`, the
  * Delta/Iceberg statement an ETL user runs daily). The CDC machinery
  * here ([[Cdc.applyChanges]], [[PartitionedUpsert.merge]]) is
  * OP-DRIVEN — the change log already says insert/update/delete;
  * MERGE is the complementary entry point where the caller states
  * CONDITIONS and the engine derives the ops.
  *
  * Semantics (the ANSI/Delta contract):
  *   - clauses evaluate IN ORDER; the first clause whose condition
  *     holds wins for that row,
  *   - a target row matched by NO source row, or matched but
  *     satisfying no clause, passes through unchanged,
  *   - a source row matching no target row feeds the NOT MATCHED
  *     clauses (insert or drop),
  *   - more than one source row MATCHING the same target row is an
  *     ERROR, raised in the executor (Delta's
  *     multiple-source-rows-matched error): letting duplicates
  *     through would apply one key's update twice,
  *     nondeterministically. Duplicated NOT-MATCHED keys legally
  *     insert one row each (ANSI) in [[resolve]]; the keyed-table
  *     path [[mergeIntoTable]] rejects ANY duplicated key — a keyed
  *     upsert target cannot hold two rows for one key.
  *
  * Conditions and set/insert expressions reference the two sides as
  * nested structs `t` (target) and `s` (source) — e.g.
  * `$"s.add_cents" > $"t.bal_cents"` — so no column-name collision
  * handling is ever needed.
  *
  * Execution shape: ONE equi-join on the merge keys (full_outer for
  * [[MergeBuilder.resolve]]; right for the table path, which only
  * needs source-keyed rows) plus a narrow per-row CASE — the same
  * plan an aggregation-free reconciliation costs. The duplicate-source
  * guard is a count window over the same keys, so its exchange is
  * REUSED by the join (no extra shuffle). At 100 TB: broadcast the
  * source if it is small (plan-visible), or rely on the key shuffle —
  * there is no all-pairs or driver-side path. The persisted variant
  * [[mergeIntoTable]] reads only the buckets the source keys route to
  * (manifest-pruned point lookups) and rewrites only touched buckets —
  * O(changes), not O(table).
  */
object MergeInto {

  sealed trait Clause
  final case class MatchedUpdate(cond: Option[Column],
                                 set: Map[String, Column]) extends Clause
  final case class MatchedDelete(cond: Option[Column]) extends Clause
  final case class NotMatchedInsert(cond: Option[Column],
                                    values: Map[String, Column]) extends Clause
  /** The third ANSI/Delta row class — target rows with NO source
    * match ("deactivate everything absent from today's feed").
    * Conditions and SET expressions may reference only `t`. */
  final case class NotMatchedBySourceUpdate(cond: Option[Column],
                                            set: Map[String, Column]) extends Clause
  final case class NotMatchedBySourceDelete(cond: Option[Column]) extends Clause

  /** Entry point: `MergeInto.into(tgt, src, Seq("k")).whenMatched…` */
  def into(target: DataFrame, source: DataFrame,
           keys: Seq[String]): MergeBuilder =
    MergeBuilder(target, source, keys, Vector.empty)

  final case class MergeBuilder(target: DataFrame, source: DataFrame,
                                keys: Seq[String], clauses: Vector[Clause]) {
    def whenMatchedUpdate(set: Map[String, Column]): MergeBuilder =
      copy(clauses = clauses :+ MatchedUpdate(None, set))
    def whenMatchedUpdate(cond: Column, set: Map[String, Column]): MergeBuilder =
      copy(clauses = clauses :+ MatchedUpdate(Some(cond), set))
    def whenMatchedDelete(): MergeBuilder =
      copy(clauses = clauses :+ MatchedDelete(None))
    def whenMatchedDelete(cond: Column): MergeBuilder =
      copy(clauses = clauses :+ MatchedDelete(Some(cond)))
    def whenNotMatchedInsert(values: Map[String, Column]): MergeBuilder =
      copy(clauses = clauses :+ NotMatchedInsert(None, values))
    def whenNotMatchedInsert(cond: Column,
                             values: Map[String, Column]): MergeBuilder =
      copy(clauses = clauses :+ NotMatchedInsert(Some(cond), values))
    def whenNotMatchedBySourceUpdate(set: Map[String, Column]): MergeBuilder =
      copy(clauses = clauses :+ NotMatchedBySourceUpdate(None, set))
    def whenNotMatchedBySourceUpdate(cond: Column,
                                     set: Map[String, Column]): MergeBuilder =
      copy(clauses = clauses :+ NotMatchedBySourceUpdate(Some(cond), set))
    def whenNotMatchedBySourceDelete(): MergeBuilder =
      copy(clauses = clauses :+ NotMatchedBySourceDelete(None))
    def whenNotMatchedBySourceDelete(cond: Column): MergeBuilder =
      copy(clauses = clauses :+ NotMatchedBySourceDelete(Some(cond)))
    /** The post-merge target state as a frame (same schema as target). */
    def resolve(): DataFrame =
      MergeInto.resolve(target, source, keys, clauses)
  }

  /** Target nested as `t`, source as `s`, joined full_outer on the
    * keys, with the duplicate-source guard applied.
    *
    * Guard semantics (r14 review, matching ANSI/Delta exactly):
    * duplicated source keys are an error only when they MATCH a
    * target row (the update would apply twice, nondeterministically);
    * duplicated NOT-MATCHED keys legally insert one row each, and
    * NULL-keyed rows can never match, so both pass. The count window
    * rides the same key exchange the join needs (no extra shuffle);
    * the raise itself is evaluated post-join where matched-ness is
    * known. `strictDups` (the keyed-TABLE path) raises on ANY
    * duplicated non-null key instead — a keyed upsert target cannot
    * hold two rows for one key, so even unmatched duplicates are a
    * contract violation there. */
  private def joinSides(target: DataFrame, source: DataFrame,
                        keys: Seq[String], joinType: String,
                        strictDups: Boolean = false): DataFrame = {
    val tCols = target.columns.toSeq
    val sCols = source.columns.toSeq
    require(keys.nonEmpty, "MERGE needs at least one join key")
    require(keys.forall(tCols.contains) && keys.forall(sCols.contains),
      s"merge keys ${keys.mkString(",")} must exist on both sides")
    val tN = target.select(
      keys.map(k => col(k).as(s"__k_$k")) :+
        struct(tCols.map(col): _*).as("t"): _*)
    val keysNonNull = keys.map(col(_).isNotNull).reduce(_ && _)
    val w = Window.partitionBy(keys.map(col): _*)
    val dupMsg = (ks: Seq[Column]) => concat(
      lit("MERGE source has multiple rows for join key ("),
      concat_ws(",", ks: _*), lit(")"))
    val counted = source.withColumn("__dup", count(lit(1)).over(w))
    val guarded =
      if (strictDups)
        counted.filter(
          when(keysNonNull && col("__dup") > 1,
            raise_error(dupMsg(keys.map(k => col(k).cast("string"))))
              .cast("boolean"))
            .otherwise(lit(true)))
      else counted
    val sN = guarded.select(
      keys.map(k => col(k).as(s"__k_$k")) :+
        col("__dup") :+
        struct(sCols.map(col): _*).as("s"): _*)
    val joined = tN.join(sN, keys.map(k => s"__k_$k"), joinType)
    val checked =
      if (strictDups) joined
      else joined.filter(
        when(col("t").isNotNull && col("s").isNotNull && col("__dup") > 1,
          raise_error(dupMsg(keys.map(k => col(s"__k_$k").cast("string"))))
            .cast("boolean"))
          .otherwise(lit(true)))
    checked.drop("__dup")
  }

  /** Fold the clause list right-to-left into one CASE expression per
    * row class. Returns (matchedImage, insertImage, bySourceImage) —
    * a null image means "no row in the output" (delete /
    * insert-condition miss). */
  private def images(target: DataFrame, clauses: Seq[Clause])
      : (Column, Column, Column) = {
    val tSchema = target.schema
    val tCols = target.columns.toSeq
    // a typo'd SET/VALUES column would otherwise be silently ignored
    // while the clause still consumes its rows (r14 review) — fail at
    // plan time like ANSI MERGE's analysis error
    def checkCols(what: String, m: Map[String, Column]): Unit = {
      val unknown = m.keySet -- tCols
      require(unknown.isEmpty,
        s"MERGE $what references non-target column(s): ${unknown.mkString(",")}")
    }
    clauses.foreach {
      case MatchedUpdate(_, set) => checkCols("update SET", set)
      case NotMatchedInsert(_, values) => checkCols("insert VALUES", values)
      case NotMatchedBySourceUpdate(_, set) =>
        checkCols("by-source update SET", set)
      case _ =>
    }
    def updated(set: Map[String, Column]): Column = struct(tCols.map { c =>
      set.getOrElse(c, col(s"t.$c")).cast(tSchema(c).dataType).as(c)
    }: _*)
    def inserted(values: Map[String, Column]): Column = struct(tCols.map { c =>
      values.getOrElse(c, lit(null)).cast(tSchema(c).dataType).as(c)
    }: _*)
    val noRow = lit(null).cast(tSchema)
    val matchedImage = clauses.foldRight(col("t")) {
      case (MatchedUpdate(cond, set), els) =>
        when(cond.getOrElse(lit(true)), updated(set)).otherwise(els)
      case (MatchedDelete(cond), els) =>
        when(cond.getOrElse(lit(true)), noRow).otherwise(els)
      case (_, els) => els
    }
    val insertImage = clauses.foldRight(noRow) {
      case (NotMatchedInsert(cond, values), els) =>
        when(cond.getOrElse(lit(true)), inserted(values)).otherwise(els)
      case (_, els) => els
    }
    val bySourceImage = clauses.foldRight(col("t")) {
      case (NotMatchedBySourceUpdate(cond, set), els) =>
        when(cond.getOrElse(lit(true)), updated(set)).otherwise(els)
      case (NotMatchedBySourceDelete(cond), els) =>
        when(cond.getOrElse(lit(true)), noRow).otherwise(els)
      case (_, els) => els
    }
    (matchedImage, insertImage, bySourceImage)
  }

  private def hasBySource(clauses: Seq[Clause]): Boolean = clauses.exists {
    case _: NotMatchedBySourceUpdate | _: NotMatchedBySourceDelete => true
    case _ => false
  }

  /** The post-merge state of `target` under `clauses` — pure frame
    * transformation, no table required. */
  def resolve(target: DataFrame, source: DataFrame, keys: Seq[String],
              clauses: Seq[Clause]): DataFrame = {
    val tCols = target.columns.toSeq
    val (matchedImage, insertImage, bySourceImage) = images(target, clauses)
    joinSides(target, source, keys, "full_outer")
      .select(
        when(col("t").isNotNull && col("s").isNotNull, matchedImage)
          .when(col("s").isNotNull, insertImage)
          .otherwise(bySourceImage) // target-only: by-source ladder
          .as("__img"))                     // (default keep = col("t"))
      .filter(col("__img").isNotNull)
      .select(tCols.map(c => col(s"__img.$c").as(c)): _*)
  }

  /** MERGE into a persisted [[PartitionedUpsert]] table: derives the
    * op-frame (u/d) the clauses imply and routes it through the
    * bucket-pruned merge — reads ONLY the buckets the source keys hit
    * (`readForKeys`), rewrites only touched buckets, and is
    * exactly-once under `txn` replay like every maintainer here.
    * Matched rows that satisfy no clause produce NO change row (the
    * bucket is not even touched if nothing else routes there).
    *
    * WHEN NOT MATCHED BY SOURCE changes the scale contract BY
    * DEFINITION: every target row must be examined to know it has no
    * source match, so the read becomes the full table and the cost
    * O(table) — the same property Delta's whenNotMatchedBySource has.
    * Rows the by-source ladder leaves untouched still produce no
    * change row, so the REWRITE remains O(rows actually changed).
    *
    * `mergeSchema = true` (Delta's mergeSchema-on-merge / `MERGE WITH
    * SCHEMA EVOLUTION`): source-extra columns are ADDED to the target
    * (metadata-speed — evolveSchema's all-adds manifest swap) and
    * source columns whose type is a lossless up-cast of the target's
    * WIDEN it (the one O(table) rewrite a type migration honestly
    * costs), both BEFORE the clauses resolve — so SET/VALUES of a new
    * column passes checkCols and pre-merge rows read it as null.
    * Replay-idempotent: an already-evolved schema no-ops in
    * evolveSchema before the merge's own txn fast-path even runs.
    * New columns keep their SOURCE spelling — SET keys for them must
    * match it (existing columns stay case-insensitive via the SQL
    * face's canonicalizer). */
  def mergeIntoTable(spark: SparkSession, dir: String, source: DataFrame,
                     keyCol: String, clauses: Seq[Clause], lsn: Long,
                     txn: Option[(String, Long)] = None,
                     mergeSchema: Boolean = false): Seq[Long] = {
    if (mergeSchema) {
      // evolve only columns the clauses ASSIGN (Delta's rule for
      // explicit assignments — star merges arrive here already
      // expanded over the evolved frame, so their new columns are
      // assignment keys too). The source's un-assigned payload
      // columns (deltas, counters) must NOT leak into the table.
      val assigned: Set[String] = clauses.flatMap {
        case MatchedUpdate(_, set) => set.keys
        case NotMatchedInsert(_, values) => values.keys
        case NotMatchedBySourceUpdate(_, set) => set.keys
        case _ => Nil
      }.map(_.toLowerCase).toSet
      val m0 = PartitionedUpsert.manifestOrFail(spark, dir)
      val tFields = m0.schema.fields.map(f => f.name.toLowerCase -> f).toMap
      val evolvable = source.schema.fields.toSeq
        .filter(f => assigned(f.name.toLowerCase))
      val adds = evolvable
        .filterNot(f => tFields.contains(f.name.toLowerCase))
        .map(f => Cdc.AddColumn(f.name, f.dataType))
      val widens = evolvable.flatMap { f =>
        tFields.get(f.name.toLowerCase).collect {
          case tf if tf.dataType != f.dataType &&
              org.apache.spark.sql.catalyst.expressions.Cast
                .canUpCast(tf.dataType, f.dataType) =>
            Cdc.WidenColumn(tf.name, f.dataType)
        }
      }
      if (adds.nonEmpty || widens.nonEmpty)
        PartitionedUpsert.evolveSchema(spark, dir, adds ++ widens,
          m0.keyCol, m0.nBuckets)
    }
    val m = PartitionedUpsert.manifestOrFail(spark, dir)
    // every insert clause must set the table key — a NULL key row in
    // a keyed upsert target is never what the caller meant. And no
    // UPDATE clause may SET the key (r14 review): the change row
    // would route to the NEW key's bucket, leaving the old-key row
    // alive alongside it — a silent divergence from resolve(), which
    // replaces the row. Key changes on a keyed table are
    // delete+insert, stated, not a rebucketing side effect.
    clauses.foreach {
      case NotMatchedInsert(_, values) =>
        require(values.contains(keyCol),
          s"MERGE insert VALUES must set the table key '$keyCol'")
      case MatchedUpdate(_, set) =>
        require(!set.contains(keyCol),
          s"MERGE update SET must not change the table key '$keyCol' — use delete+insert")
      case NotMatchedBySourceUpdate(_, set) =>
        require(!set.contains(keyCol),
          s"MERGE by-source update SET must not change the table key '$keyCol'")
      case _ =>
    }
    // pin the source: it is consumed TWICE (bucket routing below, then
    // the join) — an unpinned nondeterministic source (sample/limit)
    // could route buckets for one key set and join another, silently
    // misclassifying rows as NOT MATCHED (r14 review; the same
    // double-consumption pin DauStream.mergeBatch makes)
    val src = source.localCheckpoint()
    val bySource = hasBySource(clauses)
    // without by-source clauses, target-only rows are irrelevant
    // (untouched rows stay in their buckets) — read only source-keyed
    // buckets and right-join; with them, the full table joins
    // full_outer so the by-source ladder sees every unmatched row
    val slice =
      if (bySource) PartitionedUpsert.read(spark, dir)
      else PartitionedUpsert.readForKeys(spark, dir, src.select(keyCol), keyCol)
    val tCols = slice.columns.toSeq
    val (matchedImage, insertImage, bySourceImage) = images(slice, clauses)
    def opFold(pf: PartialFunction[Clause, (Option[Column], String)]): Column =
      clauses.foldRight(lit(null).cast("string")) { (cl, els) =>
        pf.lift(cl) match {
          case Some((cond, op)) =>
            when(cond.getOrElse(lit(true)), lit(op)).otherwise(els)
          case None => els
        }
      }
    val matchedOp = opFold {
      case MatchedUpdate(cond, _) => (cond, "u")
      case MatchedDelete(cond) => (cond, "d")
    }
    val insertOp = opFold { case NotMatchedInsert(cond, _) => (cond, "u") }
    val bySourceOp = opFold {
      case NotMatchedBySourceUpdate(cond, _) => (cond, "u")
      case NotMatchedBySourceDelete(cond) => (cond, "d")
    }
    val changes = joinSides(slice, src, Seq(keyCol),
        if (bySource) "full_outer" else "right", strictDups = true)
      .select(
        when(col("t").isNotNull && col("s").isNotNull, matchedOp)
          .when(col("s").isNotNull, insertOp)
          .otherwise(bySourceOp).as("__op"),
        when(col("t").isNotNull && col("s").isNotNull,
          when(matchedOp === "d", col("t")).otherwise(matchedImage))
          .when(col("s").isNotNull, insertImage)
          .otherwise(
            when(bySourceOp === "d", col("t")).otherwise(bySourceImage))
          .as("__img"))
      .filter(col("__op").isNotNull)
      .select(col("__op") +: lit(lsn).as("__lsn") +:
        tCols.map(c => col(s"__img.$c").as(c)): _*)
      // the syntactic key checks above can't see VALUES (s.k, …) with
      // a null-keyed source row (legal per ANSI: null keys never
      // match, so the dup guard exempts them and the row routes to
      // the insert clause) — that would silently plant a null-key row
      // in a keyed table. Runtime guard on the change frame (r14
      // ADVICE): narrow filter, no extra shuffle.
      .filter(
        when(col(keyCol).isNull,
          raise_error(lit(
            s"MERGE produced a change row with NULL table key '$keyCol' — " +
            "a keyed upsert table cannot hold null-keyed rows; filter " +
            "null-keyed source rows or fix the INSERT VALUES expression"))
            .cast("boolean"))
          .otherwise(lit(true)))
    PartitionedUpsert.merge(spark, dir, changes, keyCol, "__lsn", "__op",
      tCols.filterNot(_ == keyCol), m.nBuckets, txn)
  }

  // ---------------------------------------------------------------
  // Oracled fixture
  // ---------------------------------------------------------------

  /** MERGE INTO over the corpus: target = customer balances in exact
    * integer cents, source = per-customer lifetime order revenue
    * (every ~97th key remapped far out of the customer domain —
    * +100,000,000, safe past any scale factor, the ADVICE-r13 ghost
    * rule). Clause ladder, in order:
    *   1. WHEN MATCHED AND s.n >= 20        THEN DELETE
    *   2. WHEN MATCHED AND t.bal_cents > 0  THEN UPDATE bal += add, seg='UPGRADED'
    *      (matched rows failing both keep their target row — the
    *      default-keep path)
    *   3. WHEN NOT MATCHED AND s.add_cents >= 240,000,000 THEN INSERT
    *      (below-threshold source-only rows drop)
    * All compared measures are exact integers (cents grid / counts),
    * so clause selection can never straddle a fold-order ulp. Probed:
    * every path non-empty at sf0.01 AND sf0.1 (deletes 6/59,
    * upgrades 1375/13612, keeps 119/1328, inserts ~half of 16/155,
    * target-only 16/156). */
  def qCdcMergeInto(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tgt = Tables.table(spark, dir, "customer").select(
      $"c_custkey",
      round($"c_acctbal" * 100.0, 0).cast("long").as("bal_cents"),
      $"c_mktsegment".as("seg"))
    val src = Tables.table(spark, dir, "orders")
      .groupBy($"o_custkey")
      .agg(sum(round($"o_totalprice" * 100.0, 0).cast("long")).as("add_cents"),
        count(lit(1)).as("n"))
      .select(
        when($"o_custkey" % 97 === 0, $"o_custkey" + 100000000L)
          .otherwise($"o_custkey").as("c_custkey"),
        $"add_cents", $"n")
    into(tgt, src, Seq("c_custkey"))
      .whenMatchedDelete($"s.n" >= 20)
      .whenMatchedUpdate($"t.bal_cents" > 0, Map(
        "bal_cents" -> ($"t.bal_cents" + $"s.add_cents"),
        "seg" -> lit("UPGRADED")))
      .whenNotMatchedInsert($"s.add_cents" >= 240000000L, Map(
        "c_custkey" -> $"s.c_custkey",
        "bal_cents" -> $"s.add_cents",
        "seg" -> lit("NEW")))
      .resolve()
      .orderBy($"c_custkey")
  }

  /** The BY-SOURCE row class under the cross-engine gate: source =
    * per-customer 1995-H1 order revenue (every o_custkey is a real
    * customer, so the not-matched-insert class is structurally empty
    * and the key isolates the by-source ladder). Clause ladder:
    *   1. WHEN MATCHED                        THEN bal += add, seg='ACTIVE'
    *   2. WHEN NOT MATCHED BY SOURCE AND t.bal_cents < 0 THEN DELETE
    *      (delinquents with no recent orders purged)
    *   3. WHEN NOT MATCHED BY SOURCE          THEN seg='DORMANT'
    * Probed non-empty at sf0.01 AND sf0.1: matched 777/7868,
    * bs-delete 54/638, bs-dormant 669/6494. Exact integer cents
    * throughout. */
  def qCdcMergeBySource(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tgt = Tables.table(spark, dir, "customer").select(
      $"c_custkey",
      round($"c_acctbal" * 100.0, 0).cast("long").as("bal_cents"),
      $"c_mktsegment".as("seg"))
    val src = Tables.table(spark, dir, "orders")
      .filter($"o_orderdate" >= "1995-01-01" && $"o_orderdate" < "1995-07-01")
      .groupBy($"o_custkey".as("c_custkey"))
      .agg(sum(round($"o_totalprice" * 100.0, 0).cast("long")).as("add_cents"))
    into(tgt, src, Seq("c_custkey"))
      .whenMatchedUpdate(Map(
        "bal_cents" -> ($"t.bal_cents" + $"s.add_cents"),
        "seg" -> lit("ACTIVE")))
      .whenNotMatchedBySourceDelete($"t.bal_cents" < 0)
      .whenNotMatchedBySourceUpdate(Map("seg" -> lit("DORMANT")))
      .resolve()
      .orderBy($"c_custkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cdc_merge_into" -> (qCdcMergeInto _),
    "q_cdc_merge_bysource" -> (qCdcMergeBySource _)
  )

  val oracle: Map[String, String] = Map(
    // by-source ladder as LEFT JOIN + CASE: matched rows update,
    // unmatched delinquents drop, the rest go DORMANT
    "q_cdc_merge_bysource" ->
      """WITH src AS (
        |  SELECT o_custkey AS c_custkey,
        |         CAST(SUM(CAST(ROUND(o_totalprice*100,0) AS BIGINT)) AS BIGINT)
        |           AS add_cents
        |  FROM orders
        |  WHERE o_orderdate >= DATE'1995-01-01'
        |    AND o_orderdate <  DATE'1995-07-01'
        |  GROUP BY 1),
        |tgt AS (
        |  SELECT c_custkey,
        |         CAST(ROUND(c_acctbal*100,0) AS BIGINT) AS bal_cents,
        |         c_mktsegment AS seg
        |  FROM customer)
        |SELECT t.c_custkey,
        |  CASE WHEN s.c_custkey IS NOT NULL THEN t.bal_cents + s.add_cents
        |       ELSE t.bal_cents END AS bal_cents,
        |  CASE WHEN s.c_custkey IS NOT NULL THEN 'ACTIVE'
        |       ELSE 'DORMANT' END AS seg
        |FROM tgt t LEFT JOIN src s ON t.c_custkey = s.c_custkey
        |WHERE NOT (s.c_custkey IS NULL AND t.bal_cents < 0)
        |ORDER BY t.c_custkey""".stripMargin,
    // the oracle states the same clause ladder as one FULL OUTER JOIN
    // + ordered CASE — a different evaluation of the same contract
    "q_cdc_merge_into" ->
      """WITH src0 AS (
        |  SELECT o_custkey,
        |         CAST(SUM(CAST(ROUND(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS add_cents,
        |         COUNT(*) AS n
        |  FROM orders GROUP BY 1),
        |src AS (
        |  SELECT CASE WHEN o_custkey % 97 = 0 THEN o_custkey + 100000000
        |              ELSE o_custkey END AS c_custkey,
        |         add_cents, n
        |  FROM src0),
        |tgt AS (
        |  SELECT c_custkey,
        |         CAST(ROUND(c_acctbal*100,0) AS BIGINT) AS bal_cents,
        |         c_mktsegment AS seg
        |  FROM customer)
        |SELECT COALESCE(t.c_custkey, s.c_custkey) AS c_custkey,
        |  CASE WHEN t.c_custkey IS NOT NULL AND s.c_custkey IS NOT NULL THEN
        |         CASE WHEN t.bal_cents > 0 THEN t.bal_cents + s.add_cents
        |              ELSE t.bal_cents END
        |       WHEN t.c_custkey IS NOT NULL THEN t.bal_cents
        |       ELSE s.add_cents END AS bal_cents,
        |  CASE WHEN t.c_custkey IS NOT NULL AND s.c_custkey IS NOT NULL THEN
        |         CASE WHEN t.bal_cents > 0 THEN 'UPGRADED' ELSE t.seg END
        |       WHEN t.c_custkey IS NOT NULL THEN t.seg
        |       ELSE 'NEW' END AS seg
        |FROM tgt t FULL OUTER JOIN src s ON t.c_custkey = s.c_custkey
        |WHERE NOT (t.c_custkey IS NOT NULL AND s.c_custkey IS NOT NULL
        |           AND s.n >= 20)
        |  AND NOT (t.c_custkey IS NULL AND s.add_cents < 240000000)
        |ORDER BY c_custkey""".stripMargin
  )
}
