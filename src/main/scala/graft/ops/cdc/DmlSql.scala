package graft.ops.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** SQL-text `DELETE FROM` / `UPDATE` against persisted
  * [[PartitionedUpsert]] tables — the two single-table DML statements
  * every warehouse user runs daily, which Spark itself only accepts
  * for DSv2 row-level-operation tables. Same design as [[MergeSql]]:
  * the SKELETON is hand-parsed from the shared offset-preserving
  * token stream; the WHERE condition and SET value expressions are
  * sliced out of the original text and handed to Spark's `expr()`
  * verbatim (single-table statements, so bare column names resolve
  * against the table read — no alias rewriting needed at all; an
  * optional table alias is accepted and rewritten to nothing since
  * `a.col` over the flat read frame would not resolve).
  *
  * Grammar:
  * {{{
  * DELETE FROM <name> [AS alias] [WHERE <cond>]
  * UPDATE <name> [AS alias] SET col = expr [, …] [WHERE <cond>]
  * }}}
  *
  * Lowering — both statements are one scan + one bucket-pruned merge:
  * read the committed state, filter to the WHERE-matching rows,
  * derive the change frame (op 'd' rows verbatim; op 'u' rows with
  * SET images computed over the read frame), and hand it to
  * [[PartitionedUpsert.merge]] with lsn = version + 1. The SCAN is
  * O(table) by definition (an arbitrary WHERE must examine every
  * row — the same property Delta's DELETE has), but the REWRITE is
  * O(buckets holding matched rows): unmatched buckets are never
  * touched, and a WHERE that matches nothing burns no version (merge
  * short-circuits on an empty change frame at prepare).
  *
  * Guards: `SET <key> = …` is rejected (rebucketing-by-update is the
  * same silent divergence [[MergeInto.mergeIntoTable]] refuses —
  * delete+insert is the stated path); an unconditional DELETE is
  * accepted (it is the truncate idiom) but an unconditional UPDATE
  * of zero SET columns cannot parse. */
object DmlSql {

  import MergeSql.{Tok, IDENT, PUNCT, tokenize, fail, tableLocation}

  private final case class RawDml(sql: String, toks: IndexedSeq[Tok],
                                  table: String, alias: Option[String],
                                  sets: Seq[(String, (Int, Int))],
                                  where: Option[(Int, Int)])

  /** Skeleton parse. `isUpdate` selects the grammar. */
  private def parseDml(sql: String, isUpdate: Boolean): RawDml = {
    val toks = tokenize(sql)
    var i = 0
    def cur: Tok =
      if (i < toks.length) toks(i)
      else fail(sql, sql.length, "unexpected end of statement")
    def isKw(k: String): Boolean =
      i < toks.length && toks(i).kind == IDENT && toks(i).upper == k
    def expectKw(k: String): Unit =
      if (isKw(k)) i += 1
      else fail(sql, if (i < toks.length) cur.start else sql.length, s"expected $k")

    def parseName(): String = {
      if (cur.kind != IDENT && cur.kind != MergeSql.STR)
        fail(sql, cur.start, "expected a table name")
      val parts = Vector.newBuilder[String]
      parts += cur.raw; i += 1
      while (i < toks.length && cur.kind == PUNCT && cur.raw == "." &&
             i + 1 < toks.length) {
        i += 1; parts += cur.raw; i += 1
      }
      parts.result().mkString(".")
    }

    /** [from,until) of tokens up to a depth-0/case-0 stop keyword. */
    def scanExpr(stopKw: Set[String], stopPunct: Set[String]): (Int, Int) = {
      val from = i
      var depth = 0; var caseDepth = 0; var done = false
      while (!done && i < toks.length) {
        val t = toks(i)
        if (t.kind == PUNCT && (t.raw == "(" || t.raw == "[")) { depth += 1; i += 1 }
        else if (t.kind == PUNCT && (t.raw == ")" || t.raw == "]")) { depth -= 1; i += 1 }
        else if (t.kind == IDENT && t.upper == "CASE") { caseDepth += 1; i += 1 }
        else if (t.kind == IDENT && t.upper == "END" && caseDepth > 0) { caseDepth -= 1; i += 1 }
        else if (depth == 0 && caseDepth == 0 && t.kind == IDENT &&
                 stopKw.contains(t.upper)) done = true
        else if (depth == 0 && caseDepth == 0 && t.kind == PUNCT &&
                 stopPunct.contains(t.raw)) done = true
        else i += 1
      }
      if (i == from) fail(sql, cur.start, "empty expression")
      (from, i)
    }

    if (isUpdate) expectKw("UPDATE") else { expectKw("DELETE"); expectKw("FROM") }
    val table = parseName()
    val alias = {
      if (isKw("AS")) i += 1
      if (i < toks.length && cur.kind == IDENT &&
          !Set("SET", "WHERE").contains(cur.upper)) {
        val a = cur.raw; i += 1; Some(a)
      } else None
    }
    val sets =
      if (!isUpdate) Nil
      else {
        expectKw("SET")
        val out = Vector.newBuilder[(String, (Int, Int))]
        var more = true
        while (more) {
          if (cur.kind != IDENT && cur.kind != MergeSql.STR)
            fail(sql, cur.start, "expected a column name in SET")
          var colName = cur.raw.stripPrefix("`").stripSuffix("`"); i += 1
          if (i + 1 < toks.length && cur.kind == PUNCT && cur.raw == "." &&
              (toks(i + 1).kind == IDENT || toks(i + 1).kind == MergeSql.STR)) {
            i += 1
            colName = cur.raw.stripPrefix("`").stripSuffix("`"); i += 1
          }
          if (!(cur.kind == PUNCT && cur.raw == "=")) fail(sql, cur.start, "expected '='")
          i += 1
          out += ((colName, scanExpr(Set("WHERE"), Set(","))))
          if (i < toks.length && cur.kind == PUNCT && cur.raw == ",") i += 1
          else more = false
        }
        val cols = out.result()
        // duplicate SET columns are an error, same guard as MergeSql —
        // standard engines (Delta, ANSI) reject them; silently applying
        // the last one would accept a statement the user mistyped
        val dup = cols.map(_._1.toLowerCase).groupBy(identity)
          .collectFirst { case (c, vs) if vs.length > 1 => c }
        dup.foreach(c => fail(sql, toks.head.start,
          s"duplicate SET column '$c' — each column may be assigned once"))
        cols
      }
    val where =
      if (isKw("WHERE")) { i += 1; Some(scanExpr(Set.empty, Set.empty)) }
      else None
    if (i < toks.length)
      fail(sql, cur.start, s"unexpected trailing token '${cur.raw}'")
    RawDml(sql, toks, table, alias, sets, where)
  }

  /** Slice a token range back out of the original text, dropping
    * `alias.` qualifiers (single table ⇒ the qualifier is noise the
    * flat read frame cannot resolve). For an alias-less statement the
    * usable qualifier is the table's BARE name — a user writing
    * `UPDATE db.t SET c = 1 WHERE t.c > 0` qualifies with `t`, never
    * the dotted `db.t` (which cannot even appear as one token) — so
    * both the full name and its last segment strip. */
  private def exprText(d: RawDml, range: (Int, Int)): String = {
    val (from, until) = range
    val aliasU = d.alias.map(_.toUpperCase)
    val tableU = d.table.toUpperCase
    val tableLastU = d.table.split('.').last
      .stripPrefix("`").stripSuffix("`").toUpperCase
    val sb = new StringBuilder
    var pos = d.toks(from).start
    var i = from
    while (i < until) {
      val t = d.toks(i)
      val isQualifier = t.kind == IDENT &&
        (aliasU.contains(t.upper) ||
          (aliasU.isEmpty && (t.upper == tableU || t.upper == tableLastU))) &&
        i + 1 < until && d.toks(i + 1).kind == PUNCT && d.toks(i + 1).raw == "."
      if (isQualifier) {
        sb.append(d.sql.substring(pos, t.start))
        pos = d.toks(i + 1).end // skip "alias" and the "."
        i += 2
      } else i += 1
    }
    sb.append(d.sql.substring(pos, d.toks(until - 1).end))
    sb.toString
  }

  private def run(spark: SparkSession, d: RawDml, isUpdate: Boolean,
                  dir: String): Seq[Long] = {
    val m = PartitionedUpsert.manifestOrFail(spark, dir)
    val keyCol = m.keyCol
    // composite (struct-surrogate) key: its field names are part of
    // the key — SET of one is the same rebucketing hazard as SET of
    // the key, and WHERE may spell them FLAT (`WHERE region = 'eu'
    // AND id = 7`) the way a composite-PK user naturally writes them
    val keyFields: Seq[org.apache.spark.sql.types.StructField] =
      m.schema(keyCol).dataType match {
        case st: org.apache.spark.sql.types.StructType => st.fields.toSeq
        case _ => Seq.empty
      }
    val valueCols = m.schema.fieldNames.filterNot(
      _.equalsIgnoreCase(keyCol)).toSeq
    if (isUpdate) {
      d.sets.foreach { case (c, _) =>
        require(!c.equalsIgnoreCase(keyCol) &&
            !keyFields.exists(_.name.equalsIgnoreCase(c)),
          s"UPDATE SET must not change the table key '$keyCol' — " +
          "use DELETE + INSERT")
        require(m.schema.fieldNames.exists(_.equalsIgnoreCase(c)),
          s"UPDATE SET references non-table column '$c'")
      }
    }
    // flat-name sugar: key-struct fields that collide with NO table
    // column resolve as top-level names in WHERE/SET expressions (the
    // helper columns are dropped by the explicit selects below)
    val read = keyFields
      .filterNot(f => m.schema.fieldNames.exists(_.equalsIgnoreCase(f.name)))
      .foldLeft(PartitionedUpsert.read(spark, dir))((df, f) =>
        df.withColumn(f.name, col(s"`$keyCol`.`${f.name}`")))
    val matched = d.where.fold(read)(w => read.filter(expr(exprText(d, w))))
    val changes =
      if (isUpdate) {
        val setMap: Map[String, Column] =
          d.sets.map { case (c, r) => c.toLowerCase -> expr(exprText(d, r)) }.toMap
        matched.select(
          lit("u").as("__op") +: lit(m.version + 1).as("__lsn") +:
            col(keyCol) +: valueCols.map(c =>
              setMap.getOrElse(c.toLowerCase, col(c))
                .cast(m.schema(c).dataType).as(c)): _*)
      } else
        matched.select(
          lit("d").as("__op") +: lit(m.version + 1).as("__lsn") +:
            col(keyCol) +: valueCols.map(col): _*)
    PartitionedUpsert.merge(spark, dir, changes, keyCol, "__lsn", "__op",
      valueCols, m.nBuckets)
  }

  /** `DELETE FROM <catalog graft table> [WHERE …]` — statement text
    * in, touched buckets out. */
  def deleteCatalogTable(spark: SparkSession, sqlText: String): Seq[Long] = {
    val d = parseDml(sqlText, isUpdate = false)
    run(spark, d, isUpdate = false, tableLocation(spark, d.table))
  }

  /** `UPDATE <catalog graft table> SET … [WHERE …]`. */
  def updateCatalogTable(spark: SparkSession, sqlText: String): Seq[Long] = {
    val d = parseDml(sqlText, isUpdate = true)
    run(spark, d, isUpdate = true, tableLocation(spark, d.table))
  }

  /** Structural validation for the parser hook (parse time — no
    * catalog access). */
  def validateDelete(sqlText: String): Unit = { parseDml(sqlText, isUpdate = false); () }
  def validateUpdate(sqlText: String): Unit = { parseDml(sqlText, isUpdate = true); () }

  // ---------------------------------------------------------------
  // Run-time target probes for the parser commands' non-graft
  // fallback ([[graft.plans.GraftSqlParser]]): a structurally valid
  // statement whose target turns out NOT to be a graft table (a
  // Delta/Iceberg row-level table when extensions coexist, a native
  // v2 table Spark's own ALTER handles) must execute the DELEGATE's
  // plan instead of dying in tableLocation/manifestOrFail.
  // ---------------------------------------------------------------

  /** Statement-kind target names, parse-only (no catalog). */
  def dmlTargetName(sqlText: String, isUpdate: Boolean): String =
    parseDml(sqlText, isUpdate).table
  def alterTargetName(sqlText: String): String = parseAlter(sqlText)._1
  def maintTargetName(sqlText: String, verb: String): String =
    parseMaint(sqlText, verb)._1

  /** The catalog location `name` resolves to, if it resolves to one
    * at all (None for temp views / unresolvable names — those keep
    * the graft path's specific error). */
  def resolvedLocation(spark: SparkSession, name: String): Option[String] =
    scala.util.Try(tableLocation(spark, name)).toOption

  /** Does `dir` hold a committed graft manifest? */
  def hasGraftManifest(spark: SparkSession, dir: String): Boolean =
    scala.util.Try(PartitionedUpsert.currentManifest(spark, dir))
      .toOption.flatten.nonEmpty

  // ---------------------------------------------------------------
  // Oracled fixture — the full SQL DML lifecycle under the hash gate
  // ---------------------------------------------------------------

  /** INSERT INTO / UPDATE / DELETE statement lifecycle certified
    * cross-engine: an upsert table is initialized from customer
    * (cents grid) and registered as a graft catalog table, then THREE
    * literal SQL statements run through the injected parser —
    *   1. `INSERT INTO … SELECT` ghost rows (every 97th orders
    *      custkey remapped +1e8, revenue as balance, seg 'NEW'),
    *   2. `UPDATE … SET bal_cents = bal_cents + 12345 WHERE
    *      seg = 'BUILDING'`,
    *   3. `DELETE FROM … WHERE bal_cents < 0` —
    * and the RESULT is the post-lifecycle table read back through
    * plain SQL. DuckDB replays the three statements algebraically
    * (UNION ALL the ghosts, CASE the update, WHERE NOT the delete),
    * so the hash certifies parser, lowering, write path, and upsert
    * merge semantics in one key. Fixture prepared ONCE per (session,
    * sf) and rolled back to its pristine v1 per rep by a
    * metadata-only RESTORE ([[LifecycleFixture]] — the r16 verdict's
    * shared-fixture discipline: warm reps measure the lifecycle
    * statements, not a rebuild), and LIFECYCLE-SLIM (the r15
    * verdict's #1 ask — this key was 10% of the whole bench): 4
    * buckets carry the exact same semantics as 16 at a quarter of
    * the per-statement file fan-out, the snapshot is coalesced so
    * init stages one file per bucket, and the catalog table is
    * created ONCE per (session, path) — re-running the key re-inits
    * the SAME location, so the DROP/CREATE metastore round-trip per
    * rep bought nothing. The name carries a path hash so sf0.01
    * (Verify) and sf0.1 (Bench) runs in one session cannot
    * cross-wire locations. Oracle hash identical by construction. */
  def qCdcDmlSql(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = graft.ops.relational.Scans.fixtureDir(dir, "dml_sql")
    // shared-pristine-fixture discipline (r16 verdict #3): init once
    // per (session, sf), roll back to v1 per rep — metadata-only
    LifecycleFixture.pristine(spark, path, "c_custkey", nBuckets = 4) {
      Tables.table(spark, dir, "customer").select(
        $"c_custkey",
        round($"c_acctbal" * 100.0, 0).cast("long").as("bal_cents"),
        $"c_mktsegment".as("seg")).coalesce(1)
    }
    val tbl = s"graft_dml_sql_t_${math.abs(path.hashCode).toString}"
    if (!spark.catalog.tableExists(tbl))
      spark.sql(s"CREATE TABLE $tbl USING graft LOCATION '$path'")
    Tables.table(spark, dir, "orders")
      .filter($"o_custkey" % 97 === 0)
      .groupBy($"o_custkey")
      .agg(sum(round($"o_totalprice" * 100.0, 0).cast("long")).as("bal_cents"))
      .select(($"o_custkey" + 100000000L).as("c_custkey"),
        $"bal_cents", lit("NEW").as("seg"))
      .createOrReplaceTempView("graft_dml_sql_ins")
    spark.sql(s"INSERT INTO $tbl SELECT * FROM graft_dml_sql_ins")
    spark.sql(
      s"UPDATE $tbl SET bal_cents = bal_cents + 12345 WHERE seg = 'BUILDING'")
    spark.sql(s"DELETE FROM $tbl WHERE bal_cents < 0")
    spark.sql(
      s"SELECT c_custkey, bal_cents, seg FROM $tbl ORDER BY c_custkey")
  }

  /** DDL + DML lifecycle certified cross-engine — the ADD COLUMN key
    * (r15 verdict's missing-#1): an upsert table is initialized from
    * customer (cents grid) and registered as a graft catalog table,
    * then THREE literal SQL statements run through the injected
    * parser —
    *   1. `ALTER TABLE … ADD COLUMN bonus_cents BIGINT` — the
    *      metadata-only evolve: no data file moves, pre-add rows read
    *      the column as null,
    *   2. `UPDATE … SET bonus_cents = bal_cents * 2 WHERE seg =
    *      'AUTOMOBILE'` — a backfill UPDATE against the evolved
    *      schema (pure integer arithmetic: same result grid in both
    *      engines),
    *   3. the read-back SELECT projecting the evolved schema.
    * DuckDB replays algebraically (CASE the backfill, NULL
    * elsewhere), so the hash certifies the ALTER grammar, the
    * metadata-only manifest swap, null-backfill-on-read for pre-add
    * files, and UPDATE lowering over an evolved table in one key. */
  def qCdcDdlSql(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = graft.ops.relational.Scans.fixtureDir(dir, "ddl_sql")
    // pristine-restore fixture discipline — see qCdcDmlSql; restore
    // rolls back SCHEMA too (the ALTER re-runs against v1's shape)
    LifecycleFixture.pristine(spark, path, "c_custkey", nBuckets = 4) {
      Tables.table(spark, dir, "customer").select(
        $"c_custkey",
        round($"c_acctbal" * 100.0, 0).cast("long").as("bal_cents"),
        $"c_mktsegment".as("seg")).coalesce(1)
    }
    val tbl = s"graft_ddl_sql_t_${math.abs(path.hashCode).toString}"
    if (!spark.catalog.tableExists(tbl))
      spark.sql(s"CREATE TABLE $tbl USING graft LOCATION '$path'")
    spark.sql(s"ALTER TABLE $tbl ADD COLUMN bonus_cents BIGINT")
    spark.sql(
      s"UPDATE $tbl SET bonus_cents = bal_cents * 2 WHERE seg = 'AUTOMOBILE'")
    spark.sql(
      s"SELECT c_custkey, bal_cents, seg, bonus_cents FROM $tbl " +
        "ORDER BY c_custkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cdc_dml_sql" -> (qCdcDmlSql _),
    "q_cdc_ddl_sql" -> (qCdcDdlSql _)
  )

  val oracle: Map[String, String] = Map(
    // the three statements replayed algebraically over the same
    // parquet: UNION ALL the inserted ghosts, CASE the update,
    // WHERE-out the delete
    "q_cdc_dml_sql" ->
      """WITH ghosts AS (
        |  SELECT o_custkey + 100000000 AS c_custkey,
        |         CAST(SUM(CAST(ROUND(o_totalprice*100,0) AS BIGINT)) AS BIGINT)
        |           AS bal_cents,
        |         'NEW' AS seg
        |  FROM orders WHERE o_custkey % 97 = 0 GROUP BY o_custkey),
        |base AS (
        |  SELECT c_custkey,
        |         CAST(ROUND(c_acctbal*100,0) AS BIGINT) AS bal_cents,
        |         c_mktsegment AS seg
        |  FROM customer
        |  UNION ALL SELECT c_custkey, bal_cents, seg FROM ghosts),
        |updated AS (
        |  SELECT c_custkey,
        |         CASE WHEN seg = 'BUILDING' THEN bal_cents + 12345
        |              ELSE bal_cents END AS bal_cents,
        |         seg
        |  FROM base)
        |SELECT c_custkey, bal_cents, seg
        |FROM updated
        |WHERE bal_cents >= 0
        |ORDER BY c_custkey""".stripMargin,
    // the ALTER+backfill lifecycle replayed algebraically: the added
    // column is the CASE'd backfill, NULL (typed BIGINT) elsewhere
    "q_cdc_ddl_sql" ->
      """SELECT c_custkey,
        |       CAST(ROUND(c_acctbal*100,0) AS BIGINT) AS bal_cents,
        |       c_mktsegment AS seg,
        |       CASE WHEN c_mktsegment = 'AUTOMOBILE'
        |            THEN CAST(ROUND(c_acctbal*100,0) AS BIGINT) * 2
        |            ELSE CAST(NULL AS BIGINT) END AS bonus_cents
        |FROM customer
        |ORDER BY c_custkey""".stripMargin
  )

  // ---------------------------------------------------------------
  // Maintenance statements — OPTIMIZE / VACUUM (the Delta idiom)
  // ---------------------------------------------------------------

  /** `OPTIMIZE <table> [MAXFILES n]` — compact append-fragmented
    * buckets down to ≤ n files each ([[PartitionedUpsert
    * .compactFiles]]; only fragmented buckets rewrite, a no-op burns
    * no version). `VACUUM <table> [KEEP n] [RETAIN m [HOURS|MINUTES|
    * SECONDS|MS]]` — reclaim unreachable versions/staging, keeping
    * the newest n manifests and anything younger than the retention
    * window. The unit keyword matters: Delta users type `RETAIN 168
    * HOURS`, and a bare number silently meaning milliseconds would
    * turn that into a 168 ms window — aggressive vacuum by typo. A
    * unit-less `RETAIN m` stays milliseconds (documented back-compat
    * reading; RETAIN 0 = trim everything but the KEEP set — the
    * Delta `RETAIN 0 HOURS` test idiom). Both parse from the shared
    * token stream and resolve the table like every DML statement
    * here. */
  private def parseMaint(sql: String, verb: String)
      : (String, Option[Int], Option[Long], Seq[String], Boolean) = {
    val toks = tokenize(sql)
    var i = 0
    def cur = if (i < toks.length) toks(i)
              else fail(sql, sql.length, "unexpected end of statement")
    if (!(cur.kind == IDENT && cur.upper == verb)) fail(sql, 0, s"expected $verb")
    i += 1
    if (cur.kind != IDENT && cur.kind != MergeSql.STR)
      fail(sql, cur.start, "expected a table name")
    val parts = Vector.newBuilder[String]
    parts += cur.raw; i += 1
    while (i < toks.length && cur.kind == PUNCT && cur.raw == "." &&
           i + 1 < toks.length) { i += 1; parts += cur.raw; i += 1 }
    def num(): Long = {
      if (cur.kind != MergeSql.NUM) fail(sql, cur.start, "expected a number")
      val v = cur.raw.toLong; i += 1; v
    }
    var n: Option[Int] = None
    var retain: Option[Long] = None
    var zorder: Seq[String] = Seq.empty
    var dryRun = false
    val unitMs = Map("HOURS" -> 3600000L, "MINUTES" -> 60000L,
      "SECONDS" -> 1000L, "MS" -> 1L)
    // keywords are PER-VERB: a shared set silently misread cross-verb
    // statements (`VACUUM t MAXFILES 3` applied as KEEP 3; `OPTIMIZE t
    // DRY RUN` parsed the flag and then compacted FOR REAL — the exact
    // opposite of a preview). A wrong-verb keyword now falls out of
    // the loop into the trailing-token error, loudly.
    val verbKeywords =
      if (verb == "OPTIMIZE") Set("MAXFILES", "ZORDER")
      else Set("KEEP", "RETAIN", "DRY")
    while (i < toks.length && cur.kind == IDENT &&
           verbKeywords.contains(cur.upper)) {
      val kw = cur.upper; i += 1
      kw match {
        case "DRY" =>
          // `DRY RUN` — Delta's vacuum preview clause verbatim
          if (!(i < toks.length && cur.kind == IDENT && cur.upper == "RUN"))
            fail(sql, if (i < toks.length) cur.start else sql.length,
              "expected RUN after DRY")
          i += 1
          dryRun = true
        case "RETAIN" =>
          val v = num()
          val mult =
            if (i < toks.length && cur.kind == IDENT &&
                unitMs.contains(cur.upper)) {
              val u = cur.upper; i += 1; unitMs(u)
            } else 1L // unit-less = milliseconds (back-compat, documented)
          retain = Some(v * mult)
        case "ZORDER" =>
          // ZORDER BY (c1[, c2, …]) — the Delta OPTIMIZE clause
          // verbatim; arity is validated engine-side (n·bits ≤ 63)
          if (!(i < toks.length && cur.kind == IDENT && cur.upper == "BY"))
            fail(sql, if (i < toks.length) cur.start else sql.length,
              "expected BY after ZORDER")
          i += 1
          if (!(i < toks.length && cur.kind == PUNCT && cur.raw == "("))
            fail(sql, if (i < toks.length) cur.start else sql.length,
              "expected '(' after ZORDER BY")
          i += 1
          val out = Vector.newBuilder[String]
          var more = true
          while (more) {
            if (i >= toks.length ||
                (cur.kind != IDENT && cur.kind != MergeSql.STR))
              fail(sql, if (i < toks.length) cur.start else sql.length,
                "expected a column name in ZORDER BY")
            out += cur.raw.stripPrefix("`").stripSuffix("`"); i += 1
            if (i < toks.length && cur.kind == PUNCT && cur.raw == ",") i += 1
            else more = false
          }
          if (!(i < toks.length && cur.kind == PUNCT && cur.raw == ")"))
            fail(sql, if (i < toks.length) cur.start else sql.length,
              "expected ')' closing ZORDER BY")
          i += 1
          zorder = out.result()
        case _        => n = Some(num().toInt)
      }
    }
    if (i < toks.length)
      fail(sql, cur.start, s"unexpected trailing token '${cur.raw}'")
    (parts.result().mkString("."), n, retain, zorder, dryRun)
  }

  /** `ANALYZE TABLE <t> COMPUTE STATISTICS FOR COLUMNS c1[, c2…]` —
    * Spark's own column-statistics statement shape, re-aimed at the
    * manifest's per-bucket skipping stats for graft tables
    * ([[PartitionedUpsert.analyzeColumns]]: one agg scan, metadata-
    * only commit — the declaration path that does not cost an
    * O(table) ZORDER rewrite). Non-graft targets fall back to the
    * delegate's plan (Spark's catalog CBO stats) at run time, the
    * GraftSqlFallback contract; Spark-only variants this grammar does
    * not accept (`FOR ALL COLUMNS`, PARTITION clauses, bare `COMPUTE
    * STATISTICS`) fail our parse and delegate at PARSE time. Parens
    * around the column list are accepted and must balance. */
  private def parseAnalyze(sql: String): (String, Seq[String]) = {
    val toks = tokenize(sql)
    var i = 0
    def cur = if (i < toks.length) toks(i)
              else fail(sql, sql.length, "unexpected end of statement")
    def expectKw(kw: String): Unit = {
      if (!(i < toks.length && cur.kind == IDENT && cur.upper == kw))
        fail(sql, if (i < toks.length) cur.start else sql.length,
          s"expected $kw")
      i += 1
    }
    expectKw("ANALYZE"); expectKw("TABLE")
    if (cur.kind != IDENT && cur.kind != MergeSql.STR)
      fail(sql, cur.start, "expected a table name")
    val parts = Vector.newBuilder[String]
    parts += cur.raw; i += 1
    while (i < toks.length && cur.kind == PUNCT && cur.raw == "." &&
           i + 1 < toks.length) { i += 1; parts += cur.raw; i += 1 }
    expectKw("COMPUTE"); expectKw("STATISTICS"); expectKw("FOR")
    expectKw("COLUMNS")
    val paren = i < toks.length && cur.kind == PUNCT && cur.raw == "("
    if (paren) i += 1
    val out = Vector.newBuilder[String]
    var more = true
    while (more) {
      if (i >= toks.length || (cur.kind != IDENT && cur.kind != MergeSql.STR))
        fail(sql, if (i < toks.length) cur.start else sql.length,
          "expected a column name in FOR COLUMNS")
      out += cur.raw.stripPrefix("`").stripSuffix("`"); i += 1
      if (i < toks.length && cur.kind == PUNCT && cur.raw == ",") i += 1
      else more = false
    }
    if (paren) {
      if (!(i < toks.length && cur.kind == PUNCT && cur.raw == ")"))
        fail(sql, if (i < toks.length) cur.start else sql.length,
          "expected ')' closing FOR COLUMNS")
      i += 1
    }
    if (i < toks.length)
      fail(sql, cur.start, s"unexpected trailing token '${cur.raw}'")
    (parts.result().mkString("."), out.result())
  }

  def validateAnalyze(sqlText: String): Unit = { parseAnalyze(sqlText); () }
  def analyzeTargetName(sqlText: String): String = parseAnalyze(sqlText)._1

  def analyzeCatalogTable(spark: SparkSession, sqlText: String)
      : Seq[(String, Long, Long, Long)] = {
    val (name, cols) = parseAnalyze(sqlText)
    PartitionedUpsert.analyzeColumns(spark, tableLocation(spark, name), cols)
  }

  def optimizeCatalogTable(spark: SparkSession, sqlText: String): Seq[Long] = {
    val (name, n, _, zorder, _) = parseMaint(sqlText, "OPTIMIZE")
    val dir = tableLocation(spark, name)
    if (zorder.nonEmpty) {
      require(n.isEmpty,
        "OPTIMIZE takes MAXFILES or ZORDER BY, not both — a z-order " +
          "rewrite re-clusters every bucket regardless of fragmentation")
      PartitionedUpsert.optimizeZorder(spark, dir, zorder)
    } else
      PartitionedUpsert.compactFiles(spark, dir,
        maxFilesPerBucket = n.getOrElse(4))
  }

  def vacuumCatalogTable(spark: SparkSession, sqlText: String): Unit = {
    val (name, n, retain, _, _) = parseMaint(sqlText, "VACUUM")
    PartitionedUpsert.vacuum(spark, tableLocation(spark, name),
      keepManifests = n.getOrElse(2),
      minStagingAgeMs = retain.getOrElse(3600000L))
  }

  /** ONE timestamp-string reading shared by every face (SQL RESTORE /
    * SHALLOW CLONE, DSv2 `timestampAsOf`): epoch millis,
    * `yyyy-MM-dd HH:mm:ss[.f]` (JVM zone via Timestamp.valueOf — the
    * Delta string shape), or an ISO-8601 instant. Three sites once
    * re-implemented this chain; a drift (e.g. one honoring a
    * different zone) would resolve the SAME string to DIFFERENT
    * versions per face. */
  def tsMillis(raw: String): Option[Long] =
    scala.util.Try(raw.toLong).toOption
      .orElse(scala.util.Try(java.sql.Timestamp.valueOf(raw).getTime).toOption)
      .orElse(scala.util.Try(java.time.Instant.parse(raw).toEpochMilli).toOption)

  /** Is this VACUUM statement a DRY RUN? (parse-only; the command's
    * output schema branches on it). */
  def vacuumIsDryRun(sqlText: String): Boolean =
    parseMaint(sqlText, "VACUUM")._5

  /** `VACUUM t … DRY RUN` → the paths [[PartitionedUpsert.vacuum]]
    * WOULD reclaim, deleting nothing (one computation shared with the
    * real vacuum, so they can never disagree). */
  def vacuumDryRunCatalogTable(spark: SparkSession,
                               sqlText: String): Seq[String] = {
    val (name, n, retain, _, _) = parseMaint(sqlText, "VACUUM")
    PartitionedUpsert.vacuumPlan(spark, tableLocation(spark, name),
      keepManifests = n.getOrElse(2),
      minStagingAgeMs = retain.getOrElse(3600000L))
  }

  def validateOptimize(sqlText: String): Unit = { parseMaint(sqlText, "OPTIMIZE"); () }
  def validateVacuum(sqlText: String): Unit = { parseMaint(sqlText, "VACUUM"); () }

  /** `TRUNCATE TABLE <name>` → [[PartitionedUpsert.truncate]]: ONE
    * metadata-only commit referencing no buckets — not the
    * unconditional-DELETE idiom, which scans the table to materialize
    * a full-table delete frame at truncate time (that scaladoc owns
    * the CDF-on-demand contract). Spark's own TRUNCATE works only on
    * v1 session-catalog tables, so intercepting the statement for
    * graft targets costs nothing that worked before; non-graft
    * targets fall back to the delegate at run time. */
  private def parseTruncate(sql: String): String = {
    val toks = tokenize(sql)
    var i = 0
    def cur = if (i < toks.length) toks(i)
              else fail(sql, sql.length, "unexpected end of statement")
    def expectKw(k: String): Unit =
      if (cur.kind == IDENT && cur.upper == k) i += 1
      else fail(sql, cur.start, s"expected $k")
    expectKw("TRUNCATE"); expectKw("TABLE")
    if (cur.kind != IDENT && cur.kind != MergeSql.STR)
      fail(sql, cur.start, "expected a table name")
    val parts = Vector.newBuilder[String]
    parts += cur.raw; i += 1
    while (i < toks.length && cur.kind == PUNCT && cur.raw == "." &&
           i + 1 < toks.length) { i += 1; parts += cur.raw; i += 1 }
    if (i < toks.length)
      fail(sql, cur.start, s"unexpected trailing token '${cur.raw}'")
    parts.result().mkString(".")
  }

  def validateTruncate(sqlText: String): Unit = { parseTruncate(sqlText); () }
  def truncateTargetName(sqlText: String): String = parseTruncate(sqlText)

  def truncateCatalogTable(spark: SparkSession, sqlText: String): Unit =
    PartitionedUpsert.truncate(spark,
      tableLocation(spark, parseTruncate(sqlText)))

  /** `REORG TABLE <name> APPLY (PURGE)` → [[PartitionedUpsert
    * .purgeTombstones]] — Delta's exact purge statement: rewrite the
    * merge-on-read-tombstoned buckets with their deletes applied and
    * retire the sidecars (that scaladoc owns the cost contract:
    * O(tombstoned buckets), read-identical before/after, no-debt =
    * no version burned). Spark has no REORG statement, so the
    * intercept costs nothing that worked before. */
  private def parseReorg(sql: String): String = {
    val toks = tokenize(sql)
    var i = 0
    def cur = if (i < toks.length) toks(i)
              else fail(sql, sql.length, "unexpected end of statement")
    def expectKw(k: String): Unit =
      if (cur.kind == IDENT && cur.upper == k) i += 1
      else fail(sql, cur.start, s"expected $k")
    expectKw("REORG"); expectKw("TABLE")
    if (cur.kind != IDENT && cur.kind != MergeSql.STR)
      fail(sql, cur.start, "expected a table name")
    val parts = Vector.newBuilder[String]
    parts += cur.raw; i += 1
    while (i < toks.length && cur.kind == PUNCT && cur.raw == "." &&
           i + 1 < toks.length) { i += 1; parts += cur.raw; i += 1 }
    expectKw("APPLY")
    if (!(cur.kind == PUNCT && cur.raw == "("))
      fail(sql, cur.start, "expected '(' after APPLY")
    i += 1
    expectKw("PURGE")
    if (!(cur.kind == PUNCT && cur.raw == ")"))
      fail(sql, cur.start, "expected ')' closing APPLY (PURGE)")
    i += 1
    if (i < toks.length)
      fail(sql, cur.start, s"unexpected trailing token '${cur.raw}'")
    parts.result().mkString(".")
  }

  def validateReorg(sqlText: String): Unit = { parseReorg(sqlText); () }
  def reorgTargetName(sqlText: String): String = parseReorg(sqlText)

  /** `CREATE TABLE <dst> SHALLOW CLONE <src> [VERSION AS OF n |
    * TIMESTAMP AS OF <millis|'ts'>] [LOCATION '<path>']` →
    * [[PartitionedUpsert.clone]] (that scaladoc owns the contract:
    * metadata-only fork, copy-on-write divergence, vacuum isolation)
    * + a catalog registration of the clone as a graft table. The
    * destination is the explicit LOCATION, or (r18) the graft
    * CATALOG'S OWN convention when dst is named under one (`CREATE
    * TABLE g.ns.t2 SHALLOW CLONE g.ns.t` — the clone lives at
    * `<warehouse>/ns/t2` and resolves by name with zero registration);
    * a dst under neither keeps the loud LOCATION requirement —
    * inventing a path behind the user's back is how clones get lost.
    * Only statements containing SHALLOW CLONE are intercepted at all
    * (every ordinary CREATE goes straight to Spark). */
  private def parseShallowClone(sql: String)
      : (String, String, Option[Either[Long, Long]], Option[String]) = {
    val toks = tokenize(sql)
    var i = 0
    def cur = if (i < toks.length) toks(i)
              else fail(sql, sql.length, "unexpected end of statement")
    def isKw(k: String) = i < toks.length && cur.kind == IDENT && cur.upper == k
    def expectKw(k: String): Unit =
      if (isKw(k)) i += 1 else fail(sql, cur.start, s"expected $k")
    def name(): String = {
      if (cur.kind != IDENT && cur.kind != MergeSql.STR)
        fail(sql, cur.start, "expected a table name")
      val parts = Vector.newBuilder[String]
      parts += cur.raw; i += 1
      while (i < toks.length && cur.kind == PUNCT && cur.raw == "." &&
             i + 1 < toks.length) { i += 1; parts += cur.raw; i += 1 }
      parts.result().mkString(".")
    }
    expectKw("CREATE"); expectKw("TABLE")
    val dst = name()
    expectKw("SHALLOW"); expectKw("CLONE")
    val src = name()
    var pin: Option[Either[Long, Long]] = None
    if (isKw("VERSION") || isKw("TIMESTAMP")) {
      val byVersion = cur.upper == "VERSION"
      i += 1; expectKw("AS"); expectKw("OF")
      val value: Long =
        if (cur.kind == MergeSql.NUM) { val v = cur.raw.toLong; i += 1; v }
        else if (!byVersion && cur.kind == MergeSql.STR) {
          val raw = cur.raw.stripPrefix("'").stripSuffix("'")
            .stripPrefix("\"").stripSuffix("\""); i += 1
          tsMillis(raw).getOrElse(fail(sql, toks(i - 1).start,
            s"timestamp '$raw' is neither 'yyyy-MM-dd HH:mm:ss[.f]' " +
              "nor an ISO-8601 instant"))
        } else fail(sql, cur.start,
          if (byVersion) "expected a version number"
          else "expected epoch millis or a timestamp string")
      pin = Some(if (byVersion) Left(value) else Right(value))
    }
    val loc =
      if (isKw("LOCATION")) {
        i += 1
        if (cur.kind != MergeSql.STR)
          fail(sql, cur.start, "expected a quoted path after LOCATION")
        val p = cur.raw.stripPrefix("'").stripSuffix("'")
          .stripPrefix("\"").stripSuffix("\""); i += 1
        Some(p)
      } else None
    if (i < toks.length)
      fail(sql, cur.start, s"unexpected trailing token '${cur.raw}'")
    (dst, src, pin, loc)
  }

  def validateShallowClone(sqlText: String): Unit = {
    parseShallowClone(sqlText); ()
  }
  def shallowCloneSourceName(sqlText: String): String =
    parseShallowClone(sqlText)._2

  def shallowCloneCatalogTable(spark: SparkSession, sqlText: String): Unit = {
    val (dst, src, pin, loc) = parseShallowClone(sqlText)
    // destination resolution, in order (r18): an explicit LOCATION
    // always wins; otherwise a dst named under a registered GRAFT
    // catalog resolves to the catalog's OWN layout convention
    // (<warehouse>/ns/t — not an invented path: it is where every
    // table of that catalog lives, so the clone is immediately
    // addressable by its name with no registration step). A dst under
    // no graft catalog keeps the loud LOCATION requirement.
    val (dstLoc, catalogAddressed) = loc match {
      case Some(p) => (p, false)
      case None => graftCatalogDir(spark, dst).map((_, true)).getOrElse(
        fail(sqlText, 0,
          "SHALLOW CLONE needs a destination: name the clone under a " +
            "graft catalog (CREATE TABLE g.ns.t2 SHALLOW CLONE …) or " +
            "pass LOCATION '<path>' — inventing a path behind the " +
            "user's back is how clones get lost"))
    }
    val srcDir = tableLocation(spark, src)
    PartitionedUpsert.clone(spark, srcDir, dstLoc,
      versionAsOf = pin.flatMap(_.left.toOption),
      timestampAsOf = pin.flatMap(_.toOption))
    // a catalog-addressed clone IS its directory's manifest chain —
    // it resolves by name with zero registration; a path-addressed
    // clone registers in the session catalog so `dst` keeps meaning
    // something. Registration re-enters the injected parser, misses
    // the SHALLOW CLONE gate, and goes straight to Spark — no
    // recursion.
    if (!catalogAddressed)
      spark.sql(s"CREATE TABLE $dst USING graft LOCATION '$dstLoc'"): Unit
    ()
  }

  /** Resolve a multi-part name whose FIRST part is a registered graft
    * catalog to that catalog's conventional directory —
    * `<warehouse>/<ns…>/<table>` — or None when the name is not
    * graft-catalog-addressed. Mirrors [[graft.sources.GraftCatalog]]'s
    * layout rule (table IS directory) including its path-traversal
    * segment guard. */
  private def graftCatalogDir(spark: SparkSession,
                              name: String): Option[String] = {
    // Spark's own multipart parser, NOT a raw '.' split (r18 ADVICE):
    // a backtick-quoted segment may itself contain dots — g.`a.b`
    // split raw resolved to <warehouse>/a/b, a directory loadTable
    // would never look at, silently losing the clone
    val parts =
      try spark.sessionState.sqlParser.parseMultipartIdentifier(name)
      catch { case _: org.apache.spark.sql.catalyst.parser
        .ParseException => return None }
    if (parts.size < 2) return None
    val cat = parts.head
    val impl = spark.conf.getOption(s"spark.sql.catalog.$cat")
    if (!impl.contains(classOf[graft.sources.GraftCatalog].getName))
      return None
    spark.conf.getOption(s"spark.sql.catalog.$cat.warehouse").map { wh =>
      parts.tail.foreach { s =>
        require(s.nonEmpty && !s.contains("/") && !s.contains("\\") &&
          s != "." && s != "..", s"invalid catalog name segment '$s'")
      }
      (wh +: parts.tail).mkString("/")
    }
  }

  def reorgCatalogTable(spark: SparkSession, sqlText: String): Seq[Long] =
    PartitionedUpsert.purgeTombstones(spark,
      tableLocation(spark, parseReorg(sqlText)))

  /** `RESTORE TABLE <name> TO VERSION AS OF <n>` / `TO TIMESTAMP AS
    * OF <millis | 'timestamp string'>` → [[PartitionedUpsert
    * .restoreVersion]] — the Delta RESTORE statement as a
    * metadata-only manifest republish (that scaladoc owns the
    * contract). Timestamp strings resolve through the same floor rule
    * as DSv2 `timestampAsOf`. */
  private def parseRestore(sql: String): (String, Either[Long, Long]) = {
    val toks = tokenize(sql)
    var i = 0
    def cur = if (i < toks.length) toks(i)
              else fail(sql, sql.length, "unexpected end of statement")
    def expectKw(k: String): Unit =
      if (cur.kind == IDENT && cur.upper == k) i += 1
      else fail(sql, cur.start, s"expected $k")
    expectKw("RESTORE"); expectKw("TABLE")
    if (cur.kind != IDENT && cur.kind != MergeSql.STR)
      fail(sql, cur.start, "expected a table name")
    val parts = Vector.newBuilder[String]
    parts += cur.raw; i += 1
    while (i < toks.length && cur.kind == PUNCT && cur.raw == "." &&
           i + 1 < toks.length) { i += 1; parts += cur.raw; i += 1 }
    expectKw("TO")
    val byVersion =
      if (cur.kind == IDENT && cur.upper == "VERSION") true
      else if (cur.kind == IDENT && cur.upper == "TIMESTAMP") false
      else fail(sql, cur.start, "expected VERSION or TIMESTAMP")
    i += 1; expectKw("AS"); expectKw("OF")
    val value: Long =
      if (cur.kind == MergeSql.NUM) { val v = cur.raw.toLong; i += 1; v }
      else if (!byVersion && cur.kind == MergeSql.STR) {
        val raw = cur.raw.stripPrefix("'").stripSuffix("'")
          .stripPrefix("\"").stripSuffix("\""); i += 1
        tsMillis(raw).getOrElse(fail(sql, toks(i - 1).start,
          s"timestamp '$raw' is neither 'yyyy-MM-dd HH:mm:ss[.f]' " +
            "nor an ISO-8601 instant"))
      } else fail(sql, cur.start,
        if (byVersion) "expected a version number"
        else "expected epoch millis or a timestamp string")
    if (i < toks.length)
      fail(sql, cur.start, s"unexpected trailing token '${cur.raw}'")
    (parts.result().mkString("."),
      if (byVersion) Left(value) else Right(value))
  }

  def validateRestore(sqlText: String): Unit = { parseRestore(sqlText); () }
  def restoreTargetName(sqlText: String): String = parseRestore(sqlText)._1

  def restoreCatalogTable(spark: SparkSession, sqlText: String): Unit = {
    val (name, pin) = parseRestore(sqlText)
    val dir = tableLocation(spark, name)
    val version = pin match {
      case Left(v) => v
      case Right(ts) => PartitionedUpsert.versionAtTimestamp(spark, dir, ts)
    }
    PartitionedUpsert.restoreVersion(spark, dir, version)
  }

  /** `ALTER TABLE <t> RENAME COLUMN a TO b` / `ALTER COLUMN a TYPE
    * <ddl-type>` / `DROP COLUMN a` / `ADD COLUMN c <ddl-type>` /
    * `ADD COLUMNS (a <type>, b <type>)` → [[PartitionedUpsert
    * .evolveSchema]] (atomic manifest swap). Cost contract, stated
    * honestly (evolveSchema's scaladoc owns the mechanics): ADDs are
    * metadata-speed (manifest swap over the same files, missing→null
    * on read); RENAME / WIDEN / DROP each rewrite the table —
    * O(table), because the read path resolves parquet columns by name
    * and physical types can't up-cast in place. ONLY these shapes are
    * claimed: every other ALTER flavor (SET TBLPROPERTIES, ALTER
    * VIEW, …) fails structural validation and falls back to Spark's
    * parser through the standard 3-stage contract. Intercepting ADD
    * COLUMN here matters beyond convenience: Spark's own ALTER on a
    * graft catalog table would evolve the METASTORE schema while the
    * manifest kept the old one — a silent desync this grammar
    * prevents by owning the statement. Renaming the key column is
    * legal — the post-change key name is tracked exactly the way
    * evolveSchema requires. */
  /** What an intercepted ALTER statement lowers to: schema evolution
    * shapes, or CHECK-constraint bookkeeping (`ADD CONSTRAINT nm
    * CHECK (expr)` / `DROP CONSTRAINT nm` — the Delta constraint
    * statements, metadata commits on [[PartitionedUpsert]]). */
  sealed trait AlterKind
  final case class AlterSchema(changes: Seq[Cdc.SchemaChange]) extends AlterKind
  final case class AlterAddCheck(name: String, check: String) extends AlterKind
  final case class AlterDropCheck(name: String) extends AlterKind

  private def parseAlter(sql: String): (String, AlterKind) = {
    val toks = tokenize(sql)
    var i = 0
    def cur = if (i < toks.length) toks(i)
              else fail(sql, sql.length, "unexpected end of statement")
    def isKw(k: String) = i < toks.length && cur.kind == IDENT && cur.upper == k
    def expectKw(k: String): Unit =
      if (isKw(k)) i += 1 else fail(sql, cur.start, s"expected $k")
    def ident(): String = {
      if (cur.kind != IDENT && cur.kind != MergeSql.STR)
        fail(sql, cur.start, "expected an identifier")
      val v = cur.raw.stripPrefix("`").stripSuffix("`"); i += 1; v
    }
    // type text from the current token up to a depth-0 stop punct (or
    // end) — depth tracking keeps decimal(10,2)'s inner comma intact
    def typeText(stopPunct: Set[String]): String = {
      val from = i
      var depth = 0; var done = false
      while (!done && i < toks.length) {
        val t = toks(i)
        if (t.kind == PUNCT && t.raw == "(") { depth += 1; i += 1 }
        else if (t.kind == PUNCT && t.raw == ")") {
          if (depth == 0) done = true else { depth -= 1; i += 1 }
        }
        else if (depth == 0 && t.kind == PUNCT && stopPunct.contains(t.raw))
          done = true
        else i += 1
      }
      if (i == from) fail(sql, if (from < toks.length) toks(from).start
                               else sql.length, "expected a type")
      sql.substring(toks(from).start, toks(i - 1).end)
    }
    def parseType(text: String): org.apache.spark.sql.types.DataType =
      org.apache.spark.sql.types.DataType.fromDDL(text)
    expectKw("ALTER"); expectKw("TABLE")
    val parts = Vector.newBuilder[String]
    parts += cur.raw; i += 1
    while (i < toks.length && cur.kind == PUNCT && cur.raw == "." &&
           i + 1 < toks.length) { i += 1; parts += cur.raw; i += 1 }
    val name = parts.result().mkString(".")
    val changes: AlterKind =
      if (isKw("RENAME")) {
        i += 1; expectKw("COLUMN")
        val from = ident(); expectKw("TO"); val to = ident()
        AlterSchema(Seq(Cdc.RenameColumn(from, to)))
      } else if (isKw("ALTER")) {
        i += 1; expectKw("COLUMN")
        val c = ident(); expectKw("TYPE")
        if (i >= toks.length) fail(sql, sql.length, "expected a type")
        AlterSchema(Seq(Cdc.WidenColumn(c, parseType(typeText(Set.empty)))))
      } else if (isKw("DROP")) {
        i += 1
        if (isKw("CONSTRAINT")) { i += 1; AlterDropCheck(ident()) }
        else { expectKw("COLUMN"); AlterSchema(Seq(Cdc.DropColumn(ident()))) }
      } else if (isKw("ADD")) {
        i += 1
        if (isKw("CONSTRAINT")) {
          i += 1
          val nm = ident()
          expectKw("CHECK")
          if (!(i < toks.length && cur.kind == PUNCT && cur.raw == "("))
            fail(sql, if (i < toks.length) cur.start else sql.length,
              "expected '(' after CHECK")
          i += 1
          // depth-aware slice to the matching ')' — the expression
          // goes VERBATIM to Spark's expr() at enforcement time
          val ex = typeText(Set.empty)
          if (!(i < toks.length && cur.kind == PUNCT && cur.raw == ")"))
            fail(sql, if (i < toks.length) cur.start else sql.length,
              "expected ')' closing CHECK")
          i += 1
          // the verbatim slice carries the statement's own line breaks
          // (triple-quoted SQL is the normal authoring style) but the
          // manifest stores one line per constraint — collapse runs of
          // whitespace; the trade (a string LITERAL inside the check
          // whose significant whitespace collapses too) is stated
          AlterAddCheck(nm, ex.replaceAll("\\s+", " ").trim)
        } else if (isKw("COLUMNS")) {
          i += 1
          if (!(cur.kind == PUNCT && cur.raw == "("))
            fail(sql, cur.start, "expected '(' after ADD COLUMNS")
          i += 1
          val out = Vector.newBuilder[Cdc.SchemaChange]
          var more = true
          while (more) {
            val c = ident()
            out += Cdc.AddColumn(c, parseType(typeText(Set(","))))
            if (i < toks.length && cur.kind == PUNCT && cur.raw == ",") i += 1
            else more = false
          }
          if (!(i < toks.length && cur.kind == PUNCT && cur.raw == ")"))
            fail(sql, if (i < toks.length) cur.start else sql.length,
              "expected ')' closing ADD COLUMNS")
          i += 1
          AlterSchema(out.result())
        } else {
          expectKw("COLUMN")
          val c = ident()
          if (i >= toks.length) fail(sql, sql.length, "expected a type")
          AlterSchema(Seq(Cdc.AddColumn(c, parseType(typeText(Set.empty)))))
        }
      } else fail(sql, cur.start,
        "only RENAME COLUMN / ALTER COLUMN … TYPE / DROP COLUMN / " +
          "ADD COLUMN(S) / ADD CONSTRAINT … CHECK (…) / DROP CONSTRAINT " +
          "are graft DDL")
    if (i < toks.length)
      fail(sql, cur.start, s"unexpected trailing token '${cur.raw}'")
    (name, changes)
  }

  def validateAlter(sqlText: String): Unit = { parseAlter(sqlText); () }

  def alterCatalogTable(spark: SparkSession, sqlText: String): Unit = {
    val (name, kind) = parseAlter(sqlText)
    val dir = tableLocation(spark, name)
    kind match {
      case AlterSchema(changes) =>
        val m = PartitionedUpsert.manifestOrFail(spark, dir)
        val postKey = changes.foldLeft(m.keyCol) {
          case (k, Cdc.RenameColumn(from, to)) if from.equalsIgnoreCase(k) => to
          case (k, _) => k
        }
        PartitionedUpsert.evolveSchema(spark, dir, changes, postKey, m.nBuckets)
      case AlterAddCheck(nm, ex) =>
        PartitionedUpsert.addCheckConstraint(spark, dir, nm, ex)
      case AlterDropCheck(nm) =>
        PartitionedUpsert.dropCheckConstraint(spark, dir, nm)
    }
  }

  /** `DESCRIBE HISTORY <table>` → [[PartitionedUpsert.historyDf]]
    * (the audit frame; bounded — vacuum caps manifest count). */
  private def parseDescribeHistory(sql: String): String = {
    val toks = tokenize(sql)
    var i = 0
    def cur = if (i < toks.length) toks(i)
              else fail(sql, sql.length, "unexpected end of statement")
    def expectKw(k: String): Unit =
      if (cur.kind == IDENT && cur.upper == k) i += 1
      else fail(sql, cur.start, s"expected $k")
    expectKw("DESCRIBE"); expectKw("HISTORY")
    if (cur.kind != IDENT && cur.kind != MergeSql.STR)
      fail(sql, cur.start, "expected a table name")
    val parts = Vector.newBuilder[String]
    parts += cur.raw; i += 1
    while (i < toks.length && cur.kind == PUNCT && cur.raw == "." &&
           i + 1 < toks.length) { i += 1; parts += cur.raw; i += 1 }
    if (i < toks.length)
      fail(sql, cur.start, s"unexpected trailing token '${cur.raw}'")
    parts.result().mkString(".")
  }

  def validateDescribeHistory(sqlText: String): Unit = {
    parseDescribeHistory(sqlText); ()
  }
  def historyTargetName(sqlText: String): String =
    parseDescribeHistory(sqlText)
  def detailTargetName(sqlText: String): String =
    parseDescribeDetail(sqlText)

  def describeHistoryTable(spark: SparkSession, sqlText: String): DataFrame = {
    val dir = tableLocation(spark, parseDescribeHistory(sqlText))
    // loud probe (r16 ADVICE medium): a row-producing DESCRIBE on a
    // location with no manifest must raise the specific graft error,
    // never serve a silently EMPTY frame under graft's schema
    PartitionedUpsert.manifestOrFail(spark, dir): Unit
    PartitionedUpsert.historyDf(spark, dir)
  }

  /** `DESCRIBE DETAIL <table>` → [[PartitionedUpsert.detailDf]] (the
    * one-row current-state summary; same grammar shape as HISTORY). */
  private def parseDescribeDetail(sql: String): String = {
    val toks = tokenize(sql)
    var i = 0
    def cur = if (i < toks.length) toks(i)
              else fail(sql, sql.length, "unexpected end of statement")
    def expectKw(k: String): Unit =
      if (cur.kind == IDENT && cur.upper == k) i += 1
      else fail(sql, cur.start, s"expected $k")
    expectKw("DESCRIBE"); expectKw("DETAIL")
    if (cur.kind != IDENT && cur.kind != MergeSql.STR)
      fail(sql, cur.start, "expected a table name")
    val parts = Vector.newBuilder[String]
    parts += cur.raw; i += 1
    while (i < toks.length && cur.kind == PUNCT && cur.raw == "." &&
           i + 1 < toks.length) { i += 1; parts += cur.raw; i += 1 }
    if (i < toks.length)
      fail(sql, cur.start, s"unexpected trailing token '${cur.raw}'")
    parts.result().mkString(".")
  }

  def validateDescribeDetail(sqlText: String): Unit = {
    parseDescribeDetail(sqlText); ()
  }

  def describeDetailTable(spark: SparkSession, sqlText: String): DataFrame = {
    val dir = tableLocation(spark, parseDescribeDetail(sqlText))
    // same loud probe as describeHistoryTable (r16 ADVICE medium)
    PartitionedUpsert.manifestOrFail(spark, dir): Unit
    PartitionedUpsert.detailDf(spark, dir)
  }

  /** Direct-path variants against a table DIR (no catalog needed) —
    * the API twin for callers holding paths. */
  def deleteFromTable(spark: SparkSession, sqlText: String, dir: String): Seq[Long] = {
    val d = parseDml(sqlText, isUpdate = false)
    run(spark, d, isUpdate = false, dir)
  }
  def updateTable(spark: SparkSession, sqlText: String, dir: String): Seq[Long] = {
    val d = parseDml(sqlText, isUpdate = true)
    run(spark, d, isUpdate = true, dir)
  }
}
