package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, StagedTable, StagingTableCatalog, SupportsNamespaces, SupportsRead, SupportsWrite, Table, TableCatalog, TableChange, TableInfo}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.ops.cdc.{Cdc, PartitionedUpsert}

/** The graft TABLE CATALOG — the face that lets plain SQL manage
  * graft tables by NAME instead of by path (what Delta/Iceberg ship
  * as their catalog integration):
  *
  * {{{
  *   spark.sql.catalog.g           = graft.sources.GraftCatalog
  *   spark.sql.catalog.g.warehouse = /data/graft
  *
  *   CREATE NAMESPACE g.prod
  *   CREATE TABLE g.prod.users (id BIGINT, name STRING)
  *     USING graft PARTITIONED BY (bucket(8, id))
  *   CREATE TABLE g.prod.top USING graft
  *     TBLPROPERTIES ('key'='k','buckets'='4') AS SELECT …   -- CTAS
  *   INSERT INTO g.prod.users …        -- append-as-upsert
  *   SELECT * FROM g.prod.users VERSION AS OF 3   -- time travel
  *   MERGE INTO / UPDATE / DELETE / OPTIMIZE / VACUUM /
  *   DESCRIBE HISTORY g.prod.users     -- the injected-parser grammar
  *   ALTER TABLE g.prod.users ADD COLUMNS (x BIGINT)
  *   DROP TABLE g.prod.users / SHOW TABLES IN g.prod
  * }}}
  *
  * Layout is convention, not metadata: table `g.ns.t` lives at
  * `<warehouse>/ns/t` and a table IS its directory's manifest chain —
  * the catalog stores NOTHING of its own (no metastore, no sync
  * problem; `listTables` is one directory listing, existence is
  * "holds a committed manifest"). That makes every catalog operation
  * either a manifest read or the engine's own atomic commit:
  *
  *  - CREATE TABLE initializes an EMPTY manifest v1 with the declared
  *    schema. The table KEY comes from `PARTITIONED BY (bucket(n,
  *    col))` — the honest DDL for a key-bucketed layout — or from
  *    TBLPROPERTIES/OPTIONS `key` (+ optional `buckets`, default 16).
  *    CTAS flows through the same createTable and then Spark writes
  *    the query through the standard append-as-upsert INSERT path
  *    (duplicate keys in the query error — a keyed table's contract).
  *  - loadTable pins the current manifest (snapshot isolation, the
  *    provider's rule); the version/timestamp overloads serve SQL
  *    `VERSION AS OF` / `TIMESTAMP AS OF` as read-only pins.
  *  - ALTER TABLE's column changes (add/rename/drop/widen, and ADD
  *    COLUMN … DEFAULT) lower onto the same atomic
  *    [[PartitionedUpsert.evolveSchema]] the path face uses;
  *    table/column COMMENTs and user TBLPROPERTIES (r18) are
  *    metadata-only commits beside the schema (`COMMENT ON TABLE`,
  *    `ALTER COLUMN … COMMENT`, `SET/UNSET TBLPROPERTIES`,
  *    CREATE-time forms — and `SHOW CREATE TABLE` renders the honest
  *    re-creating DDL from the table's partitioning/properties
  *    faces). Properties are STORED AND RENDERED, never interpreted;
  *    the graft-reserved layout names (key/buckets/layout) are
  *    refused so a property can never shadow the physical layout.
  *  - RENAME TABLE is one filesystem rename — manifests reference
  *    data RELATIVELY, so a moved table is immediately whole.
  *  - DROP TABLE deletes the directory (the manifest chain IS the
  *    table; there is no softer catalog-only unregister to offer).
  *
  * The injected-parser statement grammar (MERGE/UPDATE/DELETE/
  * OPTIMIZE/VACUUM/DESCRIBE HISTORY…) works on catalog names with NO
  * new code: those lowerings resolve the target's directory through
  * `DESCRIBE TABLE EXTENDED`'s Name row, which renders this
  * catalog's tables exactly like path-loaded ones ([[GraftTable]]
  * .name — one resolution chain across every face). */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with StagingTableCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  override def name(): String = catalogName

  /** `ADD COLUMN … DEFAULT <lit>` is accepted (r18): Spark only
    * parses column defaults for catalogs declaring this capability.
    * The lowering is [[PartitionedUpsert.ColDefault]]'s metadata-only
    * existing-default contract. */
  override def capabilities(): util.Set[org.apache.spark.sql.connector
    .catalog.TableCatalogCapability] =
    util.EnumSet.of(org.apache.spark.sql.connector.catalog
      .TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE)

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"graft catalog '$name' needs a warehouse root: set " +
          s"spark.sql.catalog.$name.warehouse"))
  }

  private def spark: SparkSession = SparkSession.active
  private def fs(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** One path segment of a name — rejects separators/traversal so an
    * identifier can never escape the warehouse root. */
  private def segment(s: String): String = {
    require(s.nonEmpty && !s.contains("/") && !s.contains("\\") &&
      s != "." && s != "..",
      s"invalid graft catalog name segment '$s'")
    s
  }

  private def nsPath(ns: Array[String]): Path =
    new Path((warehouse +: ns.map(segment)).mkString("/"))

  private def dirOf(ident: Identifier): String =
    ((warehouse +: ident.namespace.map(segment)) :+
      segment(ident.name)).mkString("/")

  private def isTableDir(dir: String): Boolean =
    PartitionedUpsert.currentManifest(spark, dir).nonEmpty

  // ----------------------------------------------------------- tables

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val p = nsPath(namespace)
    val f = fs(p)
    if (!f.exists(p)) throw new NoSuchNamespaceException(
      (catalogName +: namespace).toSeq)
    f.listStatus(p).filter(_.isDirectory).map(_.getPath.getName)
      .filter(n => isTableDir(
        ((warehouse +: namespace.toSeq) :+ n).mkString("/")))
      .sorted
      .map(n => Identifier.of(namespace, n))
  }

  override def tableExists(ident: Identifier): Boolean =
    isTableDir(dirOf(ident))

  override def loadTable(ident: Identifier): Table = {
    val dir = dirOf(ident)
    PartitionedUpsert.currentManifest(spark, dir) match {
      // wrapped as a V1-fallback table (r18) so `writeStream
      // .format("graft").toTable("cat.ns.t")` lowers onto the SAME
      // path-addressed streaming sink — GraftNamedTable's scaladoc
      // owns the argument; every batch face delegates unchanged
      case Some(m) => new org.apache.spark.sql.graft.GraftNamedTable(
        new GraftTable(dir, m), catalogName, ident.namespace.toSeq,
        ident.name, dir)
      case None =>
        // Iceberg-style METADATA TABLES: `cat.ns.t.history` /
        // `cat.ns.t.detail` / `cat.ns.t.changes` resolve here as
        // (namespace=[ns, t], name=history) — if the namespace path
        // IS a table and the name is a known frame, serve it as a
        // read-only relation. `changes` is the CHANGE FEED BY NAME
        // (batch windows AND streaming tail): a reader option cannot
        // widen a catalog table's analysis-time schema, so the CDF
        // shape gets its own table whose schema IS the CDF schema and
        // whose scans resolve startingVersion/endingVersion options
        // through the same chain as the path face.
        val meta = ident.name.toLowerCase
        val parentDir = (warehouse +: ident.namespace.map(segment))
          .mkString("/")
        if ((meta == "history" || meta == "detail" || meta == "changes") &&
            ident.namespace.nonEmpty && isTableDir(parentDir)) {
          val sp = spark
          if (meta == "changes")
            new GraftChangesTable(ident.toString, parentDir, sp)
          else {
            val frame = () =>
              if (meta == "history") PartitionedUpsert.historyDf(sp, parentDir)
              else PartitionedUpsert.detailDf(sp, parentDir)
            new GraftMetaTable(s"${ident.toString}", frame)
          }
        } else throw new NoSuchTableException(ident)
    }
  }

  /** SQL `VERSION AS OF v` — a read-only historical pin. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = dirOf(ident)
    if (!isTableDir(dir)) throw new NoSuchTableException(ident)
    val v = scala.util.Try(version.toLong).getOrElse(
      throw new IllegalArgumentException(
        s"graft VERSION AS OF takes a numeric manifest version, got " +
          s"'$version'"))
    new GraftTable(dir, PartitionedUpsert.manifestAt(spark, dir, v),
      writable = false)
  }

  /** SQL `TIMESTAMP AS OF t` — the catalog contract passes MICROseconds
    * since epoch; resolves to the floor version like the provider's
    * `timestampAsOf` option (one chain: versionAtTimestamp). */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val dir = dirOf(ident)
    if (!isTableDir(dir)) throw new NoSuchTableException(ident)
    new GraftTable(dir, PartitionedUpsert.manifestAt(spark, dir,
      PartitionedUpsert.versionAtTimestamp(spark, dir,
        timestampMicros / 1000L)), writable = false)
  }

  /** Key + bucket count of a CREATE/REPLACE: `PARTITIONED BY
    * (bucket(n, col))` is the first-class DDL (the honest declaration
    * of a key-bucketed layout); TBLPROPERTIES/OPTIONS key/buckets the
    * fallback. Provider, key-in-schema and positivity validated
    * loudly. */
  private def keyAndBuckets(ident: Identifier, schema: StructType,
                            partitions: Array[Transform],
                            properties: util.Map[String, String])
      : (String, Int) = {
    val props = properties.asScala
    props.get(TableCatalog.PROP_PROVIDER).foreach { p =>
      require(p.equalsIgnoreCase("graft"),
        s"catalog '$catalogName' creates graft tables — USING $p is " +
          "not supported here")
    }
    val fromTransform: Option[(String, Int)] = partitions.toSeq match {
      case Seq() => None
      case Seq(t) if t.name == "bucket" =>
        // rendered shape: bucket(n, col) — arguments are (literal n,
        // field reference)
        val args = t.arguments()
        require(args.length == 2,
          s"bucket transform needs (n, col), got ${t.describe()}")
        val n = args(0).describe().toInt
        val c = args(1).describe().stripPrefix("`").stripSuffix("`")
        Some((c, n))
      case other => throw new IllegalArgumentException(
        "graft tables are key-bucketed — PARTITIONED BY supports " +
          s"exactly one bucket(n, col) transform, got " +
          other.map(_.describe()).mkString(", "))
    }
    def opt(k: String): Option[String] =
      props.get(k).orElse(props.get(TableCatalog.OPTION_PREFIX + k))
    val (keyCol, nBuckets) = fromTransform.getOrElse {
      val k = opt("key").getOrElse(throw new IllegalArgumentException(
        "a graft table needs its key: PARTITIONED BY (bucket(n, col)) " +
          "or TBLPROPERTIES ('key'='col'[, 'buckets'='n'])"))
      (k, opt("buckets").map(_.toInt).getOrElse(16))
    }
    require(schema.fieldNames.exists(_.equalsIgnoreCase(keyCol)),
      s"key column '$keyCol' is not in the table schema " +
        s"(${schema.fieldNames.mkString(", ")}) of $ident")
    require(nBuckets > 0, s"buckets must be positive, got $nBuckets")
    (schema.fieldNames.find(_.equalsIgnoreCase(keyCol)).get, nBuckets)
  }

  private def initEmpty(dir: String, schema: StructType, keyCol: String,
                        nBuckets: Int,
                        properties: util.Map[String, String]): Unit = {
    // CREATE-time column DEFAULTs (r19, r18 ADVICE): declaring
    // SUPPORT_COLUMN_DEFAULT_VALUE makes Spark parse `c INT DEFAULT
    // <lit>` into CURRENT_DEFAULT field metadata — silently dropping
    // it with the rest of the metadata (the r18 behavior) meant later
    // INSERTs omitting the column filled NULL where the user declared
    // a default. Extract and VALIDATE the literals BEFORE the init
    // writes anything (a bad literal must not leave a half-made
    // table), then record them as the manifest's insert-default face.
    val currentKey = org.apache.spark.sql.catalyst.util
      .ResolveDefaultColumns.CURRENT_DEFAULT_COLUMN_METADATA_KEY
    val createDefaults = schema.fields.flatMap { f =>
      if (f.metadata.contains(currentKey))
        Some(f.name -> f.metadata.getString(currentKey))
      else None
    }.toMap
    createDefaults.foreach { case (n, l) =>
      PartitionedUpsert.validateDefaultLiteral(spark, n, l,
        schema.fields.find(_.name == n).get.dataType) }
    // the DATA schema is stored comment-free (comments live beside it
    // in the manifest — a doc edit must never read as a schema change
    // to the CDF one-era rule); any other declared field metadata is
    // dropped with them, the documented contract of this catalog
    val clean = StructType(schema.fields.map(f =>
      org.apache.spark.sql.types.StructField(f.name, f.dataType,
        f.nullable)))
    val empty = spark.createDataFrame(
      new util.ArrayList[org.apache.spark.sql.Row](), clean)
    PartitionedUpsert.init(empty, dir, keyCol, nBuckets)
    if (createDefaults.nonEmpty)
      PartitionedUpsert.setInsertDefaults(spark, dir, createDefaults)
    val tableComment = Option(properties.get(TableCatalog.PROP_COMMENT))
    val colCs = schema.fields
      .flatMap(f => f.getComment().map(f.name -> _)).toMap
    if (tableComment.nonEmpty || colCs.nonEmpty)
      PartitionedUpsert.setComments(spark, dir,
        tableComment.map(c => Some(c)),
        colCs.view.mapValues(c => Some(c): Option[String]).toMap)
    // CREATE-time user TBLPROPERTIES (r18): everything that is not
    // layout declaration (key/buckets/layout), a Spark-reserved
    // attribute, or an option.* mirror is stored verbatim
    val skip = Set("key", "buckets", "layout",
      TableCatalog.PROP_PROVIDER, TableCatalog.PROP_COMMENT,
      TableCatalog.PROP_LOCATION, TableCatalog.PROP_OWNER,
      TableCatalog.PROP_EXTERNAL, TableCatalog.PROP_IS_MANAGED_LOCATION)
    val userProps = properties.asScala.toMap.filterNot { case (k, _) =>
      skip.contains(k.toLowerCase) ||
        k.toLowerCase.startsWith(TableCatalog.OPTION_PREFIX)
    }
    if (userProps.nonEmpty)
      PartitionedUpsert.setProperties(spark, dir, userProps)
  }

  override def createTable(ident: Identifier, info: TableInfo): Table =
    createTable(ident, info.schema(), info.partitions(), info.properties())

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    val dir = dirOf(ident)
    if (isTableDir(dir)) throw new TableAlreadyExistsException(ident)
    val (keyCol, nBuckets) = keyAndBuckets(ident, schema, partitions,
      properties)
    initEmpty(dir, schema, keyCol, nBuckets, properties)
    loadTable(ident)
  }

  // --------------------------------------------- atomic CTAS / RTAS

  /** Staged create/replace ([[StagingTableCatalog]]) — what makes
    * `CREATE TABLE … AS SELECT` and `[CREATE OR] REPLACE TABLE … AS
    * SELECT` ATOMIC: the query writes into a HIDDEN staging table
    * under `<warehouse>/.staging/<uuid>` (a real upsert table, so the
    * write path is the standard append-as-upsert with all its
    * guards), and only `commitStagedChanges` makes it visible —
    *  - CREATE commits by ONE no-overwrite directory rename into the
    *    final name (losing a create race = TableAlreadyExists, no
    *    torn state);
    *  - REPLACE commits by [[PartitionedUpsert.adoptAs]] — the staged
    *    data files RENAME under the live table and ONE manifest swap
    *    makes them current, so readers see old or new (never a mix),
    *    pre-replace versions stay time-travelable ACROSS the
    *    redefinition (schema AND key may change), writer txn cursors
    *    carry over, and the query's data is written exactly ONCE;
    *    the staging dir is reclaimed after.
    * An aborted statement deletes the staging dir; the final table is
    * untouched on any failure path. */
  override def stageCreate(ident: Identifier, info: TableInfo): StagedTable =
    stage(ident, info, replaceMode = false, orCreate = false)

  override def stageCreate(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): StagedTable =
    stage(ident, schema, partitions, properties,
      replaceMode = false, orCreate = false)

  override def stageReplace(ident: Identifier, info: TableInfo): StagedTable =
    stage(ident, info, replaceMode = true, orCreate = false)

  override def stageReplace(ident: Identifier, schema: StructType,
                            partitions: Array[Transform],
                            properties: util.Map[String, String]): StagedTable =
    stage(ident, schema, partitions, properties,
      replaceMode = true, orCreate = false)

  override def stageCreateOrReplace(ident: Identifier,
                                    info: TableInfo): StagedTable =
    stage(ident, info, replaceMode = true, orCreate = true)

  override def stageCreateOrReplace(ident: Identifier, schema: StructType,
                                    partitions: Array[Transform],
                                    properties: util.Map[String, String])
      : StagedTable =
    stage(ident, schema, partitions, properties,
      replaceMode = true, orCreate = true)

  private def stage(ident: Identifier, info: TableInfo,
                    replaceMode: Boolean, orCreate: Boolean): StagedTable =
    stage(ident, info.schema(), info.partitions(), info.properties(),
      replaceMode, orCreate)

  private def stage(ident: Identifier, schema: StructType,
                    partitions: Array[Transform],
                    properties: util.Map[String, String],
                    replaceMode: Boolean, orCreate: Boolean): StagedTable = {
    val dir = dirOf(ident)
    if (!replaceMode && isTableDir(dir))
      throw new TableAlreadyExistsException(ident)
    if (replaceMode && !orCreate && !isTableDir(dir))
      throw new NoSuchTableException(ident)
    val (keyCol, nBuckets) = keyAndBuckets(ident, schema, partitions,
      properties)
    val tmp = s"$warehouse/.staging/${java.util.UUID.randomUUID}"
    initEmpty(tmp, schema, keyCol, nBuckets, properties)
    val sp = spark
    new StagedGraftTable(ident.toString, tmp, sp,
      commitFn = () => {
        val f = fs(new Path(dir))
        if (replaceMode && isTableDir(dir)) {
          // atomic redefinition with ZERO data copy: the staged files
          // RENAME under the live table and ONE manifest swap makes
          // them current (adoptAs — the query's data was written
          // exactly once, into the staging table)
          PartitionedUpsert.adoptAs(sp, tmp, dir)
          f.delete(new Path(tmp), true): Unit
        } else {
          // atomic create: one no-overwrite rename into the final name.
          // GUARD on ANY pre-existing dir, not just a committed table
          // (ADVICE r17): HDFS rename(src, existingDir) moves src
          // INSIDE existingDir — against a leftover non-table
          // directory (crashed earlier init, user-made empty dir) the
          // commit would "succeed" with no manifest ever landing at
          // `dir`. Refuse with a pointer at the leftover instead.
          f.mkdirs(new Path(dir).getParent)
          if (isTableDir(dir)) {
            f.delete(new Path(tmp), true): Unit
            throw new TableAlreadyExistsException(ident)
          }
          if (f.exists(new Path(dir))) {
            f.delete(new Path(tmp), true): Unit
            throw new IllegalStateException(
              s"cannot commit staged CREATE of $ident: $dir already " +
                "exists but holds no committed manifest (leftover from " +
                "a crashed create, or a directory made outside the " +
                "catalog) — remove it and retry")
          }
          if (!f.rename(new Path(tmp), new Path(dir))) {
            f.delete(new Path(tmp), true): Unit
            throw new TableAlreadyExistsException(ident)
          }
          // exists-check→rename races (two concurrent CREATEs, or a
          // dir appearing between check and rename) can still land the
          // staging dir INSIDE dir under HDFS semantics — precisely:
          // dir/<stagingName> exists after a "successful" rename. That
          // test works whether the racer left a table (isTableDir
          // true, OUR data misplaced) or a bare dir (no manifest at
          // dir at all): reclaim the misplaced staging dir, surface
          // the conflict.
          val misplaced = new Path(dir, new Path(tmp).getName)
          if (f.exists(misplaced)) {
            f.delete(misplaced, true): Unit
            throw new TableAlreadyExistsException(ident)
          }
        }
      },
      abortFn = () => {
        val f = fs(new Path(tmp))
        f.delete(new Path(tmp), true): Unit
      })
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = dirOf(ident)
    val m = PartitionedUpsert.currentManifest(spark, dir).getOrElse(
      throw new NoSuchTableException(ident))
    def top(fieldNames: Array[String]): String = {
      require(fieldNames.length == 1,
        s"graft tables have flat schemas — nested column change " +
          s"'${fieldNames.mkString(".")}' is not supported")
      fieldNames(0)
    }
    // COMMENT and TBLPROPERTIES changes (r18) are metadata-only and
    // commit separately from schema changes — COMMENT ON TABLE /
    // ALTER COLUMN … COMMENT / SET-UNSET TBLPROPERTIES (stored and
    // rendered, never interpreted — PartitionedUpsert.setProperties
    // owns the reserved-name guard)
    var tableComment: Option[Option[String]] = None
    val colComments = scala.collection.mutable.Map[String, Option[String]]()
    val setProps = scala.collection.mutable.Map[String, String]()
    val unsetProps = scala.collection.mutable.ListBuffer[String]()
    val setDefaults = scala.collection.mutable.Map[String, String]()
    val unsetDefaults = scala.collection.mutable.ListBuffer[String]()
    val rest = changes.filter {
      case s: TableChange.SetProperty
          if s.property.equalsIgnoreCase(TableCatalog.PROP_COMMENT) =>
        tableComment = Some(Some(s.value)); false
      case r: TableChange.RemoveProperty
          if r.property.equalsIgnoreCase(TableCatalog.PROP_COMMENT) =>
        tableComment = Some(None); false
      case c: TableChange.UpdateColumnComment =>
        colComments(top(c.fieldNames())) = Some(c.newComment()); false
      // ALTER COLUMN … SET/DROP DEFAULT (r19): metadata-only commits
      // onto the insert-default face; DROP arrives as a null new
      // default. SQL text required, same rule as ADD COLUMN DEFAULT.
      case u: TableChange.UpdateColumnDefaultValue =>
        Option(u.newCurrentDefault()) match {
          case Some(dv) =>
            setDefaults(top(u.fieldNames())) = Option(dv.getSql()).getOrElse(
              throw new UnsupportedOperationException(
                s"SET DEFAULT for '${top(u.fieldNames())}' carries no " +
                  "SQL text — use a literal DEFAULT"))
          case None => unsetDefaults += top(u.fieldNames())
        }
        false
      case s: TableChange.SetProperty =>
        setProps(s.property) = s.value; false
      case r: TableChange.RemoveProperty =>
        unsetProps += r.property; false
      case _ => true
    }
    val schemaChanges: Seq[Cdc.SchemaChange] = rest.map {
      case a: TableChange.AddColumn =>
        // DEFAULT rides as the SQL text (validated by evolveSchema's
        // literal gate); a default built expression-only with no SQL
        // rendering has nothing to record — refuse rather than guess
        val dflt = Option(a.defaultValue()).map { dv =>
          Option(dv.getSql()).getOrElse(
            throw new UnsupportedOperationException(
              s"ADD COLUMN default for '${top(a.fieldNames())}' " +
                "carries no SQL text — use a literal DEFAULT"))
        }
        Cdc.AddColumn(top(a.fieldNames()), a.dataType(), dflt)
      case r: TableChange.RenameColumn =>
        Cdc.RenameColumn(top(r.fieldNames()), r.newName())
      case d: TableChange.DeleteColumn => Cdc.DropColumn(top(d.fieldNames()))
      case u: TableChange.UpdateColumnType =>
        Cdc.WidenColumn(top(u.fieldNames()), u.newDataType())
      case other => throw new UnsupportedOperationException(
        s"ALTER change ${other.getClass.getSimpleName} is not " +
          "supported on graft tables (column add/rename/drop/" +
          "type-widen, table/column COMMENTs, and SET/UNSET " +
          "TBLPROPERTIES are)")
    }
    // ONE ALTER statement must not apply partially (r18 ADVICE): the
    // schema change is the failable part (invalid DEFAULT literal,
    // non-widening type change, dangling CHECK reference), so it
    // commits FIRST — a refused ALTER then leaves no comment/property
    // edits behind. The comment/prop commits that follow can only
    // fail on FS faults that would have failed the evolve too.
    if (schemaChanges.nonEmpty) {
      // the key tracked FORWARD through this batch's renames (the
      // evolveSchema contract: keyCol is the POST-change name)
      val newKey = schemaChanges.foldLeft(m.keyCol) {
        case (k, Cdc.RenameColumn(from, to)) if from.equalsIgnoreCase(k) => to
        case (k, _) => k
      }
      PartitionedUpsert.evolveSchema(spark, dir, schemaChanges, newKey,
        m.nBuckets)
    }
    if (setDefaults.nonEmpty || unsetDefaults.nonEmpty)
      PartitionedUpsert.setInsertDefaults(spark, dir, setDefaults.toMap,
        unsetDefaults.toSeq)
    if (tableComment.nonEmpty || colComments.nonEmpty)
      PartitionedUpsert.setComments(spark, dir, tableComment,
        colComments.toMap)
    if (setProps.nonEmpty || unsetProps.nonEmpty)
      PartitionedUpsert.setProperties(spark, dir, setProps.toMap,
        unsetProps.toSeq)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = dirOf(ident)
    if (!isTableDir(dir)) false
    else { fs(new Path(dir)).delete(new Path(dir), true); true }
  }

  override def purgeTable(ident: Identifier): Boolean = dropTable(ident)

  override def renameTable(oldIdent: Identifier,
                           newIdent: Identifier): Unit = {
    val from = new Path(dirOf(oldIdent))
    val to = new Path(dirOf(newIdent))
    val f = fs(from)
    if (!isTableDir(dirOf(oldIdent))) throw new NoSuchTableException(oldIdent)
    if (isTableDir(dirOf(newIdent)))
      throw new TableAlreadyExistsException(newIdent)
    f.mkdirs(to.getParent)
    // one rename IS the whole move: manifests reference data files
    // RELATIVE to the table root, so the renamed table is whole with
    // zero rewrites (the clone/vacuum layout rule paying off)
    if (!f.rename(from, to))
      throw new IllegalStateException(
        s"rename ${oldIdent} -> ${newIdent} failed (target parent " +
          "missing or cross-filesystem move?)")
  }

  // ------------------------------------------------------- namespaces

  override def listNamespaces(): Array[Array[String]] = {
    val root = new Path(warehouse)
    val f = fs(root)
    if (!f.exists(root)) Array.empty
    else f.listStatus(root).filter(_.isDirectory)
      .map(_.getPath.getName)
      .filterNot(_.startsWith(".")) // .staging is catalog-internal
      .sorted.map(Array(_))
  }

  override def listNamespaces(namespace: Array[String])
      : Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    val p = nsPath(namespace)
    val f = fs(p)
    if (!f.exists(p)) throw new NoSuchNamespaceException(
      (catalogName +: namespace).toSeq)
    // nested namespaces = subdirectories that are NOT table roots
    f.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).sorted
      .filterNot(n => isTableDir(
        ((warehouse +: namespace.toSeq) :+ n).mkString("/")))
      .map(n => namespace :+ n)
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || fs(nsPath(namespace)).exists(nsPath(namespace))

  override def loadNamespaceMetadata(namespace: Array[String])
      : util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException((catalogName +: namespace).toSeq)
    new util.HashMap[String, String]()
  }

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit = {
    val p = nsPath(namespace)
    if (fs(p).exists(p))
      throw new NamespaceAlreadyExistsException(catalogName +: namespace)
    fs(p).mkdirs(p): Unit
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft namespaces are directories and carry no metadata to alter")

  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = {
    val p = nsPath(namespace)
    val f = fs(p)
    if (!f.exists(p)) false
    else {
      if (!cascade && f.listStatus(p).nonEmpty)
        throw new org.apache.spark.sql.catalyst.analysis
          .NonEmptyNamespaceException(catalogName +: namespace)
      f.delete(p, true)
    }
  }
}

/** A read-only METADATA TABLE (`cat.ns.t.history` / `.detail` — the
  * Iceberg metadata-table idiom): wraps one of the engine's audit
  * frames as a DSv2 relation so plain SQL can filter/join the audit
  * surface (`SELECT * FROM g.prod.users.history WHERE version > 5`).
  * The frame derives from the MANIFEST CHAIN (driver-bounded rows —
  * vacuum caps manifest count), re-resolved per scan so the relation
  * always reads current; served through the V1 bridge like every
  * other bounded frame here. */
private[sources] final class GraftMetaTable(identName: String,
                                            frame: () => org.apache.spark.sql
                                              .DataFrame)
    extends Table with SupportsRead {

  override def name(): String = identName
  override def schema(): StructType = frame().schema
  override def capabilities(): util.Set[org.apache.spark.sql.connector
    .catalog.TableCapability] =
    util.EnumSet.of(org.apache.spark.sql.connector.catalog
      .TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new ScanBuilder {
    override def build(): org.apache.spark.sql.connector.read.Scan =
      new org.apache.spark.sql.connector.read.V1Scan {
        override def readSchema(): StructType = schema()
        override def description(): String = identName
        override def toV1TableScan[T <: org.apache.spark.sql.sources
          .BaseRelation with org.apache.spark.sql.sources.TableScan](
            context: org.apache.spark.sql.SQLContext): T = {
          val relation = new org.apache.spark.sql.sources.BaseRelation
              with org.apache.spark.sql.sources.TableScan {
            override val sqlContext: org.apache.spark.sql.SQLContext = context
            override val schema: StructType = frame().schema
            override def buildScan(): org.apache.spark.rdd.RDD[
              org.apache.spark.sql.Row] = frame().rdd
          }
          relation.asInstanceOf[T]
        }
      }
  }
}

/** The CHANGE FEED BY NAME (`cat.ns.t.changes`, r17): the CDF surface
  * as a metadata table — `spark.read.option("startingVersion", v)
  * .table("g.prod.users.changes")` for batch windows,
  * `spark.readStream.option("startingVersion", "snapshot"|v|
  * "afterEvolve").table(…)` for the exactly-once tail. The declared
  * schema IS the CDF schema of the CURRENT manifest (key,
  * change_type, values — all nullable); per-scan options resolve
  * through the SAME [[GraftDataSource.cdfParams]] chain as the path
  * face and delegate to the same [[GraftCdfTable]] machinery, so the
  * two faces cannot drift. */
private[sources] final class GraftChangesTable(identName: String,
                                               dir: String,
                                               spark: SparkSession)
    extends Table with SupportsRead {

  override def name(): String = identName
  override def schema(): StructType = GraftDataSource.cdfSchema(
    PartitionedUpsert.manifestOrFail(spark, dir))
  override def capabilities(): util.Set[org.apache.spark.sql.connector
    .catalog.TableCapability] =
    util.EnumSet.of(
      org.apache.spark.sql.connector.catalog.TableCapability.BATCH_READ,
      org.apache.spark.sql.connector.catalog.TableCapability
        .MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = {
    val (from, to, m, snapshotStart) =
      GraftDataSource.cdfParams(spark, dir, options)
    new GraftCdfTable(dir, from, to, GraftDataSource.cdfSchema(m),
      endingVersionExplicit = options.get("endingVersion") != null,
      snapshotStart = snapshotStart).newScanBuilder(options)
  }
}

/** The staged side of an atomic CTAS/RTAS ([[GraftCatalog.stageCreate]]
  * and friends): a REAL hidden upsert table the query writes into
  * through the standard DSv2 write path, made visible only by
  * `commitStagedChanges` (rename for CREATE, one manifest swap for
  * REPLACE — the catalog's scaladoc owns the atomicity argument). The
  * inner table resolves PER CALL so the write builder always sees the
  * staging table's current manifest (each epoch of a multi-statement
  * write re-resolves, the provider's own rule). */
private[sources] final class StagedGraftTable(identName: String,
                                              tmpDir: String,
                                              spark: SparkSession,
                                              commitFn: () => Unit,
                                              abortFn: () => Unit)
    extends StagedTable with SupportsRead with SupportsWrite {

  private def inner: GraftTable =
    new GraftTable(tmpDir, PartitionedUpsert.manifestOrFail(spark, tmpDir))

  override def name(): String = identName
  override def schema(): StructType = inner.schema()
  override def capabilities(): util.Set[org.apache.spark.sql.connector
    .catalog.TableCapability] = inner.capabilities()
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = inner.newScanBuilder(options)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    inner.newWriteBuilder(info)
  override def commitStagedChanges(): Unit = commitFn()
  override def abortStagedChanges(): Unit = abortFn()
}
