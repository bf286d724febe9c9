package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.{expr, lit}
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

/** SQL mutation surface for graft-versioned tables — `DELETE FROM` /
  * `MERGE INTO` through the session's SQL parser (Delta's SQL DML on
  * this store's manifests), closing the last ClickHouse-surface
  * asymmetry: the reference exposes mutations in SQL, the query side
  * here already does (`q_sql_*`), and row-level ops were Scala-only.
  *
  * Wire-up is the library's one extensions seam:
  * `spark.sql.extensions=graft.functions.GraftExtensions` injects
  * [[GraftSqlParser]]; then
  * {{{
  *   VersionedSqlTables.register(spark, "events", tablePath)
  *   spark.sql("DELETE FROM events WHERE id % 5 = 0")
  *   spark.sql("""MERGE INTO events USING updates ON events.id = updates.id
  *                WHEN MATCHED THEN UPDATE SET *
  *                WHEN NOT MATCHED THEN INSERT *""")
  * }}}
  *
  * Both statements return a single row `(version)` — the committed
  * snapshot version, like the API calls they delegate to. The
  * copy-on-write / merge-on-read choice is a session conf,
  * `spark.graft.mutation.mode = cow | vectored` (DML text stays
  * ANSI): both DELETE and MERGE honor it on flat AND partitioned
  * tables — the vectored forms are the O(batch + matched) 100 TB
  * shape, the copy-on-write forms keep the table vector-free.
  * Unregistered table names fall through to Spark's own parser
  * untouched, as does every other statement.
  *
  * The MERGE grammar is exactly the shape the store implements
  * (whenMatched-update-all / whenNotMatched-insert-all, equi-key ON):
  * anything else falls through to Spark and fails with Spark's own
  * error, never silently doing the wrong thing. */
object VersionedSqlTables {
  private val tables =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  /** Bind `name` (a simple identifier) to a versioned-store path for
    * this session's app — the SQL DML lookup table. */
  def register(spark: SparkSession, name: String, path: String): Unit = {
    tables.put((spark.sparkContext.applicationId,
      name.toLowerCase(java.util.Locale.ROOT)), path)
    ()
  }

  def pathOf(spark: SparkSession, name: String): Option[String] =
    Option(tables.get((spark.sparkContext.applicationId,
      name.toLowerCase(java.util.Locale.ROOT))))

  private[sources] def modeVectored(spark: SparkSession): Boolean = {
    val m = spark.conf.get("spark.graft.mutation.mode", "cow")
    require(m == "cow" || m == "vectored",
      s"spark.graft.mutation.mode must be cow or vectored, got $m")
    m == "vectored"
  }
}

/** `DELETE FROM <registered> [WHERE <pred>]` — dispatches to the
  * store's delete family by table layout and mutation mode. */
case class GraftDeleteCommand(table: String, whereSql: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[AttributeReference] =
    Seq(AttributeReference("version", IntegerType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val path = VersionedSqlTables.pathOf(spark, table).getOrElse(
      sys.error(s"$table is not a registered graft-versioned table"))
    val cond = whereSql.map(expr).getOrElse(lit(true))
    val cur = VersionedStore.currentVersion(path)
    require(cur > 0, s"cannot DELETE: no committed version at $path")
    val vectored = VersionedSqlTables.modeVectored(spark)
    val v =
      if (VersionedStore.isFlatVersion(path, cur))
        if (vectored) VersionedStore.deleteVectored(spark, path, cond)
        else VersionedStore.delete(spark, path, cond)
      else if (vectored)
        VersionedStore.deletePartitionedVectored(spark, path, cond)
      else VersionedStore.deletePartitioned(spark, path, cond)
    Seq(Row(v))
  }
}

/** `MERGE INTO <registered> USING <table-or-view> ON <equi-keys>
  * WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *` —
  * the update-all/insert-all upsert the store implements. */
case class GraftMergeCommand(table: String, source: String,
                             keys: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[AttributeReference] =
    Seq(AttributeReference("version", IntegerType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val path = VersionedSqlTables.pathOf(spark, table).getOrElse(
      sys.error(s"$table is not a registered graft-versioned table"))
    val updates = spark.table(source)
    val cur = VersionedStore.currentVersion(path)
    require(cur > 0, s"cannot MERGE: no committed version at $path")
    val vectored = VersionedSqlTables.modeVectored(spark)
    val v =
      if (VersionedStore.isFlatVersion(path, cur))
        if (vectored) VersionedStore.mergeVectored(spark, path, updates, keys)
        else VersionedStore.merge(spark, path, updates, keys)
      else if (vectored)
        VersionedStore.mergePartitionedVectored(spark, path, updates, keys)
      else VersionedStore.mergePartitioned(spark, path, updates, keys)
    Seq(Row(v))
  }
}

/** `ALTER TABLE <registered> DROP PARTITION '<value>'` — ClickHouse's
  * partition-drop statement, dispatching to
  * [[VersionedStore.expirePartitions]]: a METADATA-ONLY commit (no
  * data file read or written; #186's TTL mechanism). Unknown
  * partition values are a no-op returning the current version, like
  * a zero-match DELETE. */
case class GraftDropPartitionCommand(table: String, value: String)
    extends LeafRunnableCommand {
  override val output: Seq[AttributeReference] =
    Seq(AttributeReference("version", IntegerType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val path = VersionedSqlTables.pathOf(spark, table).getOrElse(
      sys.error(s"$table is not a registered graft-versioned table"))
    Seq(Row(VersionedStore.expirePartitions(spark, path, _ == value)))
  }
}

/** `DESCRIBE HISTORY <registered>` — the commit audit surface
  * (Delta's DESCRIBE HISTORY): one row per retained version from
  * [[VersionedStore.history]], newest first. Read-only. */
case class GraftHistoryCommand(table: String) extends LeafRunnableCommand {
  import org.apache.spark.sql.types.{LongType, StringType}
  override val output: Seq[AttributeReference] = Seq(
    AttributeReference("version", IntegerType, nullable = false)(),
    AttributeReference("timestamp_ms", LongType, nullable = false)(),
    AttributeReference("form", StringType, nullable = false)(),
    AttributeReference("partitions_touched", StringType, nullable = false)(),
    AttributeReference("files_added", IntegerType, nullable = false)(),
    AttributeReference("files_removed", IntegerType, nullable = false)(),
    AttributeReference("rows_added", LongType, nullable = true)(),
    AttributeReference("dv_files_added", IntegerType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val path = VersionedSqlTables.pathOf(spark, table).getOrElse(
      sys.error(s"$table is not a registered graft-versioned table"))
    VersionedStore.history(path).reverse.map(c =>
      Row(c.version, c.timestampMs, c.form,
        c.partitionsTouched.mkString(","), c.filesAdded, c.filesRemoved,
        c.rowsAdded.orNull, c.dvFilesAdded))
  }
}

/** Parser shim: intercepts the two DML statements (plus DESCRIBE
  * HISTORY) on REGISTERED names, delegates everything else
  * verbatim. */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  private val DeleteRe =
    """(?is)\s*DELETE\s+FROM\s+([A-Za-z_]\w*)(?:\s+WHERE\s+(.+?))?\s*;?\s*""".r
  private val HistoryRe =
    """(?is)\s*DESCRIBE\s+HISTORY\s+([A-Za-z_]\w*)\s*;?\s*""".r
  private val DropPartRe =
    """(?is)\s*ALTER\s+TABLE\s+([A-Za-z_]\w*)\s+DROP\s+PARTITION\s+'([^']*)'\s*;?\s*""".r
  private val MergeRe =
    ("""(?is)\s*MERGE\s+INTO\s+([A-Za-z_]\w*)\s+USING\s+([A-Za-z_]\w*)""" +
      """\s+ON\s+(.+?)\s+WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*""" +
      """\s+WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*\s*;?\s*""").r
  private val KeyEq =
    """(?s)\s*(?:(\w+)\.)?(\w+)\s*=\s*(?:(\w+)\.)?(\w+)\s*""".r

  private def registered(name: String): Boolean =
    VersionedSqlTables.pathOf(session, name).isDefined

  /** ON-clause → key columns: a conjunction of `t.k = s.k`
    * equalities over the SAME column name (qualifiers optional). A
    * non-equi or cross-named ON refuses loudly — the store's merge
    * is key-based, and guessing keys would corrupt the table. */
  private def keysOf(on: String, target: String, source: String)
      : Seq[String] =
    on.split("(?i)\\s+AND\\s+").toSeq.map {
      case KeyEq(q1, c1, q2, c2) if c1.equalsIgnoreCase(c2) &&
          Seq(q1, q2).forall(q => q == null ||
            q.equalsIgnoreCase(target) || q.equalsIgnoreCase(source)) =>
        c1
      case other => sys.error(
        s"unsupported MERGE ON conjunct '$other' — graft-versioned " +
          "MERGE supports equi-key conjunctions (t.k = s.k) only")
    }

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case DeleteRe(name, where) if registered(name) =>
      GraftDeleteCommand(name, Option(where))
    case MergeRe(target, source, on) if registered(target) =>
      GraftMergeCommand(target, source, keysOf(on, target, source))
    case HistoryRe(name) if registered(name) =>
      GraftHistoryCommand(name)
    case DropPartRe(name, value) if registered(name) =>
      GraftDropPartitionCommand(name, value)
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
