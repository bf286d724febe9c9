package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Manifest-versioned table store: snapshot isolation, time travel
  * and safe vacuum over plain parquet — the Iceberg/Delta commit
  * protocol in its minimal form, sized for this engine's warehouse
  * tables.
  *
  * Why it exists at 100 TB: [[PartitionedStore]]'s directory swap
  * gives crash-safe REPLACEMENT, but a reader that started before a
  * swap races the delete, and there is no way to reproduce last
  * week's table state for an audit or a backfill diff. The standard
  * fix is indirection through immutable metadata: data files are
  * append-only, every commit publishes a MANIFEST (the complete list
  * of live files for that version) with an atomic rename, and readers
  * resolve a manifest once — so a query pinned to version v is
  * untouched by later appends, overwrites, compactions or vacuums of
  * other versions.
  *
  * Commit protocol (single writer, like the reference's one indexer
  * process): (1) write the new data files under data/commit-<v>/;
  * (2) write manifests/v<v>.manifest.tmp; (3) RENAME it to
  * v<v>.manifest — the one atomic publish. A crash anywhere before
  * (3) leaves version v−1 live and the orphaned files invisible
  * (vacuum removes them). Compaction is just a commit whose rows are
  * logically identical; old versions keep reading the uncompacted
  * files until vacuumed.
  *
  * Layout:  <path>/data/commit-<v>/part-*.parquet   (immutable)
  *          <path>/manifests/v<v>.manifest          (sorted file list)
  *
  * 100 TB honesty: a flat manifest lists every live file, so at
  * millions of files per table the next step is Iceberg's actual
  * refinement — a manifest LIST pointing at per-partition manifest
  * files, so a commit rewrites only the touched partitions' entries
  * and planning prunes whole manifests. The protocol (immutable data
  * + atomic metadata pointer swap) is unchanged; only the metadata
  * gets a second level. */
object VersionedStore {

  private def manifestDir(path: String) = new File(path, "manifests")
  private def manifestFile(path: String, v: Int) =
    new File(manifestDir(path), s"v$v.manifest")

  private val ManifestRe = "v([0-9]+)\\.manifest".r

  /** Latest committed version; 0 = empty table. */
  def currentVersion(path: String): Int = {
    val files = Option(manifestDir(path).list()).getOrElse(Array.empty)
    files.collect { case ManifestRe(v) => v.toInt }.foldLeft(0)(math.max)
  }

  /** The live data files (table-relative) of version `v`. */
  def filesAsOf(path: String, v: Int): Seq[String] = {
    val mf = manifestFile(path, v)
    require(mf.exists(), s"version $v does not exist (vacuumed or never committed)")
    Files.readAllLines(mf.toPath).asScala.toSeq.filter(_.nonEmpty)
  }

  /** Read the table as of version `v` — a stable snapshot: later
    * commits, compactions and vacuums of other versions never change
    * what this returns. */
  def readAsOf(spark: SparkSession, path: String, v: Int): DataFrame =
    spark.read.parquet(filesAsOf(path, v).map(f => s"$path/$f"): _*)

  /** Read the latest version. */
  def read(spark: SparkSession, path: String): DataFrame =
    readAsOf(spark, path, currentVersion(path))

  /** Append `df` as a new version; returns the committed version. */
  def append(df: DataFrame, path: String): Int = {
    val prev = currentVersion(path)
    val carried = if (prev == 0) Seq.empty else filesAsOf(path, prev)
    commitData(df, path, prev + 1, carried)
  }

  /** Replace the table contents with `df` as a new version — old
    * versions stay readable until vacuumed. */
  def overwrite(df: DataFrame, path: String): Int =
    commitData(df, path, currentVersion(path) + 1, Seq.empty)

  /** foreachBatch seam: append `df` as version batchId+1. Replay-safe
    * under Spark's at-least-once micro-batch contract — a re-delivered
    * batch recommits the SAME version: its carried-file list derives
    * from version batchId (deterministic, independent of replay), the
    * data rewrite replaces the identical rows, and the manifest
    * republish is an identical atomic replace — so at-least-once
    * delivery lands exactly-once TABLE STATE, the same idempotency
    * recipe as [[MetadataSync.upsert]] and SnapshotWriter's batch-id
    * dedup. (Spark replays only the latest uncommitted batch, so a
    * recommit never races versions committed after it.) */
  def commitBatch(df: DataFrame, path: String, batchId: Long): Int = {
    val v = batchId.toInt + 1
    val carried = if (v == 1) Seq.empty else filesAsOf(path, v - 1)
    commitData(df, path, v, carried)
  }

  /** Rewrite the current version's files into `nFiles` outputs as a
    * new version (logically identical rows) — the background-merge
    * analogue; readers of older versions keep the small files until
    * vacuum. */
  def compact(spark: SparkSession, path: String, nFiles: Int): Int = {
    val cur = read(spark, path)
    commitData(cur.repartition(nFiles), path, currentVersion(path) + 1,
      Seq.empty)
  }

  /** Delete manifests older than the last `keepVersions` and every
    * data file no retained manifest references. Never touches files a
    * retained snapshot can still resolve. Returns deleted paths
    * (table-relative). */
  def vacuum(path: String, keepVersions: Int): Seq[String] = {
    require(keepVersions >= 1, "must retain at least the current version")
    val cur = currentVersion(path)
    val cutoff = cur - keepVersions + 1
    val retained = (cutoff to cur)
      .filter(v => manifestFile(path, v).exists())
      .flatMap(v => filesAsOf(path, v)).toSet
    val dataRoot = new File(path, "data")
    val live = Option(dataRoot.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory)
      .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty))
      .filter(_.getName.endsWith(".parquet"))
    val doomed = live.filterNot(f =>
      retained.contains(s"data/${f.getParentFile.getName}/${f.getName}"))
    doomed.foreach(f => f.delete(): Unit)
    // drop now-empty commit dirs and the expired manifests
    Option(dataRoot.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory &&
        Option(d.listFiles()).getOrElse(Array.empty)
          .forall(!_.getName.endsWith(".parquet")))
      .foreach { d =>
        Option(d.listFiles()).getOrElse(Array.empty).foreach(_.delete())
        d.delete(): Unit
      }
    Option(manifestDir(path).list()).getOrElse(Array.empty)
      .collect { case n @ ManifestRe(v) if v.toInt < cutoff => n }
      .foreach(n => new File(manifestDir(path), n).delete(): Unit)
    doomed.map(f => s"data/${f.getParentFile.getName}/${f.getName}").toSeq
  }

  private def commitData(df: DataFrame, path: String, v: Int,
                         carriedFiles: Seq[String]): Int = {
    val commitRel = s"data/commit-$v"
    // Overwrite: a torn earlier attempt at this same version may have
    // left data files behind — that version was never PUBLISHED (no
    // manifest), so clobbering its debris is safe and unblocks retry
    df.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$path/$commitRel")
    val added = Option(new File(path, commitRel).listFiles())
      .getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
      .map(f => s"$commitRel/${f.getName}").toSeq
    publishManifest(path, v, (carriedFiles ++ added).sorted)
    v
  }

  /** The atomic publish: full file list to a tmp file, one rename. */
  private def publishManifest(path: String, v: Int,
                              files: Seq[String]): Unit = {
    manifestDir(path).mkdirs()
    val tmp = new File(manifestDir(path), s"v$v.manifest.tmp")
    Files.write(tmp.toPath, files.mkString("\n").getBytes("UTF-8"))
    Files.move(tmp.toPath, manifestFile(path, v).toPath,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    ()
  }
}
