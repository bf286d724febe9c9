package graft

import graft.sources.VersionedStore
import org.apache.spark.sql.functions._

/** Snapshot isolation / time travel / vacuum over the
  * manifest-versioned store (§2 #145): the Iceberg-style commit
  * protocol in its minimal single-writer form. */
class VersionedStoreSpec extends SparkSpec {

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("vstore").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def rows(path: String, v: Int): Set[Long] =
    VersionedStore.readAsOf(spark, path, v)
      .collect().map(_.getLong(0)).toSet

  test("append commits are versioned and snapshots are stable") {
    import spark.implicits._
    val path = freshDir()
    val v1 = VersionedStore.append(Seq(1L, 2L).toDF("id"), path)
    val v2 = VersionedStore.append(Seq(3L).toDF("id"), path)
    assert((v1, v2) == ((1, 2)))
    assert(rows(path, 1) == Set(1L, 2L), "v1 snapshot excludes v2's rows")
    assert(rows(path, 2) == Set(1L, 2L, 3L))
    assert(VersionedStore.currentVersion(path) == 2)
  }

  test("overwrite and compaction keep old versions readable") {
    import spark.implicits._
    val path = freshDir()
    VersionedStore.append((1L to 10L).toDF("id"), path)
    VersionedStore.overwrite((100L to 102L).toDF("id"), path)
    assert(rows(path, 1) == (1L to 10L).toSet, "overwrite is a new version")
    assert(rows(path, 2) == (100L to 102L).toSet)
    // compaction: logically identical rows, fewer files, new version
    VersionedStore.append((103L to 120L).toDF("id").repartition(8), path)
    val before = VersionedStore.filesAsOf(path, 3).size
    val v4 = VersionedStore.compact(spark, path, nFiles = 1)
    assert(VersionedStore.filesAsOf(path, v4).size < before)
    assert(rows(path, v4) == rows(path, 3), "compaction changes no rows")
    assert(rows(path, 3) == (100L to 120L).toSet,
      "pre-compaction snapshot still resolves the uncompacted files")
  }

  test("vacuum deletes only files no retained snapshot references") {
    import spark.implicits._
    val path = freshDir()
    VersionedStore.append(Seq(1L).toDF("id"), path)      // v1
    VersionedStore.overwrite(Seq(2L).toDF("id"), path)   // v2 (v1 orphan)
    VersionedStore.append(Seq(3L).toDF("id"), path)      // v3 carries v2
    val deleted = VersionedStore.vacuum(path, keepVersions = 2)
    assert(deleted.nonEmpty && deleted.forall(_.contains("commit-1")),
      s"only v1's files are unreferenced by v2/v3, got $deleted")
    assert(rows(path, 2) == Set(2L) && rows(path, 3) == Set(2L, 3L),
      "retained snapshots unaffected")
    intercept[IllegalArgumentException] {
      VersionedStore.readAsOf(spark, path, 1)
    }
  }

  test("a torn commit leaves the previous version live") {
    import spark.implicits._
    val path = freshDir()
    VersionedStore.append(Seq(1L).toDF("id"), path)
    // simulate a crash between data write and manifest publish: data
    // files exist, the manifest rename never happened
    Seq(99L).toDF("id").write.parquet(s"$path/data/commit-2")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$path/manifests/v2.manifest.tmp"),
      "data/commit-2/bogus.parquet".getBytes("UTF-8"))
    assert(VersionedStore.currentVersion(path) == 1,
      "tmp manifest is not a committed version")
    assert(rows(path, 1) == Set(1L), "orphaned files stay invisible")
    // the next real commit proceeds past the debris
    val v = VersionedStore.append(Seq(2L).toDF("id"), path)
    assert(rows(path, v) == Set(1L, 2L))
  }

  test("streaming micro-batch commits: replay lands exactly-once state") {
    import spark.implicits._
    val path = freshDir()
    // two micro-batches through the streaming seam
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Long]
    val q = graft.streaming.StreamingIngest.sinkVersioned(
      ms.toDF().withColumnRenamed("value", "id"), path,
      freshDir() + "/ckpt")
    ms.addData(1L, 2L); q.processAllAvailable()
    ms.addData(3L); q.processAllAvailable()
    q.stop()
    assert(VersionedStore.currentVersion(path) == 2)
    assert(rows(path, 1) == Set(1L, 2L))
    assert(rows(path, 2) == Set(1L, 2L, 3L))
    // at-least-once replay: recommitting the LAST batch (same id,
    // same rows — what a post-crash foreachBatch does) must land the
    // identical state, not append a second copy
    VersionedStore.commitBatch(Seq(3L).toDF("id"), path, batchId = 1L)
    assert(VersionedStore.currentVersion(path) == 2)
    assert(rows(path, 2) == Set(1L, 2L, 3L), "replay is idempotent")
  }
}
