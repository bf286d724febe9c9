package graft

import org.apache.spark.sql.functions._
import graft.model.Views

/** The persisted-MV attach seam (VERDICT r16 next-round #4): with
  * SPARK_GRAFT_MV_DISK set, the first session to need an MV builds it
  * and writes it under a fingerprint of (name, input-dir listing, code
  * build); later sessions ATTACH (parquet read, no build). Staleness is
  * impossible by construction — any input-file or code change moves the
  * fingerprint. These tests drive the seam through the test override
  * (env vars can't be set in-JVM). */
class MvDiskSpec extends SparkSpec {

  private def withDisk[A](body: java.nio.file.Path => A): A = {
    val root = java.nio.file.Files.createTempDirectory("graft-mvdisk")
    Views.diskRootOverride = Some(root)
    try body(root)
    finally {
      Views.diskRootOverride = None
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(root.toFile)
    }
  }

  test("second session attaches: builder runs once, rows identical") {
    withDisk { _ =>
      val dir = java.nio.file.Files.createTempDirectory("graft-mvdisk-in")
      try {
        spark.range(0, 1000).select(col("id"), (col("id") % 7).as("k"))
          .write.mode("overwrite").parquet(dir.resolve("t.parquet").toString)
        val builds = new java.util.concurrent.atomic.AtomicInteger
        def build() = {
          builds.incrementAndGet()
          spark.read.parquet(dir.resolve("t.parquet").toString)
            .groupBy(col("k")).agg(sum(col("id")).as("s"))
        }
        val h0 = Views.diskHits.get(); val m0 = Views.diskMisses.get()
        val first = Views.cached(spark, dir.toString, "mvdisk_probe")(build())
          .collect().map(_.toString).sorted
        assert(builds.get() == 1)
        assert(Views.diskMisses.get() == m0 + 1 && Views.diskHits.get() == h0)
        // simulate a NEW session: drop the in-memory layer, keep disk
        Views.reset(spark)
        val second = Views.cached(spark, dir.toString, "mvdisk_probe")(build())
          .collect().map(_.toString).sorted
        assert(builds.get() == 1, "attach must not re-run the builder")
        assert(Views.diskHits.get() == h0 + 1)
        assert(first.sameElements(second))
        // an input-data change moves the fingerprint → rebuild
        spark.range(0, 1001).select(col("id"), (col("id") % 7).as("k"))
          .write.mode("overwrite").parquet(dir.resolve("t.parquet").toString)
        Views.reset(spark)
        val third = Views.cached(spark, dir.toString, "mvdisk_probe")(build())
        assert(builds.get() == 2, "changed inputs must rebuild, not attach")
        assert(third.count() == 7)
      } finally {
        def rm(f: java.io.File): Unit = {
          val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
          f.delete(): Unit
        }
        rm(dir.toFile)
      }
    }
  }

  test("disk layer off (default): builder runs per session, no disk traffic") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mvdisk-off")
    try {
      spark.range(0, 10).toDF("id")
        .write.mode("overwrite").parquet(dir.resolve("t.parquet").toString)
      val builds = new java.util.concurrent.atomic.AtomicInteger
      def build() = {
        builds.incrementAndGet()
        spark.read.parquet(dir.resolve("t.parquet").toString)
      }
      val m0 = Views.diskMisses.get(); val h0 = Views.diskHits.get()
      Views.cached(spark, dir.toString, "mvdisk_off_probe")(build()).count()
      Views.reset(spark)
      Views.cached(spark, dir.toString, "mvdisk_off_probe")(build()).count()
      assert(builds.get() == 2)
      assert(Views.diskMisses.get() == m0 && Views.diskHits.get() == h0)
    } finally {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(dir.toFile)
    }
  }
}
