package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Largest-Triangle-Three-Buckets chart downsampling (ClickHouse
  * `largestTriangleThreeBuckets(n)(x, y)`; Steinarsson 2013, the
  * public LTTB thesis algorithm). Reference analogue: the candles API
  * serves bounded-size chart series (api.ts:1824-1876) — LTTB is the
  * standard way to cap a series at N visually-representative points
  * when the interval grid would still be too dense.
  *
  * Distribution shape: the selection inside one series is inherently
  * sequential (each pick anchors the next triangle), so this is a
  * per-key fold — `repartition(key)` + secondary sort + one
  * `mapPartitions` pass, the Ledger.scala recipe. Unlike the ledger
  * fold the algorithm needs the whole series at once (bucket averages
  * look one bucket AHEAD), so each series is buffered in memory at
  * its key boundary — the same per-group-array contract as CH's own
  * largestTriangleThreeBuckets aggregate. Per-key memory is one
  * series (two doubles per point); keys are processed one at a time
  * and partitions stream key to key.
  *
  * Determinism: rows sort by (key, x, y) so duplicate x values fold
  * in a data-defined order, and area ties keep the FIRST candidate —
  * the output is a pure function of the data across any
  * partitioning.
  */
object Downsample {

  final case class Picked(key: Long, bucket: Int, x: Double, y: Double)

  /** Downsample each key's series of (x, y) points to at most
    * `threshold` points (first and last always kept; `threshold`
    * ≥ 3). Output: (key, bucket, x, y), bucket = 0-based pick index.
    */
  def lttb(df: DataFrame, key: String, x: String, y: String,
           threshold: Int): Dataset[Picked] = {
    require(threshold >= 3, s"LTTB threshold must be >= 3, got $threshold")
    import df.sparkSession.implicits._
    val pts = df.select(col(key).cast("long").as("key"),
        col(x).cast("double").as("x"), col(y).cast("double").as("y"))
      .as[(Long, Double, Double)]
    pts
      .repartition(col("key"))
      .sortWithinPartitions(col("key"), col("x"), col("y"))
      .mapPartitions { it =>
        val buf = it.buffered
        new Iterator[Picked] {
          private var cur: Iterator[Picked] = Iterator.empty
          private def advance(): Unit =
            while (!cur.hasNext && buf.hasNext) {
              val k = buf.head._1
              val series = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
              while (buf.hasNext && buf.head._1 == k) {
                val p = buf.next(); series += ((p._2, p._3))
              }
              cur = select(series, threshold).iterator.zipWithIndex.map {
                case ((px, py), i) => Picked(k, i, px, py)
              }
            }
          def hasNext: Boolean = { advance(); cur.hasNext }
          def next(): Picked = { advance(); cur.next() }
        }
      }
  }

  /** The LTTB pick over one in-memory series (sorted by x). */
  private[operators] def select(
      s: scala.collection.Seq[(Double, Double)],
      threshold: Int): IndexedSeq[(Double, Double)] = {
    val n = s.length
    if (n <= threshold) return s.toIndexedSeq
    val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    out += s.head
    val buckets = threshold - 2
    // interior points s(1..n-2) split into `buckets` even ranges
    def lo(b: Int) = 1 + ((n - 2).toLong * b / buckets).toInt
    var a = s.head // last selected anchor
    var b = 0
    while (b < buckets) {
      // average of the NEXT bucket (or the final point after the last)
      val (cLo, cHi) = if (b + 1 < buckets) (lo(b + 1), lo(b + 2)) else (n - 1, n)
      var cx = 0.0; var cy = 0.0
      var i = cLo
      while (i < cHi) { cx += s(i)._1; cy += s(i)._2; i += 1 }
      cx /= (cHi - cLo); cy /= (cHi - cLo)
      // max-area point of THIS bucket against (anchor, next-avg)
      var best = lo(b); var bestArea = -1.0
      i = lo(b)
      while (i < lo(b + 1)) {
        val area = math.abs((a._1 - cx) * (s(i)._2 - a._2) -
          (a._1 - s(i)._1) * (cy - a._2))
        if (area > bestArea) { bestArea = area; best = i }
        i += 1
      }
      a = s(best)
      out += a
      b += 1
    }
    out += s.last
    out.toIndexedSeq
  }
}
