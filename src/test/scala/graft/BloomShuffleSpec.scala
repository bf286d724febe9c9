package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.BloomExprs
import graft.model.{Tables, Views}
import graft.operators.{BloomPrune, Leaderboard, Sampling}

class BloomShuffleSpec extends SparkSpec {

  private def sameRows(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("bloom: inserted keys are always found (no false negatives)") {
    val keys = spark.range(0, 5000).select(col("id"))
    val sketch = keys.agg(
      BloomExprs.bloom_agg(xxhash64(col("id")), 1 << 16, 7).as("bf"))
    val missed = keys.crossJoin(sketch)
      .filter(!BloomExprs.might_contain(col("bf"), xxhash64(col("id"))))
    assert(missed.isEmpty)
  }

  test("bloom: fp rate at ~10 bits/key stays near the 1% design point") {
    val keys = spark.range(0, 5000).select(col("id"))
    val sketch = keys.agg(
      BloomExprs.bloom_agg(xxhash64(col("id")), 1 << 16, 7).as("bf"))
    val absent = spark.range(1000000, 1020000).select(col("id"))
    val fp = absent.crossJoin(sketch)
      .filter(BloomExprs.might_contain(col("bf"), xxhash64(col("id"))))
      .count()
    assert(fp < 20000 * 0.05, s"fp=$fp of 20000 at 65536 bits / 5000 keys")
  }

  test("prunedJoin is row-identical to the plain join") {
    val w = Leaderboard.walletTrades(Views.trades(spark, sf))
    val hot = w.groupBy(col("wallet")).agg(count(lit(1)).as("trades"))
      .filter(col("trades") >= 10)
    // auto-sized path: the bounded approx-count action picks the bits
    val pruned = BloomPrune.prunedJoin(w, hot, "wallet")
    val plain = w.join(hot, Seq("wallet"))
    assert(sameRows(pruned.select(plain.columns.map(col): _*), plain))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("graft_might_contain"),
      "probe must survive into the physical plan")
    // caller-hint path: identical rows with an explicit cardinality
    val hinted = BloomPrune.prunedJoinSized(w, hot, "wallet",
      expectedKeys = 100000L)
    assert(sameRows(hinted.select(plain.columns.map(col): _*), plain))
  }

  test("auto-sizing memoizes: two constructions over one dim, one action") {
    val w = Leaderboard.walletTrades(Views.trades(spark, sf))
    // a dim plan not built anywhere else in the suite, so the memo
    // entry is provably created by THIS test's first construction
    val hot = w.groupBy(col("wallet")).agg(count(lit(1)).as("trades"))
      .filter(col("trades") >= 17)
    val before = Views.planStatMisses.get()
    BloomPrune.prunedJoin(w, hot, "wallet")
    BloomPrune.prunedJoin(w, hot, "wallet")
    val misses = Views.planStatMisses.get() - before
    assert(misses <= 1,
      s"expected at most one sizing action for two constructions, got $misses")
    // and the memo returns the same hint both times
    assert(BloomPrune.dimKeyCount(hot, "wallet") ==
      BloomPrune.dimKeyCount(hot, "wallet"))
  }

  test("sketch sizing tracks the dim cardinality at ~10 bits/key") {
    // word-aligned, clamped, proportional in between
    assert(BloomPrune.sizeBits(0) == (1 << 13))
    assert(BloomPrune.sizeBits(100) == (1 << 13),
      "small dims clamp to the 1 KiB floor")
    assert(BloomPrune.sizeBits(100000) == 1000000,
      "10 bits/key, already word-aligned here")
    assert(BloomPrune.sizeBits(100001) == 1000064,
      "10 bits/key rounded up to a 64-bit word")
    assert(BloomPrune.sizeBits(Long.MaxValue / 4) == (1 << 27),
      "huge dims clamp to the 16 MiB broadcast ceiling")
    assert(BloomPrune.sizeBits(123457) % 64 == 0)
  }

  test("shardShuffle: a permutation — every key exactly once, stable") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"))
    val a = Sampling.shardShuffle(docs, col("doc_id"), "epoch1", 16)
    // exactly one (shard, pos) per doc, pos dense per shard
    assert(a.count() == docs.count())
    assert(a.select(col("doc_id")).distinct().count() == docs.count())
    val dense = a.groupBy(col("shard"))
      .agg(count(lit(1)).as("n"), max(col("pos")).as("mx"))
      .filter(col("n") =!= col("mx"))
    assert(dense.isEmpty, "pos must be dense 1..n within each shard")
    // reproducible: same seed, same addresses
    assert(sameRows(a, Sampling.shardShuffle(docs, col("doc_id"), "epoch1", 16)))
    // a different seed is a different permutation
    val b = Sampling.shardShuffle(docs, col("doc_id"), "epoch2", 16)
    val moved = a.join(b, Seq("doc_id"))
      .filter(a("shard") =!= b("shard") || a("pos") =!= b("pos"))
    assert(moved.count() > 0)
  }
}
