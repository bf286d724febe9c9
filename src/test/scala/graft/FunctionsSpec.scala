package graft

import graft.functions.GraftFunctions
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** SQL registration: the native expressions callable from spark.sql
  * produce the same values as the Column API. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL functions match the Column API") {
    GraftFunctions.register(spark)
    Seq((1L, "the quick brown fox jumps the fox")).toDF("id", "text")
      .createOrReplaceTempView("fx_docs")
    val viaSql = spark.sql(
      """SELECT graft_simhash64(transform(graft_word_ngrams(text, 2), s -> xxhash64(s))) AS sh,
        |       size(graft_word_ngrams(text, 2)) AS n,
        |       graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
        |       size(graft_minhash_sig(array(1L, 2L, 3L), 8)) AS mh,
        |       size(graft_lsh_postings(array(0.6d, 0.8d), 4, 3)) AS lp
        |FROM fx_docs""".stripMargin).head()
    val viaCol = Seq((1L, "the quick brown fox jumps the fox")).toDF("id", "text")
      .select(Dedup.simhash64(Dedup.wordNgrams($"text", 2)).as("sh"),
        size(Dedup.wordNgrams($"text", 2)).as("n")).head()
    assert(viaSql.getLong(0) == viaCol.getLong(0))
    assert(viaSql.getInt(1) == viaCol.getInt(1))
    assert(viaSql.getDouble(2) == 11.0)
    assert(viaSql.getInt(3) == 8)
    assert(viaSql.getInt(4) == 3)
  }

  test("count-min: never undercounts, exact when collision-free, merge-invariant") {
    import graft.functions.CountMinExprs
    // known multiset: a×5, b×3, c×1 — width 64 ≫ 3 keys, so estimates
    // are exact unless KM positions collide in every row (prob ~0)
    val items = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")
    val truth = Map("a" -> 5L, "b" -> 3L, "c" -> 1L)
    for (parts <- Seq(1, 7)) {
      val df = spark.sparkContext.parallelize(items, parts).toDF("w")
      val sk = df.agg(CountMinExprs.cm_agg(xxhash64($"w"), 4, 64).as("sk"))
      val est = Seq("a", "b", "c").toDF("w")
        .crossJoin(sk)
        .select($"w", CountMinExprs.cm_estimate($"sk", xxhash64($"w")).as("e"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      truth.foreach { case (w, t) =>
        assert(est(w) >= t, s"parts=$parts $w: ${est(w)} < $t")
        assert(est(w) == t, s"parts=$parts $w: collision at width 64 is ~impossible")
      }
    }
    // absent key estimates 0 on this tiny sketch (no collisions)
    val sk1 = items.toDF("w")
      .agg(CountMinExprs.cm_agg(xxhash64($"w"), 4, 64).as("sk"))
    val absent = Seq("zzz").toDF("w").crossJoin(sk1)
      .select(CountMinExprs.cm_estimate($"sk", xxhash64($"w"))).head().getLong(0)
    assert(absent == 0L)
    // adversarially narrow sketch: width 2, 60 distinct keys → heavy
    // collisions by construction; never-undercount must STILL hold for
    // every key, and no estimate can exceed N
    val many = (1 to 60).flatMap(i => Seq.fill(i % 5 + 1)(s"k$i"))
    val skN = many.toDF("w")
      .agg(CountMinExprs.cm_agg(xxhash64($"w"), 3, 2).as("sk"))
    val trueN = many.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val estN = many.distinct.toDF("w").crossJoin(skN)
      .select($"w", CountMinExprs.cm_estimate($"sk", xxhash64($"w")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    trueN.foreach { case (k, t) =>
      assert(estN(k) >= t, s"$k undercounted: ${estN(k)} < $t")
      assert(estN(k) <= many.size.toLong, s"$k exceeds N")
    }
  }

  test("theta sketches: exact set algebra below k, partitioning-invariant") {
    import graft.functions.ThetaExprs
    // A = 0..999, B = 500..1499 → |A∩B| = 500, |A∪B| = 1500,
    // |A\B| = 500. lgK 12 (k = 4096) ≫ 1500 distinct keys, so the
    // sketches are in EXACT mode and every estimate is the true count.
    for (parts <- Seq(1, 8)) {
      val a = spark.sparkContext.parallelize(0L until 1000L, parts).toDF("k")
        .agg(ThetaExprs.theta_agg(col("k"), 12).as("sk"))
      val b = spark.sparkContext.parallelize(500L until 1500L, parts).toDF("k")
        .agg(ThetaExprs.theta_agg(col("k"), 12).as("sk"))
      val r = a.select(col("sk").as("ska")).crossJoin(b.select(col("sk").as("skb")))
        .select(
          ThetaExprs.theta_intersect_est(col("ska"), col("skb")).as("i"),
          ThetaExprs.theta_union_est(col("ska"), col("skb")).as("u"),
          ThetaExprs.theta_diff_est(col("ska"), col("skb")).as("d"))
        .head()
      assert(r.getDouble(0) == 500.0, s"intersect, parts=$parts")
      assert(r.getDouble(1) == 1500.0, s"union, parts=$parts")
      assert(r.getDouble(2) == 500.0, s"diff, parts=$parts")
    }
  }

  test("theta SQL functions match the Column API") {
    GraftFunctions.register(spark)
    spark.sparkContext.parallelize(0L until 100L, 4).toDF("k")
      .createOrReplaceTempView("fx_theta")
    val viaSql = spark.sql(
      """SELECT graft_theta_intersect(sk, sk) AS i,
        |       graft_theta_union(sk, sk) AS u,
        |       graft_theta_diff(sk, sk) AS d
        |FROM (SELECT graft_theta_agg(k, 12) AS sk FROM fx_theta)""".stripMargin)
      .head()
    assert(viaSql.getDouble(0) == 100.0)
    assert(viaSql.getDouble(1) == 100.0)
    assert(viaSql.getDouble(2) == 0.0)
  }

  test("KLL states: exact-mode quantiles equal true order stats, agg-then-merge ≡ direct, partitioning-invariant") {
    import graft.functions.KllExprs._
    // 99 values per group, k=200 → exact mode: getQuantile(q) is the
    // true inclusive order statistic regardless of layout or whether
    // the values flow through per-day states first
    val rows = for (g <- Seq("a", "b"); i <- 1 to 99)
      yield (g, i % 7, (if (g == "a") i else 1000 - i).toDouble)
    for (parts <- Seq(1, 5)) {
      val df = spark.sparkContext.parallelize(rows, parts).toDF("g", "day", "x")
      val direct = df.groupBy($"g").agg(kll_agg($"x", 200).as("st"))
        .select($"g", kll_quantile($"st", lit(0.5)).as("m"),
          kll_quantile($"st", lit(0.9)).as("p90"))
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      val viaStates = df.groupBy($"g", $"day").agg(kll_agg($"x", 200).as("st"))
        .groupBy($"g").agg(kll_merge($"st", 200).as("st"))
        .select($"g", kll_quantile($"st", lit(0.5)).as("m"),
          kll_quantile($"st", lit(0.9)).as("p90"))
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      assert(direct("a") == ((50.0, 90.0)), s"parts=$parts direct=$direct")
      assert(direct("b") == ((950.0, 990.0)), s"parts=$parts direct=$direct")
      assert(viaStates == direct, s"parts=$parts merge path diverged")
    }
  }

  test("KLL SQL functions match the Column API; estimation-mode rank error within bound") {
    import graft.functions.KllExprs._
    GraftFunctions.register(spark)
    val n = 20000 // >> k=200 → estimation mode
    spark.sparkContext.parallelize(1 to n, 8).map(_.toDouble).toDF("x")
      .createOrReplaceTempView("fx_kll")
    val viaSql = spark.sql(
      """SELECT graft_kll_quantile(graft_kll_merge(st, 200), CAST(0.5 AS DOUBLE)) AS m
        |FROM (SELECT graft_kll_agg(x, 200) AS st FROM fx_kll GROUP BY CAST(x AS INT) % 13)"""
        .stripMargin).head().getDouble(0)
    // normalized rank error for k=200 is ~1.65%; assert 5%
    assert(math.abs(viaSql / n - 0.5) < 0.05, s"median estimate $viaSql")
    val viaApi = spark.table("fx_kll")
      .agg(kll_agg($"x", 200).as("st"))
      .select(kll_quantile($"st", lit(0.25)).as("q")).head().getDouble(0)
    assert(math.abs(viaApi / n - 0.25) < 0.05, s"p25 estimate $viaApi")
  }

  test("uniqUpTo: exact below N, saturates at N+1, sticky across merges") {
    import graft.functions.UniqUpTo.uniq_up_to
    // group a: 30 distinct ids (> N=10 → 11); group b: 4 distinct (< N → 4);
    // duplicates must not count twice
    val rows = (1L to 30L).flatMap(i => Seq(("a", i), ("a", i))) ++
      Seq(("b", 1L), ("b", 2L), ("b", 3L), ("b", 4L), ("b", 4L))
    for (parts <- Seq(1, 7)) {
      val df = spark.sparkContext.parallelize(rows, parts).toDF("g", "id")
      val got = df.groupBy($"g").agg(uniq_up_to($"id", 10).as("u"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == Map("a" -> 11L, "b" -> 4L), s"parts=$parts got=$got")
    }
    // sql registration parity
    rows.toDF("g", "id").createOrReplaceTempView("fx_uuto")
    val viaSql = spark.sql(
      "SELECT g, graft_uniq_up_to(id, 10) FROM fx_uuto GROUP BY g ORDER BY g")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaSql == Map("a" -> 11L, "b" -> 4L))
  }
}
