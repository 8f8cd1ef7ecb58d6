package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids(n: Int) =
    (0L until n.toLong).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "stratum")

  test("sampling is deterministic and near the requested rate") {
    val df = ids(2000)
    val once = Sampling.stratifiedSample(
      df, "stratum", "id", Map.empty, 0.3, "s1")
      .select("id").as[Long].collect().toSet
    val twice = Sampling.stratifiedSample(
      df, "stratum", "id", Map.empty, 0.3, "s1")
      .select("id").as[Long].collect().toSet
    assert(once == twice)
    // md5 buckets are uniform; 2000 rows at 0.3 -> ~600 +/- noise
    assert(once.size > 500 && once.size < 700, s"got ${once.size}")
  }

  test("per-stratum rates apply independently; 0 and 1 are exact") {
    val out = Sampling.stratifiedSample(
      ids(1000), "stratum", "id", Map("a" -> 1.0, "b" -> 0.0), 0.5, "s1")
      .groupBy("stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("a") == 500L) // every even id kept
    assert(!out.contains("b")) // every odd id dropped
  }

  test("samples are stable under corpus growth (subset property)") {
    val small = Sampling.stratifiedSample(
      ids(500), "stratum", "id", Map.empty, 0.2, "s1")
      .select("id").as[Long].collect().toSet
    val big = Sampling.stratifiedSample(
      ids(1000), "stratum", "id", Map.empty, 0.2, "s1")
      .select("id").as[Long].collect().toSet
    assert(small.subsetOf(big))
  }

  test("different salts draw (nearly) independent samples") {
    val df = ids(2000)
    def sample(salt: String) = Sampling.stratifiedSample(
      df, "stratum", "id", Map.empty, 0.5, salt)
      .select("id").as[Long].collect().toSet
    val s1 = sample("s1")
    val s2 = sample("s2")
    val overlap = (s1 & s2).size.toDouble / 2000
    // independent 0.5 samples intersect at ~0.25
    assert(overlap > 0.15 && overlap < 0.35, s"overlap $overlap")
  }

  test("out-of-range rates are rejected") {
    intercept[IllegalArgumentException] {
      Sampling.stratifiedSample(
        ids(10), "stratum", "id", Map("a" -> 1.5), 0.5, "s1")
    }
  }

  test("sampling plans as a pure narrow filter (no shuffle)") {
    val plan = Sampling.stratifiedSample(
      ids(100), "stratum", "id", Map("a" -> 0.5), 0.1, "s1")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      "stratified sampling must not shuffle")
  }

  test("sampleExactK: exactly k smallest-hash rows per stratum, matching " +
    "the window-rank formulation, via a bounded aggregate (no Window, " +
    "no stratum-wide sort)") {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextFns
    val df = ids(300)
    val out = Sampling.sampleExactK(df, "stratum", "id", 10, "s1")
    val got = out.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // reference: full window-rank over the same hash
    val ref = df
      .withColumn("skey", TextFns.hexHash32(
        concat(col("id").cast("string"), lit("|s1"))))
      .withColumn("rnk", row_number().over(Window.partitionBy(col("stratum"))
        .orderBy(col("skey"), col("id"))).cast("long"))
      .where(col("rnk") <= 10)
      .select(col("stratum"), col("id"), col("skey"), col("rnk"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.sorted.toSeq == ref.sorted.toSeq)
    assert(got.count(_._1 == "a") == 10 && got.count(_._1 == "b") == 10)
    // k larger than a stratum degrades to the whole stratum
    assert(Sampling.sampleExactK(df, "stratum", "id", 1000, "s1")
      .count() == 300)
    // plan shape: the selection is the bounded ObjectHashAggregate,
    // never a Window (which would sort every stratum end to end)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("Window"), s"exact-k must not window-sort:\n$plan")
    // contract guards
    intercept[IllegalArgumentException] {
      Sampling.sampleExactK(df, "stratum", "id", 0, "s1")
    }
    intercept[IllegalArgumentException] {
      Sampling.sampleExactK(
        df.withColumn("id", col("id").cast("string")),
        "stratum", "id", 5, "s1")
    }
  }

  test("shuffleShards: complete, contiguous per-shard positions, partition-invariant") {
    val df = ids(500)
    def run(parts: Int) = Sampling
      .shuffleShards(df.repartition(parts), "id", "ep1", 4)
      .select(col("id"), col("shard"), col("pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val out = run(1)
    assert(out.size == 500) // every row exactly once
    assert(out.map(_._2).forall(s => s >= 0 && s < 4))
    // positions are 1..|shard| contiguous within each shard
    out.groupBy(_._2).foreach { case (s, rows) =>
      assert(rows.map(_._3).toSeq.sorted == (1L to rows.size).toSeq,
        s"shard $s positions not contiguous")
    }
    assert(out == run(7)) // hash order, not partition order
    // a different salt draws a different epoch permutation
    val other = Sampling.shuffleShards(df, "id", "ep2", 4)
      .select(col("id"), col("shard"), col("pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(other != out)
  }

  test("mixToWeights: binding stratum rides at rate 1.0, others derive") {
    // 100 docs each of a/b/c plus an UNWEIGHTED stratum d
    val df = (0L until 400L)
      .map(i => (i, Seq("a", "b", "c", "d")((i % 4).toInt)))
      .toDF("id", "stratum")
    val out = Sampling.mixToWeights(df, "stratum", "id",
      Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2), "mx1")
      .collect()
      .map(r => r.getAs[String]("stratum") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Double]("target_w"),
          r.getAs[Long]("rate_buckets"), r.getAs[Long]("n_selected"))))
      .toMap
    // N* = min(100/.5, 100/.3, 100/.2) = 200 -> rates 1.0 / 0.6 / 0.4
    assert(out.keySet == Set("a", "b", "c")) // d excluded (weight 0)
    assert(out("a")._3 == 1000L && out("b")._3 == 600L &&
      out("c")._3 == 400L)
    assert(out("a")._4 == 100L) // rate-1.0 stratum keeps everything
    // hash-rate strata land near the target (uniform md5 buckets)
    assert(out("b")._4 > 40L && out("b")._4 < 80L)
    assert(out("c")._4 > 25L && out("c")._4 < 55L)
    // achieved fractions sum to 1 over the selected corpus
    val fracs = Sampling.mixToWeights(df, "stratum", "id",
      Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2), "mx1")
      .agg(sum(col("achieved_frac"))).head().getDouble(0)
    assert(math.abs(fracs - 1.0) < 1e-4)
  }

  test("mixToWeights rejects empty and non-positive weights") {
    val df = Seq((1L, "a")).toDF("id", "stratum")
    intercept[IllegalArgumentException] {
      Sampling.mixToWeights(df, "stratum", "id", Map.empty, "s")
    }
    intercept[IllegalArgumentException] {
      Sampling.mixToWeights(df, "stratum", "id", Map("a" -> 0.0), "s")
    }
  }

  test("dsirLogWeights ranks target-like raw docs above dissimilar ones") {
    val target = Seq(
      (100L, "spark sql table scan join merge window"),
      (101L, "table join window sort spark sql scan"),
      (102L, "sql window merge table spark join scan"))
      .toDF("doc_id", "text")
    val raw = Seq(
      (1L, "spark sql table join window scan"), // target-like
      (2L, "violet meadow kitten sunrise bakery ribbon"), // unlike
      (3L, "spark sql table join violet meadow")) // mixed
      .toDF("doc_id", "text")
    val out = Sampling.dsirLogWeights(target, raw, "doc_id", "text")
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_feats"), r.getAs[Double]("dsir_logw")))
      .toMap
    // 6 tokens → 6 unigrams + 5 bigrams
    assert(out(1L)._1 == 11L && out(2L)._1 == 11L && out(3L)._1 == 11L)
    // importance ordering: target-like > mixed > dissimilar
    assert(out(1L)._2 > out(3L)._2, s"target-like ≤ mixed: $out")
    assert(out(3L)._2 > out(2L)._2, s"mixed ≤ dissimilar: $out")
  }

  test("dsirLogWeights rejects a non-positive bucket count") {
    val d = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Sampling.dsirLogWeights(d, d, "doc_id", "text", buckets = 0)
    }
  }

  test("mixTemperature at T=2: the smallest stratum binds at rate " +
    "1.0 and larger strata downsample at sqrt(c_min/c)") {
    // a = 100 docs, b = 400: w = (10, 20), N* = min(100/10, 400/20)
    // = 10 → rate_a = 1.0 (1000 buckets), rate_b = 0.5 (500 buckets)
    val df = ((1 to 100).map(i => (i.toLong, "a")) ++
      (101 to 500).map(i => (i.toLong, "b"))).toDF("id", "s")
    val out = Sampling.mixTemperature(df, "s", "id", 2.0, "t-v1")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getAs[Long]("rate_buckets") == 1000L)
    assert(out("b").getAs[Long]("rate_buckets") == 500L)
    // display weights normalize the raw sqrt weights: 10/30, 20/30
    assert(out("a").getAs[Double]("target_w") == 0.333333)
    assert(out("b").getAs[Double]("target_w") == 0.666667)
    // rate 1.0 keeps the binding stratum whole; b halves (hash split
    // is deterministic but not exactly 50/50 — envelope, not pin)
    assert(out("a").getAs[Long]("n_selected") == 100L)
    val nb = out("b").getAs[Long]("n_selected")
    assert(nb > 150 && nb < 250, s"b selected $nb of 400 at rate 0.5")
    intercept[IllegalArgumentException] {
      Sampling.mixTemperature(df, "s", "id", 0.0, "t-v1")
    }
  }
}
