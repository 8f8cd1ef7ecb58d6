package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bm25, Fusion, VectorSearch}

class SearchSpec extends SparkSpec {
  import spark.implicits._

  test("denseTopK returns nearest vectors by cosine, rounded, id-tiebroken") {
    val cands = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q = Seq(Tuple1(Array(1.0f, 0.0f))).toDF("qe")
    val out = VectorSearch.denseTopK(cands, q, "vec_id", "embedding", "qe", 2)
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L, 2L))
  }

  test("knnJoin gives each query its own ranked neighbor list") {
    val cands = Seq(
      (10L, Array(1.0f, 0.0f)), (11L, Array(0.0f, 1.0f)),
      (12L, Array(0.7f, 0.7f))
    ).toDF("cid", "ce")
    val qs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f))
    ).toDF("qid", "qe")
    val out = VectorSearch.knnJoin(cands, qs, "cid", "ce", "qid", "qe", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(out.filter(_._1 == 1L).sortBy(_._3).map(_._2).toSeq == Seq(10L, 12L))
    assert(out.filter(_._1 == 2L).sortBy(_._3).map(_._2).toSeq == Seq(11L, 12L))
  }

  test("bm25 scores rarer terms higher at equal tf") {
    // 'rare' appears in 1 of 4 docs; 'common' in all 4
    val docs = Seq(
      (1L, "rare common alpha beta"), (2L, "common alpha beta gamma"),
      (3L, "common beta gamma delta"), (4L, "common gamma delta alpha")
    ).toDF("doc_id", "text")
    val s = Bm25.score(docs, "doc_id", "text", Seq("rare", "common"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s(1L) > s(2L)) // doc 1 has the rare term
  }

  test("rrf fuses two rankings with the 0.6/0.4 reference weights") {
    val dense = Seq((101L, 1L), (102L, 2L)).toDF("doc_id", "rank")
    val sparse = Seq((102L, 1L), (103L, 2L)).toDF("doc_id", "rank")
    val out = Fusion.rrf(dense, sparse, "doc_id", "rank", 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // 102 appears in both lists -> highest fused score
    assert(out(102L) > out(101L) && out(102L) > out(103L))
    // 102: dense rank 2, sparse rank 1
    val expected102 = BigDecimal(0.6 / 62 + 0.4 / 61)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out(102L) - expected102) < 1e-9)
  }

  test("annIvf finds the same top results as brute force when probing enough cells") {
    val vecs = (0 until 40).map { i =>
      val angle = (i % 4) * math.Pi / 2 + (i / 40.0) * 0.1
      (i.toLong, Array(math.cos(angle).toFloat, math.sin(angle).toFloat), i % 4)
    }.toDF("vec_id", "embedding", "label")
    val cents = VectorSearch.centroidArrays(vecs, "label", "embedding")
    val q = vecs.where(col("vec_id") === 0).select(col("embedding").as("qe"))
    val ivf = VectorSearch.annIvf(vecs, q, cents, "vec_id", "embedding", "qe",
      "label", nprobe = 4, k = 5).collect().map(_.getLong(0)).toSet
    val brute = VectorSearch.denseTopK(vecs, q, "vec_id", "embedding", "qe", 5)
      .collect().map(_.getLong(0)).toSet
    assert(ivf == brute) // nprobe = all cells -> exact
  }

  test("zero-norm vectors are excluded, never top-ranked or crashing") {
    val cands = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 0.0f)) // zero norm -> NaN cosine
    ).toDF("vec_id", "embedding")
    val q = Seq(Tuple1(Array(1.0f, 0.0f))).toDF("qe")
    val top = VectorSearch.denseTopK(cands, q, "vec_id", "embedding", "qe", 3)
      .collect().map(_.getLong(0)).toSeq
    assert(top == Seq(1L, 2L)) // 3 dropped, not first
    val qs = Seq((7L, Array(1.0f, 0.0f))).toDF("qid", "qe")
    val knn = VectorSearch.knnJoin(
      cands.toDF("cid", "ce"), qs, "cid", "ce", "qid", "qe", 3)
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(knn.map(_._1).toSeq == Seq(1L, 2L)) // deterministic, no NaN
  }

  test("lloydCentroids recovers well-separated direction clusters") {
    // 3 tight direction bundles; ids interleaved so init picks one
    // seed per bundle (ids 0, 1, 2 point in 3 different directions)
    val dirs = Seq((1.0, 0.0), (0.0, 1.0), (-1.0, 0.0))
    val vecs = (0 until 30).map { i =>
      val (dx, dy) = dirs(i % 3)
      val wob = 0.05 * ((i / 3) % 5 - 2)
      (i.toLong, Array((dx + wob).toFloat, (dy + wob).toFloat))
    }.toDF("vec_id", "embedding")
    val cents = VectorSearch.lloydCentroids(vecs, "vec_id", "embedding", 3, 3)
    assert(cents.count() == 3)
    val assigned = VectorSearch.assignCells(vecs, cents, "vec_id", "embedding", "cell")
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("cell")).toMap
    // members of the same bundle land in the same cell
    for (g <- 0 until 3) {
      val cells = (g until 30 by 3).map(assigned(_)).toSet
      assert(cells.size == 1, s"bundle $g split across $cells")
    }
    // and different bundles in different cells
    assert((0 until 3).map(assigned(_)).toSet.size == 3)
  }

  test("annIvf assignment stays narrow: no Window in the physical plan") {
    // regression guard for the 100 TB path — centroid assignment must
    // be a per-row fold over the broadcast centroid array, never a
    // crossJoin + row_number window (which exchanges |corpus|·K rows)
    val vecs = (0 until 20).map { i =>
      (i.toLong, Array((i % 3).toFloat, 1.0f), i % 3)
    }.toDF("vec_id", "embedding", "label")
    val cents = VectorSearch.centroidArrays(vecs, "label", "embedding")
    val q = vecs.where(col("vec_id") === 0).select(col("embedding").as("qe"))
    val plan = VectorSearch.annIvf(vecs, q, cents, "vec_id", "embedding", "qe",
      "label", nprobe = 2, k = 3).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"))
  }

  test("annIvfProbe over a persisted cell-partitioned index: identical " +
    "results to annIvf, zero shuffle, un-probed cells partition-pruned") {
    // the production regime: assignment ran at ingest, the (id, vec,
    // cnrm, cell) rows live partitioned by cell, the codebook is a
    // persisted k-row table — a query probes without re-assigning or
    // re-training anything
    val vecs = (0 until 40).map { i =>
      val angle = (i % 4) * math.Pi / 2 + (i / 40.0) * 0.1
      (i.toLong, Array(math.cos(angle).toFloat, math.sin(angle).toFloat), i % 4)
    }.toDF("vec_id", "embedding", "label")
    val cents = VectorSearch.centroidArrays(vecs, "label", "embedding")
    val q = vecs.where(col("vec_id") === 0).select(col("embedding").as("qe"))
    val assigned = VectorSearch.assignCells(
      vecs.select(col("vec_id"), col("embedding")), cents,
      "vec_id", "embedding", "label")
    val tmp = java.nio.file.Files.createTempDirectory("ivf_idx")
    val (idxDir, cDir) = (s"$tmp/index", s"$tmp/codebook")
    graft.sources.Corpus.writePartitioned(assigned, idxDir, Seq("cell"))
    cents.write.parquet(cDir)
    val probe = VectorSearch.annIvfProbe(
      spark.read.parquet(idxDir), q, spark.read.parquet(cDir),
      "vec_id", "embedding", "qe", "label", nprobe = 2, k = 5)
    val direct = VectorSearch.annIvf(vecs, q, cents,
      "vec_id", "embedding", "qe", "label", nprobe = 2, k = 5)
    assert(probe.collect().toSeq == direct.collect().toSeq)
    val plan = probe.queryExecution.executedPlan.toString
    // the index side must not shuffle (the query is the broadcast
    // side; top-k is TakeOrderedAndProject) ...
    assert(!plan.contains("ShuffleExchange") &&
      !plan.contains("Exchange hashpartitioning"), plan)
    // ... nor re-assign (the fold over the broadcast centroid array
    // is the INGEST step, absent from the probe plan)
    assert(!plan.contains("aggregate("), plan)
    // the two-phase probe's static cell list is a PARTITION filter:
    // un-probed cells' files are skipped at listing time — a query
    // reads nprobe/K of the lake, not all of it
    val pf = plan.linesIterator.find(_.contains("PartitionFilters"))
    assert(pf.exists(l => l.contains("cell") && l.contains("IN (")),
      s"no static cell partition filter:\n$plan")
  }

  test("mmrRerank alternates clusters; lambda=1 degenerates to top-k") {
    // query between two tight clusters (A: ids 1,2; B: ids 10,11),
    // leaning toward A — pure relevance ranks (2, 1, 11); MMR at
    // lambda .5 must interleave a B pick at step 2 (within-cluster
    // sims ~0.999 crush the second same-cluster pick's score)
    val cands = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)), (2L, Array(0.98f, 0.05f, 0.0f)),
      (10L, Array(0.0f, 1.0f, 0.0f)), (11L, Array(0.05f, 0.98f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q = Seq(Tuple1(Array(0.8f, 0.6f, 0.0f))).toDF("qe")
    val mmr = VectorSearch.mmrRerank(cands, q, "vec_id", "embedding",
      "qe", candK = 4, k = 3, lambda = 0.5)
      .orderBy(col("pick_order"))
      .collect().map(_.getLong(0)).toSeq
    assert(mmr.head == 2L) // first pick is pure relevance
    assert(mmr(1) == 10L, s"step 2 should cross clusters: $mmr")
    // lambda = 1.0: no diversity penalty -> plain relevance order
    val pure = VectorSearch.mmrRerank(cands, q, "vec_id", "embedding",
      "qe", candK = 4, k = 3, lambda = 1.0)
      .orderBy(col("pick_order"))
      .collect().map(_.getLong(0)).toSeq
    assert(pure == Seq(2L, 1L, 11L))
    // guards refuse rather than silently collecting a corpus
    intercept[IllegalArgumentException] {
      VectorSearch.mmrRerank(cands, q, "vec_id", "embedding", "qe",
        candK = 1000, k = 3, lambda = 0.5)
    }
    intercept[IllegalArgumentException] {
      VectorSearch.mmrRerank(cands, q, "vec_id", "embedding", "qe",
        candK = 5, k = 3, lambda = 1.5)
    }
  }

  test("mmrRerank accepts array<double> embeddings like the rest of " +
    "the vector surface") {
    // same geometry as the float spec above, as doubles — the
    // collect-side read must go through asDouble, not a Float cast
    val cands = Seq(
      (1L, Array(1.0, 0.0, 0.0)), (2L, Array(0.98, 0.05, 0.0)),
      (10L, Array(0.0, 1.0, 0.0)), (11L, Array(0.05, 0.98, 0.0))
    ).toDF("vec_id", "embedding")
    val q = Seq(Tuple1(Array(0.8, 0.6, 0.0))).toDF("qe")
    val mmr = VectorSearch.mmrRerank(cands, q, "vec_id", "embedding",
      "qe", candK = 4, k = 3, lambda = 0.5)
      .orderBy(col("pick_order"))
      .collect().map(_.getLong(0)).toSeq
    assert(mmr.head == 2L && mmr(1) == 10L, s"unexpected order: $mmr")
  }

  test("embHealth counts zero/NaN/null vectors per group and keeps " +
    "norm stats over healthy rows only") {
    val rows = Seq(
      (1L, Array(3.0f, 4.0f), "a"), // norm 5, healthy
      (2L, Array(0.0f, 0.0f), "a"), // zero vector
      (3L, Array(Float.NaN, 1.0f), "a"), // NaN component
      (4L, Array(1.0f, 0.0f), "b") // norm 1, healthy
    ).toDF("vec_id", "embedding", "label")
      // null component (exists(isnan) alone returns NULL here — the
      // r14-advice silent-drop row) and a NULL vector outright
      .unionByName(Seq((5L, "a"), (6L, "b")).toDF("vec_id", "label")
        .withColumn("embedding",
          when(col("vec_id") === 5L,
            array(lit(null).cast("float"), lit(2.0f)))))
      .select("vec_id", "embedding", "label")
    val out = VectorSearch.embHealth(rows, "vec_id", "embedding", "label")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("n_vecs") == 4L)
    assert(a.getAs[Long]("n_zero") == 1L && a.getAs[Long]("n_nan") == 1L)
    assert(a.getAs[Long]("n_null") == 1L)
    assert(a.getAs[Long]("dim_min") == 2L && a.getAs[Long]("dim_max") == 2L)
    // the zero, NaN, and null rows must NOT drag the norm stats:
    // only the healthy (3,4) vector contributes
    assert(a.getAs[Double]("avg_norm") == 5.0)
    assert(a.getAs[Double]("min_norm") == 5.0)
    assert(a.getAs[Double]("max_norm") == 5.0)
    val b = out("b")
    assert(b.getAs[Long]("n_vecs") == 2L)
    assert(b.getAs[Long]("n_zero") == 0L && b.getAs[Long]("n_nan") == 0L)
    assert(b.getAs[Long]("n_null") == 1L) // the NULL-vector row
    assert(b.getAs[Double]("avg_norm") == 1.0)
    // every row lands in exactly one class: healthy = n_vecs - others
    Seq(a, b).foreach { r =>
      assert(r.getAs[Long]("n_zero") + r.getAs[Long]("n_nan") +
        r.getAs[Long]("n_null") < r.getAs[Long]("n_vecs"))
    }
  }

  test("embDrift flags centroid rotation between snapshots; identical " +
    "groups read stable at cosine 1.0; zero centroids are degenerate") {
    val oldE = Seq(
      (1L, Array(1.0f, 0.0f), "a"), (2L, Array(1.0f, 0.2f), "a"),
      (3L, Array(0.0f, 1.0f), "b"), (4L, Array(0.2f, 1.0f), "b"),
      (5L, Array(0.0f, 0.0f), "z")
    ).toDF("vec_id", "embedding", "label")
    // a unchanged; b rotated 90°; z stays all-zero (no defined cosine)
    val newE = Seq(
      (1L, Array(1.0f, 0.0f), "a"), (2L, Array(1.0f, 0.2f), "a"),
      (3L, Array(1.0f, 0.0f), "b"), (4L, Array(1.0f, -0.2f), "b"),
      (5L, Array(0.0f, 0.0f), "z")
    ).toDF("vec_id", "embedding", "label")
    val out = VectorSearch
      .embDrift(oldE, newE, "label", "embedding", minCos = 0.9)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getAs[String]("status") == "stable")
    assert(out("a").getAs[Double]("centroid_cos") == 1.0)
    assert(out("a").getAs[Long]("n_old") == 2L &&
      out("a").getAs[Long]("n_new") == 2L)
    assert(out("b").getAs[String]("status") == "drifted")
    assert(out("b").getAs[Double]("centroid_cos") < 0.2)
    assert(out("z").getAs[String]("status") == "degenerate")
    intercept[IllegalArgumentException] {
      VectorSearch.embDrift(oldE, newE, "label", "embedding", 2.0)
    }
  }
}
