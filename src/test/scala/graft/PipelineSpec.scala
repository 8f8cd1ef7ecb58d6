package graft

import org.apache.spark.sql.functions._

import graft.operators.{Chunker, Dedup, Embed, Pack, Sampling, TextAnalysis, VectorSearch}

/** End-to-end integration of the reference's corpus flow on graft
  * operators alone: documents → dedup → chunk → embed → search
  * (reference: corpus_builder.build_collection → text_splitter →
  * embeddings.embed_texts → vector_store search). Every stage is a
  * pure DataFrame transform, so the whole pipeline is one lazy plan.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "spark shuffles data across the cluster for wide joins and aggregations at scale"),
    (1L, "spark shuffles data across the cluster for wide joins and aggregations at scale"),
    (2L, "window functions rank rows within user partitions ordered by event time columns"),
    (3L, "text chunking splits long documents into overlapping character windows with indexes")
  ).toDF("doc_id", "text")

  test("dedup -> chunk -> embed -> search composes as one flow") {
    // 1. drop exact duplicates (keep canonical ids)
    val dupIds = Dedup.exact(docs, "doc_id", "text")
      .select(col("canonical_id")).as[Long].collect().toSet
    val dupes = Dedup.exact(docs, "doc_id", "text")
    val keep = docs.join(
      dupes.select(explode(array(col("canonical_id"))).as("doc_id"))
        .withColumn("is_canon", lit(true)),
      Seq("doc_id"), "left")
      .join(docs.groupBy(md5(col("text")).as("h")).count().where(col("count") > 1)
        .select(col("h")), md5(col("text")) === col("h"), "left")
      .where(col("h").isNull || col("is_canon"))
      .select(col("doc_id"), col("text"))
    assert(keep.count() == 3)          // doc 1 dropped, doc 0 kept
    assert(dupIds == Set(0L))

    // 2. chunk into overlapping windows
    val chunks = Chunker.fixedChunks(keep, "doc_id", "text", 40, 10)
      .withColumn("chunk_id",
        col("doc_id") * 1000 + col("chunk_index"))
    assert(chunks.count() > keep.count()) // docs produced multiple chunks

    // 3. embed every chunk (hashed TF-IDF, 32 dims)
    val vecs = Embed.hashedTfIdf(chunks, "chunk_id", "chunk_text", 32)
    assert(vecs.count() == chunks.count())

    // 4. search: top-3 chunks for doc 0's first chunk vector
    val q = vecs.where(col("chunk_id") === 0L).select(col("tfidf").as("qe"))
    val hits = VectorSearch.denseTopK(
      vecs.where(col("chunk_id") =!= 0L), q, "chunk_id", "tfidf", "qe", 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(hits.length == 3)
    // ranked by rounded cosine, scores valid and non-increasing
    assert(hits.map(_._2).sliding(2).forall(p => p.head >= p.last))
    assert(hits.forall(h => h._2 >= -1.0 && h._2 <= 1.0))
  }

  test("nightly incremental flow: band-index probe -> drop near-dup " +
    "arrivals -> decontaminate -> pack the survivors") {
    import graft.operators.Decontam
    // existing corpus (already deduped) + its persisted band index
    val corpus = Seq(
      (0L, "spark shuffles data across the cluster for wide joins and aggregations at scale"),
      (1L, "window functions rank rows within user partitions ordered by event time columns")
    ).toDF("doc_id", "text")
    val index = Dedup.minhashBandIndex(corpus, "doc_id", "text")
    // tonight's crawl: one near-dup of doc 0, one novel doc, one doc
    // that quotes the eval suite verbatim
    val evalSuite = Seq(
      (900L, "held out benchmark question about gradient descent convergence rates")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "spark shuffles data across the cluster for wide joins and aggregations at large scale"),
      (11L, "an entirely novel crawl document about distributed query optimizers and costs"),
      (12L, "this page copies the held out benchmark question about gradient descent convergence rates verbatim")
    ).toDF("doc_id", "text")

    // 1. incremental dedup: new-vs-corpus only, via the persisted index
    val dupNew = Dedup.incrementalLsh(index, corpus, batch,
      "doc_id", "text", minJaccard = 0.5)
      .select(col("new_id")).as[Long].collect().toSet
    assert(dupNew == Set(10L)) // the near-dup arrival, nothing else
    val fresh = batch.where(!col("doc_id").isin(dupNew.toSeq: _*))

    // 2. decontaminate the survivors against the fixed eval suite
    val contaminated = Decontam.contaminated(
      fresh, evalSuite, "doc_id", "text", 5)
      .where(col("contamination") >= 0.3)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(contaminated == Set(12L))
    val clean = fresh.where(!col("doc_id").isin(contaminated.toSeq: _*))

    // 3. pack what survived into token-budget shards (appended after
    // the corpus, as the nightly would)
    val packed = Pack.packByTokenBudget(
      corpus.unionAll(clean)
        .select(col("doc_id"),
          (length(col("text")) / 4 + 1).cast("long").as("est")),
      "doc_id", "est", budget = 40L)
    val byDoc = packed.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shard_id")).toMap
    assert(byDoc.keySet == Set(0L, 1L, 11L)) // dup + contaminated gone
    assert(byDoc.values.max >= 1L) // the budget actually split shards
  }

  test("training-data prep: scrub -> quality gate -> dedup -> sectioned chunks -> shards") {
    val raw = Seq(
      (0L, "User u#1234 ran the join stage and the merge stage on table t#77 " * 3),
      (1L, "User u#1234 ran the join stage and the merge stage on table t#77 " * 3),
      (2L, "stream processing keeps windowed state per key and emits results " +
        "continuously as watermarks advance across the unbounded input data"),
      (3L, "x"), // too short: the quality gate must drop it
      (4L, "scan the columnar files and prune row groups using min max stats " +
        "so the reader touches only matching byte ranges of the large table")
    ).toDF("doc_id", "text")

    // 1. scrub PII-shaped codes, keep the redaction audit columns
    val scrubbed = TextAnalysis.scrub(raw, "doc_id", "text",
      Seq(("entity", "[a-z]+#[0-9]+", "[ENT]")))
    assert(scrubbed.where(col("n_entity") > 0).select("doc_id")
      .as[Long].collect().toSet == Set(0L, 1L))

    // 2. quality gate (length floor stands in for the full scorer)
    val gated = scrubbed.where(length(col("scrubbed")) >= 50)
      .select(col("doc_id"), col("scrubbed").as("text"))
    assert(!gated.select("doc_id").as[Long].collect().contains(3L))

    // 3. exact dedup after scrubbing (0 and 1 collapse to canonical 0)
    val canon = Dedup.exact(gated, "doc_id", "text")
    assert(canon.select("canonical_id").as[Long].collect().toSeq == Seq(0L))
    val deduped = gated.join(
      canon.select(col("canonical_id")).withColumn("keep_dup", lit(true)),
      col("doc_id") === col("canonical_id"), "left")
      .join(gated.groupBy(md5(col("text")).as("h")).count()
        .where(col("count") > 1).select(col("h")),
        md5(col("text")) === col("h"), "left")
      .where(col("h").isNull || col("keep_dup"))
      .select(col("doc_id"), col("text"))
    assert(deduped.select("doc_id").as[Long].collect().toSet == Set(0L, 2L, 4L))

    // 4. sectioned chunks (stored section column is what a production
    //    write partitions by)
    val chunks = Chunker.tagSections(
      Chunker.fixedChunks(deduped, "doc_id", "text", 60, 10),
      "chunk_text",
      Seq("join" -> "methods", "scan" -> "results", "stream" -> "discussion"),
      "other")
    val sections = chunks.select("section").as[String].collect().toSet
    assert(Set("methods", "results", "discussion").subsetOf(sections))

    // 5. token estimate + shard packing (global id order, 2-phase scan)
    val packed = Pack.packByTokenBudget(
      chunks.withColumn("chunk_id", col("doc_id") * 1000 + col("chunk_index"))
        .select(col("chunk_id"),
          expr("chunk_len div 4 + 1").as("est_tokens")),
      "chunk_id", "est_tokens", budget = 30L, partitions = 3)
    val rows = packed.select("chunk_id", "est_tokens", "cum_tokens", "shard_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // shards are contiguous in id order and start exactly at budget
    // boundaries of the starting offset
    assert(rows.forall { case (_, tok, cum, shard) => (cum - tok) / 30L == shard })
    assert(rows.map(_._4).sliding(2).forall(p => p.head <= p.last))
    assert(rows.map(_._4).distinct.length > 1) // budget actually splits
  }

  test("ANN index lifecycle: appends ride the frozen codebook until " +
    "recall@10 telemetry trips the floor, retrain recovers recall") {
    // The production loop VERDICT's staleness triad implies, composed
    // end to end on the persisted layout: vs_ivf_append's
    // frozen-codebook ingest + vs_ann_recall's telemetry +
    // vs_ann_ivf_srp's retrain role (reference analog: the
    // add_chunks -> re-index lifecycle around
    // backend/app/core/vector_store.py:136). The index lives
    // cell-PARTITIONED on disk (annIvfProbe's regime); every append
    // assigns against the FROZEN codebook and appends its partition
    // files; telemetry probes with the just-ingested direction.
    import graft.sources.Corpus
    import org.apache.spark.sql.SaveMode
    def vec(a: Double) = Array(math.cos(a).toFloat, math.sin(a).toFloat)
    // base snapshot: clusters A (around 0 rad) and B (around pi/2);
    // ids 0 and 1 are the lowest ids so lloydCentroids' id-ordered
    // seeding starts one seed in each cluster
    val base = ((Seq(0L -> 0.0) ++
      (3 to 21).map(i => i.toLong -> ((i - 3) * 0.005))) ++
      (Seq(1L -> (math.Pi / 2)) ++
        (100 to 118).map(i => i.toLong -> (math.Pi / 2 + (i - 100) * 0.005))))
      .map { case (id, a) => (id, vec(a)) }.toDF("vec_id", "embedding")
    val tmp = java.nio.file.Files.createTempDirectory("ann_lifecycle")
    val (idxDir, cbDir) = (s"$tmp/index", s"$tmp/codebook")
    val cb0 = VectorSearch.lloydCentroids(base, "vec_id", "embedding",
      k = 2, iters = 2)
    Corpus.writePartitioned(
      VectorSearch.assignCells(base, cb0, "vec_id", "embedding", "cell"),
      idxDir, Seq("cell"))
    cb0.write.parquet(cbDir)

    // recall@10 of the persisted-index probe vs brute force over the
    // SAME corpus snapshot — vs_ann_recall's telemetry on
    // annIvfProbe's layout
    def recallAt10(qAngle: Double): Double = {
      val q = Seq(Tuple1(vec(qAngle))).toDF("qe")
      val idx = spark.read.parquet(idxDir)
      val approx = VectorSearch.annIvfProbe(idx, q,
        spark.read.parquet(cbDir), "vec_id", "embedding", "qe", "cell",
        nprobe = 1, k = 10).select("vec_id")
      val exact = VectorSearch.denseTopK(
        idx.select(col("vec_id"), col("embedding")), q,
        "vec_id", "embedding", "qe", 10).select("vec_id")
      approx.join(exact, Seq("vec_id"), "left_semi").count() / 10.0
    }
    def append(batch: Seq[(Long, Array[Float])]): Unit =
      VectorSearch.assignCells(batch.toDF("vec_id", "embedding"),
        spark.read.parquet(cbDir), "vec_id", "embedding", "cell")
        .write.mode(SaveMode.Append).partitionBy("cell").parquet(idxDir)

    val floor = 0.8
    // batch 1: in-distribution arrivals near A — the frozen codebook
    // serves them fine, telemetry stays above the floor
    append((1000 to 1009).map(i => (i.toLong, vec(0.02 + (i - 1000) * 0.003))))
    val healthy = recallAt10(0.05)
    assert(healthy >= floor, s"in-distribution append degraded: $healthy")

    // batch 2: a DRIFTED cluster around 0.785 rad straddling the
    // frozen A/B boundary — half assigns to each stale cell, so a
    // drifted query probing nprobe=1 can only ever see half its true
    // neighbors. id 2 is deliberately in this batch: it becomes the
    // retrain's third seed.
    append((Seq(2L -> 0.685) ++
      (2000 to 2003).map(i => i.toLong -> (0.690 + (i - 2000) * 0.005)) ++
      (2004 to 2008).map(i => i.toLong -> (0.865 + (i - 2004) * 0.005)))
      .map { case (id, a) => (id, vec(a)) })
    val tripped = recallAt10(0.76)
    assert(tripped < floor,
      s"drift must trip the telemetry: $tripped") // measured: 0.5

    // the telemetry TRIGGERS the retrain: re-train the codebook on
    // the full drifted corpus (k grown to 3), re-assign, overwrite
    // the partitioned index — vs_ann_ivf_srp's periodic-retrain role
    val corpus = spark.read.parquet(idxDir)
      .select(col("vec_id"), col("embedding"))
    val cb1 = VectorSearch.lloydCentroids(corpus, "vec_id", "embedding",
      k = 3, iters = 2)
    val reassigned = VectorSearch.assignCells(
      corpus, cb1, "vec_id", "embedding", "cell")
      // the index dir is both source and sink of this rewrite — sever
      // the read-from-what-you-overwrite cycle before the write
      .localCheckpoint()
    cb1.write.mode(SaveMode.Overwrite).parquet(cbDir)
    Corpus.writePartitioned(reassigned, idxDir, Seq("cell"))
    val recovered = recallAt10(0.76)
    assert(recovered >= floor && recovered > tripped,
      s"retrain must recover recall: $tripped -> $recovered")
  }

  test("selection flow: semantic dedup -> components -> DSIR-scored " +
    "selectSurvivors -> tombstoned losers -> compacted snapshot == " +
    "survivor set") {
    import graft.operators.Sampling
    import graft.sources.Corpus

    // corpus: {1,4} and {2,5} are embedding near-dup clusters, 3 is
    // a singleton; seeds 1..3 span the k=3 cells
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f)),
      (4L, Array(0.99f, 0.05f, 0.0f)),
      (5L, Array(0.0f, 0.99f, 0.05f))
    ).toDF("doc_id", "embedding")
    val sem = Dedup.semanticDedup(vecs, "doc_id", "embedding",
      k = 3, iters = 2, minCos = 0.95).cache()
    assert(sem.select("doc_id").as[Long].collect().toSet == Set(4L, 5L))

    // the (keeper, dropped) attributions ARE an edge list — label
    // whole dup clusters instead of trusting per-pair attribution
    val comps = Dedup.connectedComponents(
      sem.select(col("dup_of"), col("doc_id")), "dup_of", "doc_id")
      .select(col("node").as("doc_id"), col("component"))
    assert(comps.as[(Long, Long)].collect().toMap ==
      Map(1L -> 1L, 4L -> 1L, 2L -> 2L, 5L -> 2L))

    // survivor POLICY = keep the most target-domain-like member per
    // cluster (DSIR weight as the score), NOT the arbitrary pair
    // keeper: in cluster {1,4} the attribution kept 1, but 4 is the
    // target-like text, so selection must flip to 4
    val target = Seq(
      (100L, "spark sql window join table scan"),
      (101L, "table join scan spark sql window")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "spark table scan violet meadow rose"),  // mixed
      (2L, "spark sql window join table scan"),     // target-like
      (3L, "violet kitten ribbon sunrise meadow"),  // unlike singleton
      (4L, "spark sql join table window merge"),    // target-like dup
      (5L, "violet meadow kitten ribbon sunrise")   // unlike dup
    ).toDF("doc_id", "text")
    val scored = Sampling.dsirLogWeights(target, raw, "doc_id", "text")
    val survivors = Dedup.selectSurvivors(
      scored, comps, "doc_id", "dsir_logw")
    val keep = survivors.select("doc_id").as[Long].collect().toSet
    assert(keep == Set(4L, 2L, 3L),
      s"DSIR argmax must pick 4 over the attributed keeper 1: $keep")

    // persist the decision as a latest-wins log — every non-survivor
    // tombstoned — and compact to the training snapshot
    val losers = raw.select("doc_id").as[Long].collect().toSet -- keep
    val log = raw
      .withColumn("version", lit(0L)).withColumn("deleted", lit(false))
      .unionByName(raw.where(col("doc_id").isin(losers.toSeq: _*))
        .withColumn("version", lit(1L)).withColumn("deleted", lit(true)))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pipe_sel").toFile.getAbsolutePath
    val n = Corpus.compactLog(log, Seq("doc_id"), "version",
      Some("deleted"), dir, targetRowsPerFile = 10L)
    assert(n == 3)
    // the compacted snapshot IS the survivor set — the corpus
    // rebuild a pipeline actually ships
    assert(spark.read.parquet(dir)
      .select("doc_id").as[Long].collect().toSet == keep)
  }

  test("calibrated curation flow: percentile quality gate -> " +
    "temperature mix over the gated corpus -> flattened composition") {
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")

    // 1. score every doc and gate the middle of the DISTRIBUTION —
    // thresholds derive from the corpus itself, not constants
    val scored = TextAnalysis
      .qualityScore(corpus, "doc_id", "text")
      .select(col("doc_id"), col("quality").cast("long").as("quality"))
    val gated = TextAnalysis
      .percentileGate(scored, "doc_id", "quality", 0.1, 0.99).cache()
    val nGated = gated.count()
    val nAll = corpus.count()
    assert(nGated > 0 && nGated < nAll,
      s"gate must drop both tails: kept $nGated of $nAll")

    // 2. survivors rejoin their metadata; the temperature mix runs
    // on the GATED corpus (selection composes with selection: the
    // mix sees post-gate counts, not raw ones)
    val survivors = corpus
      .join(gated.select("doc_id"), Seq("doc_id"))
      .select(col("doc_id"), col("lang"))
    val mix = Sampling
      .mixTemperature(survivors, "lang", "doc_id", 2.0, "flow-v1")
    val rows = mix.collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nGated,
      "the mix must audit exactly the gated corpus")
    // solver invariants: some stratum binds at rate 1.0, nothing
    // upsamples, the audit fractions close to 1
    assert(rows.exists(_.getAs[Long]("rate_buckets") == 1000L))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_selected") <= r.getAs[Long]("n_docs")) }
    assert(math.abs(
      rows.map(_.getAs[Double]("achieved_frac")).sum - 1.0) < 1e-3)
    // the point of the temperature: the head stratum's achieved
    // share must land BELOW its observed share (flattened toward
    // the tail), within sampling noise of the √c target
    val tot = rows.map(_.getAs[Long]("n_docs")).sum.toDouble
    val head = rows.maxBy(_.getAs[Long]("n_docs"))
    assert(head.getAs[Double]("achieved_frac") <
      head.getAs[Long]("n_docs") / tot,
      "temperature must flatten the head stratum's share")
    gated.unpersist(): Unit
  }
}
