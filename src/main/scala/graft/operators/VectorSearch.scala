package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TopKAgg, VectorFns}

/** Dense vector search operators — the Spark-native re-expression of
  * the reference's ChromaDB query surface
  * (reference: backend/app/core/vector_store.py:272 _dense_search,
  * :508 get_paper_embeddings, :538 find_similar_papers).
  *
  * Scale design:
  *  - query side is always tiny → broadcast; the big candidate side is
  *    scanned once, never shuffled in full.
  *  - single-query top-k goes through `ORDER BY ... LIMIT k`, which
  *    Spark plans as TakeOrderedAndProject (per-partition heaps +
  *    driver merge — no global sort, no full shuffle).
  *  - multi-query top-k is a bounded typed Aggregator (TopKAgg) under
  *    ObjectHashAggregate: each map partition reduces to at most k
  *    candidates per query BEFORE the exchange, so the shuffle carries
  *    O(queries · k · mapPartitions) rows, never the scored product.
  */
object VectorSearch {

  /** Brute-force cosine top-k for a single query vector.
    * `query` must be a 1-row frame with column `qVec`.
    */
  def denseTopK(
      candidates: DataFrame, query: DataFrame,
      idCol: String, vecCol: String, qVec: String,
      k: Int, extraCols: Seq[String] = Nil): DataFrame = {
    val q = query.select(col(qVec))
      .withColumn("qnrm", VectorFns.l2Norm(col(qVec)))
    val scored = candidates
      .withColumn("cnrm", VectorFns.l2Norm(col(vecCol)))
      .crossJoin(broadcast(q))
      .withColumn("raw_cos", VectorFns.cosinePrenormed(
        col(vecCol), col(qVec), col("cnrm"), col("qnrm")))
    scored
      .withColumn("cos_sim", round(col("raw_cos"), 6))
      // a zero-norm vector has no defined cosine — cosinePrenormed
      // yields NULL for it (nullif guard); drop explicitly rather
      // than rely on NULLS LAST ordering. NaN (an Inf/NaN component
      // with a non-zero norm) passes that guard and would sort FIRST
      // under both engines' ORDER BY — garbage must not surface, so
      // it is dropped the same way
      .where(col("cos_sim").isNotNull && !isnan(col("cos_sim")))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
      .select((Seq(idCol) ++ extraCols :+ "cos_sim").map(col): _*)
  }

  /** k-NN join: top-k candidates per query row by cosine.
    *
    * Top-k is a bounded typed Aggregator (functions.TopKAgg), so Spark
    * plans a PARTIAL ObjectHashAggregate on the map side: each map
    * partition reduces to at most k candidates per query BEFORE the
    * exchange. The shuffle moves O(numQueries · k · mapPartitions)
    * rows — never the |C|·|Q| scored cross product. Requires a long
    * candidate id (use zipWithIndex/monotonic ids upstream otherwise).
    */
  def knnJoin(
      candidates: DataFrame, queries: DataFrame,
      candId: String, candVec: String,
      qId: String, qVec: String, k: Int): DataFrame = {
    // fail fast: a non-integral id would silently null under the long
    // cast and then blow up in ScoredId's primitive encoder at runtime
    candidates.schema(candId).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"knnJoin candidate id '$candId' must be integral, got ${other.sql}")
    }
    val topk = udaf(new TopKAgg(k))
    val q = queries.select(col(qId), col(qVec))
      .withColumn("qnrm", VectorFns.l2Norm(col(qVec)))
    val scored = candidates
      .withColumn("cnrm", VectorFns.l2Norm(col(candVec)))
      .crossJoin(broadcast(q))
      .withColumn("cos_sim", round(VectorFns.cosinePrenormed(
        col(candVec), col(qVec), col("cnrm"), col("qnrm")), 6))
    scored
      // null cos_sim (null embedding row, or a zero-norm vector via
      // the nullif guard in cosinePrenormed) would hit ScoredId's
      // non-nullable primitives inside the udaf encoder; NaN (Inf/NaN
      // vector components with a non-zero norm) is dropped for the
      // same garbage-must-not-surface contract as denseTopK —
      // TopKAgg's NaN-last ordering is the defense in depth behind
      // this filter, not the primary mechanism
      .where(col("cos_sim").isNotNull && !isnan(col("cos_sim")))
      .groupBy(col(qId))
      .agg(topk(col("cos_sim"), col(candId).cast("long")).as("tk"))
      .select(col(qId), posexplode(col("tk")).as(Seq("pos", "nb")))
      .select(col(qId), col("nb.id").as(candId), col("nb.score").as("cos_sim"),
        (col("pos") + 1).cast("long").as("rnk"))
  }

  /** Element-wise mean vector per group, in long (group, pos, v) form.
    * Long form keeps the aggregation map-side combinable and never
    * shuffles wide arrays (reference: vector_store.py:508 averages
    * chunk embeddings per paper).
    */
  def groupCentroids(
      vectors: DataFrame, groupCol: String, vecCol: String): DataFrame =
    vectors
      .select(col(groupCol), posexplode(VectorFns.asDouble(col(vecCol)))
        .as(Seq("pos", "v")))
      .groupBy(col(groupCol), col("pos"))
      .agg(avg("v").as("v"))

  /** Pairwise cosine between group centroids (long-form join on pos —
    * centroid count is small so this stays broadcast-sized).
    */
  def centroidSimilarity(
      vectors: DataFrame, groupCol: String, vecCol: String): DataFrame = {
    // cached: norms + both join sides read it (graft.Caching lifecycle)
    val c = groupCentroids(vectors, groupCol, vecCol).cache()
    val norms = c.groupBy(col(groupCol))
      .agg(sum(col("v") * col("v")).as("ns"))
    val a = c.select(col(groupCol).as("ga"), col("pos"), col("v").as("va"))
    val b = c.select(col(groupCol).as("gb"), col("pos"), col("v").as("vb"))
    a.join(b, Seq("pos"))
      .where(col("ga") < col("gb"))
      .groupBy(col("ga"), col("gb"))
      .agg(sum(col("va") * col("vb")).as("dot"))
      .join(broadcast(norms).withColumnRenamed(groupCol, "ga")
        .withColumnRenamed("ns", "nsa"), Seq("ga"))
      .join(broadcast(norms).withColumnRenamed(groupCol, "gb")
        .withColumnRenamed("ns", "nsb"), Seq("gb"))
      .select(col("ga"), col("gb"),
        // nullif: a zero-norm centroid (all-zero group) has no
        // defined cosine — the repo-wide guard against ANSI 0/0
        round(col("dot") /
          nullif(sqrt(col("nsa")) * sqrt(col("nsb")), lit(0.0)), 6)
          .as("centroid_cos"))
      .where(col("centroid_cos").isNotNull)
  }

  /** Embedding-drift monitor between two snapshots (the encoder-
    * version canary): per group, the cosine between the OLD
    * snapshot's centroid and the NEW one's, plus both row counts and
    * a stable/drifted status on the ROUNDED cosine (the repo's
    * threshold protocol — a last-ulp drift can never flip the flag
    * between engines). A silently-deployed encoder change shows up
    * here as a centroid rotation long before recall telemetry
    * degrades, and the check costs two narrow scans instead of a
    * re-index.
    *
    * Scale shape: each side collapses to (group, pos) centroid rows
    * via the map-side-combinable long form (groupCentroids — wide
    * arrays never shuffle), the join/cosine runs on those bounded
    * |groups|·d frames, and the row counts are two more partial
    * aggregates broadcast back. Groups present in only one snapshot
    * have no defined drift and are absent (sparse contract).
    */
  def embDrift(
      oldVecs: DataFrame, newVecs: DataFrame,
      groupCol: String, vecCol: String, minCos: Double): DataFrame = {
    require(minCos >= -1.0 && minCos <= 1.0,
      s"embDrift: minCos must be in [-1, 1], got $minCos")
    val co = groupCentroids(oldVecs, groupCol, vecCol)
      .select(col(groupCol), col("pos"), col("v").as("vo"))
    val cn = groupCentroids(newVecs, groupCol, vecCol)
      .select(col(groupCol), col("pos"), col("v").as("vn"))
    val sims = co.join(cn, Seq(groupCol, "pos"))
      .groupBy(col(groupCol))
      .agg(sum(col("vo") * col("vn")).as("dot"),
        sum(col("vo") * col("vo")).as("nso"),
        sum(col("vn") * col("vn")).as("nsn"))
      .select(col(groupCol),
        round(col("dot") /
          nullif(sqrt(col("nso")) * sqrt(col("nsn")), lit(0.0)), 6)
          .as("centroid_cos"))
    val nOld = oldVecs.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_old"))
    val nNew = newVecs.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_new"))
    sims.join(broadcast(nOld), Seq(groupCol))
      .join(broadcast(nNew), Seq(groupCol))
      .select(col(groupCol), col("n_old"), col("n_new"),
        col("centroid_cos"),
        when(col("centroid_cos").isNull, "degenerate")
          .when(col("centroid_cos") < minCos, "drifted")
          .otherwise("stable").as("status"))
  }

  /** Centroids as dense arrays (pos-sorted), for broadcasting. */
  def centroidArrays(
      vectors: DataFrame, groupCol: String, vecCol: String): DataFrame =
    groupCentroids(vectors, groupCol, vecCol)
      .groupBy(col(groupCol))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("v")))),
        x => x.getField("v")).as("centroid"))

  /** Nearest-centroid assignment as a NARROW per-row fold over the
    * broadcast centroid array — the shared building block of IVF and
    * Lloyd/k-means training. All K centroids fold into ONE broadcast
    * array row (sorted by cell id, so the strict-max fold resolves
    * ties to the smallest cell); the aggregate HOF is interpreted but
    * VecDot inside it evaluates natively — K dot products per row,
    * ZERO exchange of the big side (a crossJoin + window would
    * shuffle |corpus|·K rows).
    * Output: (idCol, vecCol, cnrm, cell).
    */
  def assignCells(
      candidates: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, groupCol: String): DataFrame = {
    val cents = centroids
      .select(col(groupCol).as("cgroup"), col("centroid"))
      .withColumn("gnrm", VectorFns.l2Norm(col("centroid")))
    val cellType = centroids.schema(groupCol).dataType
    val centsArr = cents.agg(
      array_sort(collect_list(struct(col("cgroup"), col("centroid"), col("gnrm"))))
        .as("cents"))
    candidates
      .withColumn("cnrm", VectorFns.l2Norm(col(vecCol)))
      .crossJoin(broadcast(centsArr))
      .withColumn("best", aggregate(
        col("cents"),
        struct(lit(Double.NegativeInfinity).as("acos"),
          lit(null).cast(cellType).as("cell")),
        (acc, c) => {
          val acos = round(VectorFns.cosinePrenormed(
            col(vecCol), c.getField("centroid"),
            col("cnrm"), c.getField("gnrm")), 6)
          when(acos > acc.getField("acos"),
            struct(acos.as("acos"), c.getField("cgroup").as("cell")))
            .otherwise(acc)
        }))
      .select(col(idCol), col(vecCol), col("cnrm"),
        col("best").getField("cell").as("cell"))
  }

  /** Deterministic spherical k-means (Lloyd) codebook trainer: init =
    * the k lowest-id vectors, then `iters` rounds of narrow
    * fold-assignment + long-form mean. Per iteration the corpus is
    * scanned once with zero exchange (assignment) and only (cell,
    * pos, sum) rows shuffle — the general codebook path when no
    * natural cells exist. Cosine (spherical) assignment matches the
    * retrieval metric. Deterministic: id-ordered init, tie-to-
    * smallest-cell assignment, sequential-order means.
    *
    * The codebook can end up with FEWER than k cells: duplicate seed
    * vectors collapse under cosine assignment, and a cell that wins
    * no vectors in an iteration simply drops out of the groupBy (the
    * standard empty-cluster shrink of Lloyd's algorithm). Callers
    * sizing nprobe against K should read the returned frame's actual
    * cell count, not the requested k — annIvf's probe fraction is
    * nprobe / |codebook|.
    *
    * Each iteration's codebook (k tiny rows) is MATERIALIZED with an
    * eager localCheckpoint — the iterative-lineage rule from
    * connectedComponents: left lazy, iteration n's plan nests
    * iteration n−1's whole assignment subtree, so a 2-iteration
    * chain re-plans (and re-scans) the corpus ~2ⁿ times downstream
    * (observed: 16 corpus scans in one sc_* query plan, vs ~3 after
    * truncation). Materializing k×d doubles per round costs nothing
    * at any scale.
    */
  def lloydCentroids(
      vectors: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    val w = Window.orderBy(col(idCol))
    // k rows — driver-scale window; the WindowExec single-partition
    // warning is expected and harmless here.
    // Checkpoints are LAZY (r21): localCheckpoint(false) truncates the
    // LOGICAL plan immediately (each round plans over a LogicalRDD, so
    // no 2ⁿ nesting), while execution defers to the caller's terminal
    // action — Lloyd has no per-round driver decision (fixed iters, no
    // convergence read), so nothing needs eager materialization and
    // the iters+1 driver actions disappear; each round's codebook RDD
    // still persists at first compute and each round is referenced
    // exactly once (the next round's broadcast centsArr build).
    // Wall at sf0.1 measured a wash (the per-round broadcast builds
    // dominate either way) — kept for the action-count reduction.
    var cents = vectors.orderBy(col(idCol)).limit(k)
      .withColumn("cell", (row_number().over(w) - 1).cast("int"))
      .select(col("cell"), VectorFns.asDouble(col(vecCol)).as("centroid"))
      .localCheckpoint(false)
    for (_ <- 1 to iters) {
      val assigned = assignCells(vectors, cents, idCol, vecCol, "cell")
      cents = centroidArrays(assigned, "cell", vecCol)
        .select(col("cell"), col("centroid"))
        .localCheckpoint(false)
    }
    cents
  }

  /** Batch IVF ANN: top-k per query for a WHOLE query set, scoring
    * only probed cells — the bulk-retrieval scale path (knnJoin
    * scores |C|·|Q| pairs; here each candidate is scored only against
    * the queries probing its cell, ~nprobe/K of the query set).
    *
    * Shape: one zero-exchange assignment pass over the corpus (see
    * assignCells), a |Q|·K probe ranking (driver-scale window), then
    * candidates join the broadcast probe list and the broadcast query
    * vectors, reduced per query by the bounded map-side TopKAgg.
    * Requires integral query ids (TopKAgg contract, like knnJoin).
    */
  def annIvfBatch(
      candidates: DataFrame, queries: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, qId: String, qVec: String,
      groupCol: String, nprobe: Int, k: Int): DataFrame = {
    val cents = centroids
      .select(col(groupCol).as("cgroup"), col("centroid"))
      .withColumn("gnrm", VectorFns.l2Norm(col("centroid")))
    val qs = queries.select(col(qId), col(qVec))
      .withColumn("qnrm", VectorFns.l2Norm(col(qVec)))
    val assigned = assignCells(candidates, centroids, idCol, vecCol, groupCol)
    // nprobe cells per query — |Q|·K rows, pruned per query by a
    // window (driver-scale: query batch × codebook, never the corpus)
    val probes = cents
      .crossJoin(broadcast(qs.select(col(qId), col(qVec), col("qnrm"))))
      .withColumn("pcos", round(VectorFns.cosinePrenormed(
        col("centroid"), col(qVec), col("gnrm"), col("qnrm")), 6))
      .withColumn("prn", row_number().over(
        Window.partitionBy(col(qId))
          .orderBy(col("pcos").desc, col("cgroup"))))
      .where(col("prn") <= nprobe)
      .select(col(qId).as("pq"), col("cgroup").as("cell"))
    val topk = udaf(new TopKAgg(k))
    assigned
      .join(broadcast(probes), Seq("cell"))
      .join(broadcast(qs), col("pq") === col(qId))
      .withColumn("cos_sim", round(VectorFns.cosinePrenormed(
        col(vecCol), col(qVec), col("cnrm"), col("qnrm")), 6))
      .where(col("cos_sim").isNotNull && !isnan(col("cos_sim")))
      .groupBy(col(qId))
      .agg(topk(col("cos_sim"), col(idCol).cast("long")).as("tk"))
      .select(col(qId), posexplode(col("tk")).as(Seq("pos", "nb")))
      .select(col(qId), col("nb.id").as(idCol),
        col("nb.score").as("cos_sim"),
        (col("pos") + 1).cast("long").as("rnk"))
  }

  /** IVF-style ANN: assign every vector to its nearest coarse centroid
    * (broadcast), probe the `nprobe` cells nearest to the query, exact
    * cosine inside the probed cells only. This is the 100 TB path: the
    * big side is scanned ONCE for assignment with zero exchange (see
    * assignCells) and queries touch only `nprobe/K` of the data.
    */
  def annIvf(
      candidates: DataFrame, query: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, qVec: String, groupCol: String,
      nprobe: Int, k: Int): DataFrame = {
    val assigned = assignCells(candidates, centroids, idCol, vecCol, groupCol)
    val probed = probeCells(query, centroids, qVec, groupCol, nprobe)
      .select(col("cgroup").as("cell"))
    scoreProbedTopK(assigned.join(broadcast(probed), Seq("cell")),
      query, idCol, vecCol, qVec, k)
  }

  /** The nprobe coarse cells nearest to ONE query, ranked:
    * (cgroup, pcos) — a |codebook|-sized computation shared by annIvf
    * (joined lazily) and annIvfProbe (collected for static pruning).
    */
  private def probeCells(
      query: DataFrame, centroids: DataFrame, qVec: String,
      groupCol: String, nprobe: Int): DataFrame = {
    val cents = centroids
      .select(col(groupCol).as("cgroup"), col("centroid"))
      .withColumn("gnrm", VectorFns.l2Norm(col("centroid")))
    val q = query.select(col(qVec))
      .withColumn("qnrm", VectorFns.l2Norm(col(qVec)))
    cents
      .crossJoin(broadcast(q))
      .withColumn("pcos", round(VectorFns.cosinePrenormed(
        col("centroid"), col(qVec), col("gnrm"), col("qnrm")), 6))
      .orderBy(col("pcos").desc, col("cgroup"))
      .limit(nprobe)
  }

  /** Exact-cosine top-k over an already-cell-pruned candidate frame
    * (idCol, vecCol, cnrm, cell) — the shared scoring tail of the IVF
    * family. Terminates in TakeOrderedAndProject; no shuffle.
    */
  private def scoreProbedTopK(
      pruned: DataFrame, query: DataFrame, idCol: String, vecCol: String,
      qVec: String, k: Int): DataFrame = {
    val q = query.select(col(qVec))
      .withColumn("qnrm", VectorFns.l2Norm(col(qVec)))
    pruned
      .crossJoin(broadcast(q))
      .withColumn("cos_sim", round(VectorFns.cosinePrenormed(
        col(vecCol), col(qVec), col("cnrm"), col("qnrm")), 6))
      // same garbage-must-not-surface contract as denseTopK/knnJoin:
      // NaN (Inf/NaN components, non-zero norm) sorts first desc
      .where(col("cos_sim").isNotNull && !isnan(col("cos_sim")))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("cell"), col("cos_sim"))
  }

  /** Probe an ALREADY-ASSIGNED IVF index — the persisted-index twin
    * of annIvf for the production regime where assignment ran at
    * ingest (assignCells / an append batch) and the (id, vec, cnrm,
    * cell) rows live in a table PARTITIONED by `cell`
    * (Corpus.writePartitioned). Two-phase, like every on-disk IVF
    * engine: first the nprobe nearest cells are ranked and COLLECTED
    * (a |codebook|-sized job ending in nprobe ints — the same
    * driver-bounded cost class as the probe-list broadcast), then the
    * index is scanned with a STATIC `cell IN (...)` predicate. The
    * literal predicate is what turns cell pruning from a row filter
    * into partition pruning — un-probed cells' FILES are skipped at
    * listing time (`PartitionFilters: [cell IN ...]`), which a lazy
    * runtime join cannot do (dynamic partition pruning does not see
    * through a limit-based build side). The probe plan is exchange-
    * free: scan → broadcast query → TakeOrderedAndProject. The index
    * never re-assigns and its vectors never shuffle. Spec-pinned in
    * SearchSpec. Returns identical rows to annIvf on the same inputs
    * (same rounded probe ranking, same scoring tail).
    *
    * `assigned` must carry assignCells' output columns: idCol,
    * vecCol, `cnrm` (vector L2 norm) and `cell`.
    */
  def annIvfProbe(
      assigned: DataFrame, query: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, qVec: String, groupCol: String,
      nprobe: Int, k: Int): DataFrame = {
    val cells = probeCells(query, centroids, qVec, groupCol, nprobe)
      .select(col("cgroup")).collect().map(_.get(0))
    scoreProbedTopK(assigned.where(col("cell").isin(cells: _*)),
      query, idCol, vecCol, qVec, k)
  }

  /** MMR diversification (Carbonell & Goldstein, SIGIR 1998):
    * greedily re-rank the top-candK relevance shortlist so each pick
    * maximizes lambda*rel - (1-lambda)*max-sim-to-already-picked —
    * the standard vector-store knob against near-duplicate result
    * lists. The greedy recurrence is inherently sequential over a
    * BOUNDED shortlist, so this is a guarded driver device like
    * closenessCentrality: the distributed work is the denseTopK
    * shortlist; the candK x candK greedy runs on the driver behind
    * an explicit maxCandidates require (REFUSES rather than
    * silently collecting a corpus).
    *
    * Cross-engine protocol: rel scores are denseTopK's rounded
    * cos_sim verbatim; pairwise sims and per-step MMR scores round
    * to 6dp with the +1e-9 nudge BEFORE each argmax (both engines
    * compare identical rounded states — the centrality device); ties
    * break to the smaller id. `idCol` must be LongType.
    */
  def mmrRerank(
      candidates: DataFrame, query: DataFrame, idCol: String,
      vecCol: String, qVec: String, candK: Int, k: Int,
      lambda: Double, maxCandidates: Int = 500): DataFrame = {
    require(candK <= maxCandidates,
      s"mmrRerank: candK=$candK exceeds maxCandidates=$maxCandidates")
    require(k >= 1 && k <= candK, s"mmrRerank: k=$k out of [1, $candK]")
    require(lambda >= 0.0 && lambda <= 1.0,
      s"mmrRerank: lambda=$lambda out of [0, 1]")
    val spark = candidates.sparkSession
    import spark.implicits._
    def r6(x: Double): Double =
      BigDecimal(x + 1e-9)
        .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    // bounded by candK (<= maxCandidates, checked above); the vector
    // column is normalized to array<double> BEFORE collect so both
    // array<float> and array<double> embeddings (the whole vector
    // surface accepts either via VectorFns.asDouble) read back
    // uniformly — a raw getAs[Seq[Float]] would ClassCastException
    // on a double column at collect time
    val shortlist = denseTopK(candidates, query, idCol, vecCol, qVec,
      candK, Seq(vecCol))
      .withColumn(vecCol, VectorFns.asDouble(col(vecCol)))
      .collect()
    val ids = shortlist.map(_.getAs[Long](idCol))
    val vecs = shortlist.map(
      _.getAs[scala.collection.Seq[Double]](vecCol).toArray)
    val rels = shortlist.map(_.getAs[Double]("cos_sim"))
    val norms = vecs.map(v => math.sqrt(v.map(x => x * x).sum))
    def sim(i: Int, j: Int): Double = {
      var dot = 0.0
      var d = 0
      while (d < vecs(i).length) { dot += vecs(i)(d) * vecs(j)(d); d += 1 }
      r6(dot / (norms(i) * norms(j)))
    }
    val n = ids.length
    val picked = scala.collection.mutable.ArrayBuffer.empty[Int]
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Double, Double, Int)]
    while (picked.size < math.min(k, n)) {
      val step = picked.size + 1
      var bestIdx = -1
      var bestScore = Double.NegativeInfinity
      for (i <- 0 until n if !picked.contains(i)) {
        val maxSim =
          if (picked.isEmpty) 0.0 else picked.map(p => sim(i, p)).max
        val score = r6(lambda * rels(i) - (1.0 - lambda) * maxSim)
        // score DESC, id ASC — the repo's universal tiebreak
        if (score > bestScore ||
            (score == bestScore && (bestIdx == -1 || ids(i) < ids(bestIdx)))) {
          bestScore = score; bestIdx = i
        }
      }
      picked += bestIdx
      out += ((ids(bestIdx), rels(bestIdx), bestScore, step))
    }
    out.toSeq.toDF(idCol, "rel", "mmr_score", "pick_order")
  }

  /** Embedding-pipeline health report: per-group vector QC — the
    * gate an ingest pipeline runs before an encoder batch is allowed
    * into the index (a broken encoder run shows up as zero vectors,
    * NaN or NULL components, or a norm drift, and catching it here is
    * 1000× cheaper than re-indexing). Per group: row count,
    * zero-vector count, NaN-component count, null count (a NULL
    * vector or any NULL component — r14 advice: a bare
    * `exists(isnan)` returns NULL on such rows, silently dropping
    * exactly the malformed rows the gate exists to catch), dimension
    * min/max (≠ means a mixed encoder deploy), and norm stats over
    * the HEALTHY rows only (so one bad row can't poison the
    * aggregate). Classification is exclusive and ordered:
    * null → nan → zero → healthy; every row lands in exactly one.
    *
    * Scale shape: one narrow projection computes dim / normSq / flag
    * per row (normSq is the codegen'd VecNormSq fold — linear
    * in d, no shuffle), then ONE map-side-combined groupBy on the
    * group key. Nothing leaves the executors but |groups| rows.
    */
  def embHealth(
      embs: DataFrame, idCol: String, vecCol: String,
      groupCol: String): DataFrame = {
    val n2 = VectorFns.normSq(col(vecCol))
    // exists() propagates NULL (no true hit + null element → NULL),
    // so null-detection must come first and be coalesced explicitly
    val isNull = col(vecCol).isNull ||
      coalesce(exists(col(vecCol), x => x.isNull), lit(false))
    val hasNan = !isNull &&
      exists(col(vecCol), x => isnan(x.cast("double")))
    val perRow = embs.select(col(groupCol),
      size(col(vecCol)).cast("long").as("dim"),
      isNull.as("is_null"),
      hasNan.as("is_nan"),
      when(!isNull && !hasNan, sqrt(n2)).as("nrm"))
      .withColumn("is_zero",
        !col("is_null") && !col("is_nan") && col("nrm") === 0.0)
    val r4 = (c: Column) => round(c + lit(1e-9), 4)
    val healthy = !col("is_null") && !col("is_nan") && !col("is_zero")
    perRow.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_vecs"),
        sum(when(col("is_zero"), 1L).otherwise(0L)).as("n_zero"),
        sum(when(col("is_nan"), 1L).otherwise(0L)).as("n_nan"),
        sum(when(col("is_null"), 1L).otherwise(0L)).as("n_null"),
        min(col("dim")).as("dim_min"),
        max(col("dim")).as("dim_max"),
        r4(avg(when(healthy, col("nrm")))).as("avg_norm"),
        r4(min(when(healthy, col("nrm")))).as("min_norm"),
        r4(max(when(healthy, col("nrm")))).as("max_norm"))
  }
}
