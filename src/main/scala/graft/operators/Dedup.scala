package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFns, VectorFns}

/** Deduplication family for LLM-training-data pipelines: exact,
  * MinHash+LSH, n-gram Jaccard set-similarity, SimHash, and
  * embedding-cosine near-dup. The reference dedups its corpus by id
  * only (reference: backend/app/core/corpus_builder.py:615
  * build_collection seen-pmid filtering); these operators generalize
  * that to content-level dedup at scale.
  *
  * Cross-engine determinism: every hash is md5-derived (identical hex
  * in Spark and DuckDB) — never engine-native hash functions.
  *
  * Scale design: no operator materialises the O(n²) pair space. Pairs
  * are generated only inside LSH band buckets / shingle postings /
  * blocking cells, and hot shingles are droppable via a mirrored df
  * cap (stop-shingle suppression) to bound bucket skew.
  *
  * Cache lifecycle: operators cache() intermediates that appear twice
  * in their OWN plan (shingles feed both signatures and verification).
  * The returned frame is lazy, so the operator cannot unpersist for
  * you — callers running many operators in one session should
  * `spark.catalog.clearCache()` after each terminal action (Bench and
  * Verify do).
  */
object Dedup {

  /** Exact duplicate groups by md5 of raw text. Only hashes shuffle;
    * count is map-side combinable.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(md5(col(textCol)).as("text_hash"))
      .agg(count(lit(1)).as("dup_cnt"), min(col(idCol)).as("canonical_id"))
      .where(col("dup_cnt") > 1)

  /** Distinct word-n-gram shingles per doc: (id, sh). Tokens are
    * materialized into a column before the shingle lambda — see
    * TextFns.shinglesOfTokens for why.
    */
  def shingles(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs
      .select(col(idCol), TextFns.wsTokens(col(textCol)).as("tk"))
      .select(col(idCol),
        explode(array_distinct(TextFns.shinglesOfTokens(col("tk"), n))).as("sh"))

  /** Prime > 2^32 for the double-hashing permutation family. */
  val MinhashPrime = 4294967311L

  /** MinHash signatures via double hashing: two md5-derived 32-bit
    * base hashes per shingle, then permutation i is
    * (m1 + i*m2) mod P — one cheap integer op per extra hash instead
    * of one md5 each (Broder's classic minwise family). Cross-engine
    * reproducible: md5 + 64-bit integer arithmetic only.
    * Output: (id, h0..h{numHashes-1}) as longs.
    */
  def minhashSignatures(
      sh: DataFrame, idCol: String, numHashes: Int): DataFrame = {
    val base = sh.select(col(idCol),
      TextFns.hexHash32(col("sh")).as("m1"),
      TextFns.hexHash32(concat(col("sh"), lit("#"))).as("m2"))
    val aggs = (0 until numHashes).map(i =>
      min((col("m1") + lit(i.toLong) * col("m2")) % MinhashPrime).as(s"h$i"))
    base.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH candidate pairs: split the signature into bands of `rows`
    * hashes; docs sharing any band key are candidates. The self-join
    * shuffles only (band, key) — never the corpus.
    */
  def lshCandidates(
      sigs: DataFrame, idCol: String, numHashes: Int, rows: Int): DataFrame = {
    val numBands = numHashes / rows
    val bands = (0 until numBands).map { b =>
      val cols = (b * rows until (b + 1) * rows).map(i => col(s"h$i"))
      struct(lit(b).as("band"),
        md5(concat_ws("|", cols :+ lit(b.toString): _*)).as("bkey"))
    }
    val exploded = sigs.select(col(idCol),
      explode(array(bands: _*)).as("bk"))
      .select(col(idCol), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    val a = exploded.select(col(idCol).as("da"), col("band"), col("bkey"))
    val b = exploded.select(col(idCol).as("db"), col("band"), col("bkey"))
    a.join(b, Seq("band", "bkey"))
      .where(col("da") < col("db"))
      .select(col("da"), col("db")).distinct()
  }

  /** Exact Jaccard for given candidate pairs from a shingle frame. */
  def jaccardVerify(
      cand: DataFrame, sh: DataFrame, idCol: String,
      minJaccard: Double): DataFrame = {
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("nsh"))
    val shA = sh.select(col(idCol).as("da"), col("sh"))
    val shB = sh.select(col(idCol).as("db"), col("sh"))
    cand
      .join(shA, Seq("da"))
      .join(shB, Seq("db", "sh"))
      .groupBy(col("da"), col("db"))
      .agg(count(lit(1)).cast("double").as("common"))
      .join(sizes.select(col(idCol).as("da"), col("nsh").as("na")), Seq("da"))
      .join(sizes.select(col(idCol).as("db"), col("nsh").as("nb")), Seq("db"))
      .withColumn("raw_jac",
        col("common") / (col("na") + col("nb") - col("common")))
      .where(col("raw_jac") >= minJaccard)
      .select(col("da"), col("db"), round(col("raw_jac"), 6).as("jaccard"))
  }

  /** MinHash + LSH near-dup pairs, verified by exact Jaccard. */
  def minhashLsh(
      docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 32, bandRows: Int = 4,
      minJaccard: Double = 0.5): DataFrame = {
    val sh = shingles(docs, idCol, textCol, shingleN).cache()
    val sigs = minhashSignatures(sh, idCol, numHashes)
    val cand = lshCandidates(sigs, idCol, numHashes, bandRows)
    jaccardVerify(cand, sh, idCol, minJaccard)
  }

  /** All-pairs n-gram Jaccard via inverted-index (set-similarity)
    * join. Shingles with document frequency above `maxShingleDf` are
    * dropped BEFORE the join (mirrored stop-shingle cap: bounds the
    * per-posting pair blowup; near-dup pairs still share plenty of
    * rare shingles).
    */
  def ngramJaccard(
      docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, maxShingleDf: Int, minJaccard: Double): DataFrame = {
    val sh = shingles(docs, idCol, textCol, shingleN).cache()
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("nsh"))
    val dfOk = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .where(col("df") <= maxShingleDf)
      .select(col("sh"))
    val pruned = sh.join(dfOk, Seq("sh"))
    val a = pruned.select(col(idCol).as("da"), col("sh"))
    val b = pruned.select(col(idCol).as("db"), col("sh"))
    a.join(b, Seq("sh"))
      .where(col("da") < col("db"))
      .groupBy(col("da"), col("db"))
      .agg(count(lit(1)).cast("double").as("common"))
      .join(sizes.select(col(idCol).as("da"), col("nsh").as("na")), Seq("da"))
      .join(sizes.select(col(idCol).as("db"), col("nsh").as("nb")), Seq("db"))
      .withColumn("raw_jac",
        col("common") / (col("na") + col("nb") - col("common")))
      .where(col("raw_jac") >= minJaccard)
      .select(col("da"), col("db"), round(col("raw_jac"), 6).as("jaccard"))
  }

  /** 32-bit SimHash per doc over distinct word 3-gram shingles (more
    * discriminative than unigram features on small vocabularies). Bit
    * b of the md5-derived 32-bit shingle hash votes +1/-1; simhash bit
    * set where the vote sum is strictly positive.
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = shingles(docs, idCol, textCol, 3)
      .withColumn("h", TextFns.hexHash32(col("sh")))
    val bitSums = (0 until 32).map(bit =>
      sum(shiftright(col("h"), bit).bitwiseAND(1) * 2 - 1).as(s"s$bit"))
    val agg = toks.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until 32).map(bit =>
      when(col(s"s$bit") > 0, lit(1L << bit)).otherwise(lit(0L)))
      .reduce(_ + _)
    agg.select(col(idCol), sim.as("simhash"))
  }

  /** SimHash near-dup pairs with hamming <= maxHamming. Candidates
    * come from 8-bit band collisions (4 bands), so only same-byte
    * buckets join; pairs whose differing bits spread across all 4
    * bytes are unreachable — an accepted recall/scale tradeoff applied
    * identically in the oracle.
    */
  def simhashPairs(
      docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 6): DataFrame = {
    val sims = simhash(docs, idCol, textCol).cache()
    val banded = sims.select(col(idCol), col("simhash"),
      explode(array((0 until 4).map(j =>
        struct(lit(j).as("bj"),
          shiftright(col("simhash"), j * 8).bitwiseAND(255).as("bv"))): _*))
        .as("b"))
      .select(col(idCol), col("simhash"), col("b.bj").as("bj"), col("b.bv").as("bv"))
    val a = banded.select(col(idCol).as("da"), col("simhash").as("sa"),
      col("bj"), col("bv"))
    val b = banded.select(col(idCol).as("db"), col("simhash").as("sb"),
      col("bj"), col("bv"))
    a.join(b, Seq("bj", "bv"))
      .where(col("da") < col("db"))
      .select(col("da"), col("db"),
        bit_count(col("sa").bitwiseXOR(col("sb"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Embedding near-dup: candidates blocked by a grouping column
    * (e.g. cluster label — "cluster then dedup"), exact double-cosine
    * within blocks. Pair space is sum of per-block n², never global n².
    */
  def embeddingNearDup(
      vectors: DataFrame, idCol: String, vecCol: String, blockCol: String,
      minCos: Double): DataFrame = {
    // norms computed once per vector, not once per pair
    val withNorm = vectors.select(col(blockCol), col(idCol), col(vecCol),
      VectorFns.l2Norm(col(vecCol)).as("nrm"))
    val a = withNorm.select(col(blockCol), col(idCol).as("va"),
      col(vecCol).as("ea"), col("nrm").as("nra"))
    val b = withNorm.select(col(blockCol), col(idCol).as("vb"),
      col(vecCol).as("eb"), col("nrm").as("nrb"))
    a.join(b, Seq(blockCol))
      .where(col("va") < col("vb"))
      .withColumn("raw_cos", VectorFns.cosinePrenormed(
        col("ea"), col("eb"), col("nra"), col("nrb")))
      .where(col("raw_cos") >= minCos)
      .select(col("va"), col("vb"), round(col("raw_cos"), 6).as("cos_sim"))
  }
}
