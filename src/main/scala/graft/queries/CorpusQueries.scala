package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Sampling
import graft.sources.{Corpus, Layout}

/** Corpus-maintenance queries: the reference's mutable store surface
  * (add_chunks / delete_paper / incremental index) re-expressed as a
  * latest-wins view over an append-only base+delta log.
  */
object CorpusQueries {

  /* ---------------- corpus_latest ---------------- */

  /** Demo binding: base = every document at version 0; a delta batch
    * re-ingests docs ≡ 3 (mod 10) at version 1 with a changed payload
    * (the add_chunks upsert) and tombstones docs ≡ 7 (mod 10) (the
    * delete_paper path). The merged view must show the delta payload
    * for upserted keys, drop tombstoned keys, and keep everything
    * else at the base version.
    */
  private def corpusLatest(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val base = docs.select(col("doc_id"),
      lit(0L).as("version"), lit("base").as("src"),
      col("n_chars"), lit(false).as("deleted"))
    val upserts = docs.where(pmod(col("doc_id"), lit(10)) === 3)
      .select(col("doc_id"),
        lit(1L).as("version"), lit("delta").as("src"),
        (col("n_chars") + 100).as("n_chars"), lit(false).as("deleted"))
    val tombstones = docs.where(pmod(col("doc_id"), lit(10)) === 7)
      .select(col("doc_id"),
        lit(1L).as("version"), lit("delta").as("src"),
        col("n_chars"), lit(true).as("deleted"))
    Corpus.mergeLatest(base.union(upserts).union(tombstones),
      Seq("doc_id"), "version", deletedCol = Some("deleted"))
      .select(col("doc_id"), col("version"), col("src"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  private val corpusLatestSql =
    """WITH base AS (SELECT doc_id, 0::BIGINT AS version, 'base' AS src,
      |    n_chars, false AS deleted FROM documents),
      |up AS (SELECT doc_id, 1::BIGINT, 'delta', n_chars + 100, false
      |  FROM documents WHERE doc_id % 10 = 3),
      |del AS (SELECT doc_id, 1::BIGINT, 'delta', n_chars, true
      |  FROM documents WHERE doc_id % 10 = 7),
      |log AS (SELECT * FROM base UNION ALL SELECT * FROM up
      |  UNION ALL SELECT * FROM del),
      |r AS (SELECT doc_id, version, src, n_chars, deleted,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY version DESC) AS rn
      |  FROM log)
      |SELECT doc_id, version, src, n_chars FROM r
      |WHERE rn = 1 AND NOT coalesce(deleted, false) ORDER BY doc_id""".stripMargin

  /* ---------------- snapshot_diff ---------------- */

  /** Snapshot-audit binding: tonight's snapshot drops docs ≡ 7
    * (mod 10) (the delete_paper churn), bumps n_chars for ≡ 3 (the
    * re-chunk upsert) and crawls new ids (≡ 1 cloned past the key
    * space) — the diff must classify every key added / removed /
    * changed / unchanged with both sides' payloads.
    */
  private def snapshotDiffQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"), col("source"))
    // clone offset = max(doc_id) + 1 so "new crawl" ids can never
    // collide with surviving ids at ANY scale factor (a fixed
    // literal breaks once ScaleUp-amplified ids exceed it). One
    // 1-row max() action — parquet-stats-cheap, same value the
    // oracle derives with its own scalar subquery.
    val cloneOffset =
      docs.agg(max(col("doc_id"))).head.getLong(0) + 1L
    val newSnap = docs.where(pmod(col("doc_id"), lit(10)) =!= 7)
      .withColumn("n_chars",
        when(pmod(col("doc_id"), lit(10)) === 3, col("n_chars") + 100)
          .otherwise(col("n_chars")))
      .unionByName(docs.where(pmod(col("doc_id"), lit(10)) === 1)
        .withColumn("doc_id", col("doc_id") + lit(cloneOffset)))
    Corpus.snapshotDiff(docs, newSnap,
      Seq("doc_id"), Seq("n_chars", "source"))
      .orderBy(col("doc_id"))
  }

  private val snapshotDiffSql =
    """WITH olds AS (SELECT doc_id, n_chars, source FROM documents),
      |news AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 10 = 3 THEN n_chars + 100
      |         ELSE n_chars END AS n_chars,
      |    source
      |  FROM documents WHERE doc_id % 10 <> 7
      |  UNION ALL
      |  SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents),
      |    n_chars, source
      |  FROM documents WHERE doc_id % 10 = 1)
      |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
      |  CASE WHEN o.doc_id IS NULL THEN 'added'
      |       WHEN n.doc_id IS NULL THEN 'removed'
      |       WHEN o.n_chars IS NOT DISTINCT FROM n.n_chars
      |        AND o.source IS NOT DISTINCT FROM n.source THEN 'unchanged'
      |       ELSE 'changed' END AS status,
      |  o.n_chars AS old_n_chars, n.n_chars AS new_n_chars,
      |  o.source AS old_source, n.source AS new_source
      |FROM olds o FULL OUTER JOIN news n ON o.doc_id = n.doc_id
      |ORDER BY doc_id""".stripMargin

  /* ---------------- layout_scan ---------------- */

  /** Z-order layout-invariance binding: rewrite the documents table
    * Z-clustered on (doc_id, n_chars), then answer a selective
    * predicate on the SECOND clustered column through the rewritten
    * layout. The oracle runs the same query over the ORIGINAL table —
    * a layout is pure physical design, so the results must be
    * identical; what the layout buys (row-group skipping on n_chars,
    * which a doc_id-sorted layout cannot give) is measured in
    * LayoutSpec's bytes-read test, and this row pins that the
    * clustering write is lossless end to end.
    */
  private def layoutScan(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"), col("source"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_zscan_").toString
    Layout.writeZordered(docs, dir, Seq("doc_id", "n_chars"),
      bits = 5, numFiles = 8)
    s.read.parquet(dir)
      .where(col("n_chars").between(200, 260))
      .groupBy(col("source"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("n_chars")).cast("long").as("sum_chars"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"))
      .orderBy(col("source"))
  }

  private val layoutScanSql =
    """SELECT source, count(*)::BIGINT AS n_docs,
      |  sum(n_chars)::BIGINT AS sum_chars,
      |  min(doc_id) AS min_id, max(doc_id) AS max_id
      |FROM documents WHERE n_chars BETWEEN 200 AND 260
      |GROUP BY source ORDER BY source""".stripMargin

  /* ---------------- sample_stratified ---------------- */

  private val MixRates: Map[String, Double] =
    Map("src0" -> 0.5, "src1" -> 0.5, "src2" -> 0.2)
  private val MixDefault = 0.1
  private val MixSalt = "mix-v1"

  /** Training-mix binding: upweight two sources to 50%, one to 20%,
    * everything else to 10% — the per-source composition knob of a
    * pre-training data pipeline. Hash-deterministic, so the oracle
    * replays the exact sample.
    */
  private def sampleStratified(s: SparkSession, d: String): DataFrame =
    Sampling.stratifiedSample(
      Tables.documents(s, d).select(col("doc_id"), col("source")),
      "source", "doc_id", MixRates, MixDefault, MixSalt)
      .orderBy(col("doc_id"))

  private val sampleStratifiedSql = {
    val cases = MixRates.toSeq.sorted.map { case (k, r) =>
      s"WHEN ${graft.functions.TextFns.sqlLit(k)} " +
        s"THEN ${(r * Sampling.Buckets).round}"
    }.mkString(" ")
    val dec = SqlSnippets.hexPrefixDecode(
      s"md5(doc_id::VARCHAR || '|$MixSalt')")
    s"""WITH b AS (SELECT doc_id, source,
       |    (($dec) % ${Sampling.Buckets})::BIGINT AS bucket
       |  FROM documents)
       |SELECT doc_id, source, bucket FROM b
       |WHERE bucket < CASE source $cases
       |  ELSE ${(MixDefault * Sampling.Buckets).round} END
       |ORDER BY doc_id""".stripMargin
  }

  /* ---------------- corpus_shuffle ---------------- */

  private val ShufShards = 8
  private val ShufSalt = "shuf-v1"

  /** Deterministic training-order shuffle: every doc gets a
    * reproducible (shard, pos) from the md5 hash order — the global
    * interleave a pre-training pipeline runs before writing training
    * shards (salt = epoch; a new salt is a fresh permutation). The
    * oracle replays the same 32-bit hex decode the sampler family
    * shares.
    */
  private def corpusShuffle(s: SparkSession, d: String): DataFrame =
    Sampling.shuffleShards(
      Tables.documents(s, d).select(col("doc_id")),
      "doc_id", ShufSalt, ShufShards)
      .orderBy(col("shard"), col("pos"))

  private val corpusShuffleSql = {
    val dec = SqlSnippets.hexPrefixDecode(
      s"md5(doc_id::VARCHAR || '|$ShufSalt')")
    s"""WITH b AS (SELECT doc_id, ($dec) AS skey FROM documents),
       |sh AS (SELECT doc_id, skey, (skey % $ShufShards)::BIGINT AS shard
       |  FROM b),
       |fin AS (SELECT doc_id, shard,
       |    row_number() OVER (PARTITION BY shard
       |      ORDER BY skey, doc_id)::BIGINT AS pos
       |  FROM sh)
       |SELECT doc_id, shard, pos FROM fin ORDER BY shard, pos""".stripMargin
  }

  /* ---------------- mix_temperature ---------------- */

  private val MixTemp = 2.0
  private val MixTSalt = "mixt-v1"

  /** Temperature-mix binding: T = 2 (the α = 0.5 multilingual
    * sampling setting) over the LANG strata — langs are skewed
    * (en ≈ 2.4× the tail), so the temperature visibly flattens the
    * mix. Under w ∝ √c the SMALLEST stratum binds (N* = min c/w =
    * min √c), riding at rate 1.0 while every larger stratum
    * downsamples at √(c_min/c_s): the achieved composition is
    * ∝ √c_s — flattened, never upsampled.
    */
  private def mixTemperatureQ(s: SparkSession, d: String): DataFrame =
    Sampling.mixTemperature(
      Tables.documents(s, d).select(col("doc_id"), col("lang")),
      "lang", "doc_id", MixTemp, MixTSalt)
      .orderBy(col("lang"))

  private val mixTemperatureSql = {
    val dec = SqlSnippets.hexPrefixDecode(
      s"md5(doc_id::VARCHAR || '|$MixTSalt')")
    s"""WITH counts AS (SELECT lang, count(*)::BIGINT AS n_docs
       |  FROM documents GROUP BY lang),
       |wc AS (SELECT lang, n_docs,
       |    round(pow(n_docs, ${1.0 / MixTemp}) + 0.000000000001, 6)
       |      AS wraw
       |  FROM counts),
       |ns AS (SELECT min(n_docs / wraw) AS nstar FROM wc),
       |wt AS (SELECT sum(wraw) AS wtot FROM wc),
       |rates AS (SELECT lang, n_docs, wraw,
       |    floor(least(nstar * wraw / n_docs, 1.0)
       |      * ${Sampling.Buckets} + 0.000000001)::BIGINT AS rate_buckets
       |  FROM wc, ns),
       |b AS (SELECT doc_id, lang,
       |    (($dec) % ${Sampling.Buckets})::BIGINT AS bucket
       |  FROM documents),
       |sel AS (SELECT b.lang, count(*)::BIGINT AS n_selected
       |  FROM b JOIN rates ON b.lang = rates.lang
       |    AND b.bucket < rates.rate_buckets
       |  GROUP BY b.lang),
       |tot AS (SELECT sum(n_selected)::BIGINT AS total_sel FROM sel)
       |SELECT rates.lang, n_docs,
       |  round(wraw / wtot + 0.000000001, 6) AS target_w,
       |  rate_buckets,
       |  coalesce(n_selected, 0)::BIGINT AS n_selected,
       |  round(coalesce(n_selected, 0)::DOUBLE / total_sel
       |    + 0.000000001, 6) AS achieved_frac
       |FROM rates LEFT JOIN sel ON rates.lang = sel.lang, wt, tot
       |ORDER BY rates.lang""".stripMargin
  }

  /* ---------------- corpus_mix ---------------- */

  private val MixWeights: Map[String, Double] =
    Map("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src3" -> 0.1)
  private val MixWSalt = "mixw-v1"

  /** Mixture-solver binding: target a 40/30/20/10 composition over
    * four sources. With uniform observed counts the 0.4 source binds
    * (rate 1.0) and the others derive 0.75/0.5/0.25 — the audit frame
    * shows the realized mix vs the spec.
    */
  private def corpusMix(s: SparkSession, d: String): DataFrame =
    Sampling.mixToWeights(
      Tables.documents(s, d).select(col("doc_id"), col("source")),
      "source", "doc_id", MixWeights, MixWSalt)
      .orderBy(col("source"))

  private val corpusMixSql = {
    val vals = MixWeights.toSeq.sorted
      .map { case (k, w) =>
        s"(${graft.functions.TextFns.sqlLit(k)}, ${w}::DOUBLE)" }
      .mkString(", ")
    val dec = SqlSnippets.hexPrefixDecode(
      s"md5(doc_id::VARCHAR || '|$MixWSalt')")
    s"""WITH w(source, target_w) AS (VALUES $vals),
       |counts AS (SELECT source, count(*)::BIGINT AS n_docs
       |  FROM documents GROUP BY source),
       |wc AS (SELECT counts.source, n_docs, target_w
       |  FROM counts JOIN w ON counts.source = w.source),
       |ns AS (SELECT min(n_docs / target_w) AS nstar FROM wc),
       |rates AS (SELECT source, n_docs, target_w,
       |    floor(least(nstar * target_w / n_docs, 1.0)
       |      * ${Sampling.Buckets} + 0.000000001)::BIGINT AS rate_buckets
       |  FROM wc, ns),
       |b AS (SELECT doc_id, source,
       |    (($dec) % ${Sampling.Buckets})::BIGINT AS bucket
       |  FROM documents),
       |sel AS (SELECT b.source, count(*)::BIGINT AS n_selected
       |  FROM b JOIN rates ON b.source = rates.source
       |    AND b.bucket < rates.rate_buckets
       |  GROUP BY b.source),
       |tot AS (SELECT sum(n_selected)::BIGINT AS total_sel FROM sel)
       |SELECT rates.source, n_docs,
       |  round(target_w, 6) AS target_w, rate_buckets,
       |  coalesce(n_selected, 0)::BIGINT AS n_selected,
       |  round(coalesce(n_selected, 0)::DOUBLE / total_sel
       |    + 0.000000001, 6) AS achieved_frac
       |FROM rates LEFT JOIN sel ON rates.source = sel.source, tot
       |ORDER BY rates.source""".stripMargin
  }

  /* ---------------- corpus_drift ---------------- */

  /** Snapshot-drift binding: base = the corpus as-is; "current" = the
    * same docs with a source-dependent length shift (sid%4==0 →
    * +150 chars ≈ 1.5 width-100 buckets, strong drift; sid%4==1 →
    * +40, mild; else unshifted). Purely synthetic drift, but it
    * drives the PSI fold and the ladder deterministically through
    * all three levels; production feeds two real snapshot frames.
    */
  private def corpusDrift(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    // try_cast on BOTH sides: Spark's try_cast and DuckDB's TRY_CAST
    // agree that a non-numeric suffix yields NULL (pmod(NULL) falls
    // to the unshifted branch) — a plain ::INT would hard-error in
    // DuckDB on a renamed source while Spark under ANSI also throws,
    // but try_cast pins the tolerant behavior explicitly both sides
    val sid = expr("try_cast(substring(source, 4, 10) AS int)")
    val base = docs.select(col("source"), col("n_chars").as("nc"))
    val cur = docs.select(col("source"),
      (col("n_chars") +
        when(pmod(sid, lit(4)) === 0, 150)
          .when(pmod(sid, lit(4)) === 1, 40)
          .otherwise(0)).as("nc"))
    def bucketed(f: DataFrame) = f.select(col("source"),
      least(expr("nc div 100"), lit(9L)).as("len_bucket"))
    graft.operators.Drift.psi(
      bucketed(base), bucketed(cur), "source", "len_bucket")
      .orderBy(col("source"))
  }

  private val corpusDriftSql =
    """WITH sid AS (SELECT source, n_chars,
      |    TRY_CAST(substr(source, 4) AS INT) AS sid FROM documents),
      |b AS (SELECT source, least(n_chars // 100, 9) AS bk FROM sid),
      |c AS (SELECT source,
      |    least((n_chars + CASE WHEN sid % 4 = 0 THEN 150
      |      WHEN sid % 4 = 1 THEN 40 ELSE 0 END) // 100, 9) AS bk
      |  FROM sid),
      |cb AS (SELECT source, bk, count(*)::BIGINT AS cnt_b
      |  FROM b GROUP BY 1, 2),
      |cc AS (SELECT source, bk, count(*)::BIGINT AS cnt_c
      |  FROM c GROUP BY 1, 2),
      |j AS (SELECT coalesce(cb.source, cc.source) AS source,
      |    coalesce(cb.bk, cc.bk) AS bk,
      |    coalesce(cnt_b, 0) AS cnt_b, coalesce(cnt_c, 0) AS cnt_c
      |  FROM cb FULL OUTER JOIN cc
      |    ON cb.source = cc.source AND cb.bk = cc.bk),
      |t AS (SELECT source, cnt_b, cnt_c,
      |    (sum(cnt_b) OVER (PARTITION BY source))::BIGINT AS tot_b,
      |    (sum(cnt_c) OVER (PARTITION BY source))::BIGINT AS tot_c FROM j),
      |p AS (SELECT source, tot_b, tot_c,
      |    greatest(cnt_b::DOUBLE / tot_b, 0.000001) AS pb,
      |    greatest(cnt_c::DOUBLE / tot_c, 0.000001) AS pc FROM t),
      |g AS (SELECT source, max(tot_b)::BIGINT AS n_base,
      |    max(tot_c)::BIGINT AS n_current,
      |    round(sum((pc - pb) * ln(pc / pb)) + 0.000000001, 6) AS psi
      |  FROM p GROUP BY source)
      |SELECT source, n_base, n_current, psi,
      |  CASE WHEN psi < 0.1 THEN 'stable'
      |       WHEN psi < 0.25 THEN 'moderate'
      |       ELSE 'high' END AS drift_level
      |FROM g ORDER BY source""".stripMargin

  /* ---------------- corpus_dsir ---------------- */

  /** DSIR data-selection binding: the target domain is the English
    * slice of the corpus (the classic "select target-language-like
    * data" use), the raw pool is everything else, 256 hash buckets.
    * Every raw doc gets its importance log-weight — the frame a
    * selection pass then rate-samples by rank.
    */
  private val DsirBuckets = 256

  private def corpusDsir(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    Sampling.dsirLogWeights(
      docs.where(col("lang") === "en"),
      docs.where(col("lang") =!= "en"),
      "doc_id", "text", DsirBuckets)
      .orderBy(col("doc_id"))
  }

  /** Oracle: one feature chain (unigrams ∪ bigrams with
    * multiplicity, md5-bucketed via the shared hex decode) split by
    * the lang predicate; add-one-smoothed class models over
    * `DsirBuckets` outcomes; per-doc Σ n·log-ratio.
    */
  private val corpusDsirSql = {
    val dec = SqlSnippets.hexPrefixDecode("md5(feat)")
    s"""WITH toks AS (SELECT doc_id, lang,
       |    string_split_regex(lower(trim(text)), '\\s+') AS t
       |  FROM documents),
       |uni AS (SELECT doc_id, lang, unnest(t) AS feat FROM toks),
       |bix AS (SELECT doc_id, lang, t,
       |    unnest(generate_series(1, len(t) - 1)) AS i FROM toks),
       |bi AS (SELECT doc_id, lang, t[i] || ' ' || t[i+1] AS feat FROM bix),
       |feats AS (SELECT doc_id, lang, feat FROM uni
       |  UNION ALL SELECT doc_id, lang, feat FROM bi),
       |fb AS (SELECT doc_id, lang, ($dec) % $DsirBuckets AS bkt FROM feats),
       |tb AS (SELECT bkt, count(*) AS tcnt FROM fb
       |  WHERE lang = 'en' GROUP BY bkt),
       |dc AS (SELECT doc_id, bkt, count(*) AS n FROM fb
       |  WHERE lang <> 'en' GROUP BY doc_id, bkt),
       |rb AS (SELECT bkt, sum(n)::BIGINT AS rcnt FROM dc GROUP BY bkt),
       |tt AS (SELECT sum(tcnt)::DOUBLE AS v FROM tb),
       |tr AS (SELECT sum(rcnt)::DOUBLE AS v FROM rb),
       |lr AS (SELECT coalesce(tb.bkt, rb.bkt) AS bkt,
       |    ln((coalesce(tcnt, 0) + 1)::DOUBLE / (tt.v + $DsirBuckets)) -
       |    ln((coalesce(rcnt, 0) + 1)::DOUBLE / (tr.v + $DsirBuckets)) AS lr
       |  FROM tb FULL OUTER JOIN rb ON tb.bkt = rb.bkt
       |  CROSS JOIN tt CROSS JOIN tr)
       |SELECT dc.doc_id, sum(dc.n)::BIGINT AS n_feats,
       |  round(sum(dc.n * lr.lr) + 0.000000001, 6) AS dsir_logw
       |FROM dc JOIN lr ON dc.bkt = lr.bkt
       |GROUP BY dc.doc_id ORDER BY dc.doc_id""".stripMargin
  }

  /* ---------------- sample_exact_k ---------------- */

  private val ExactK = 15
  private val ExactKSalt = "eval-v1"

  /** Fixed-SIZE split carve: the 15 smallest-hash docs per source —
    * the held-out eval set a training pipeline pins per stratum.
    * Rate-based sampling keeps a proportion; this keeps a size. The
    * operator is a bounded map-side top-k (TopKAgg), never a
    * stratum-wide sort; the oracle replays it as a hash-ordered
    * row_number.
    */
  private def sampleExactK(s: SparkSession, d: String): DataFrame =
    Sampling.sampleExactK(
      Tables.documents(s, d).select(col("source"), col("doc_id")),
      "source", "doc_id", ExactK, ExactKSalt)
      .orderBy(col("source"), col("rnk"))

  private val sampleExactKSql = {
    val dec = SqlSnippets.hexPrefixDecode(
      s"md5(doc_id::VARCHAR || '|$ExactKSalt')")
    s"""WITH b AS (SELECT source, doc_id, ($dec)::BIGINT AS skey
       |  FROM documents),
       |r AS (SELECT source, doc_id, skey,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY skey, doc_id) AS rnk
       |  FROM b)
       |SELECT source, doc_id, skey, rnk::BIGINT AS rnk FROM r
       |WHERE rnk <= $ExactK ORDER BY source, rnk""".stripMargin
  }

  val defs: Seq[Qdef] = Seq(
    Qdef("corpus_latest", corpusLatest, Some(corpusLatestSql)),
    Qdef("snapshot_diff", snapshotDiffQ, Some(snapshotDiffSql)),
    Qdef("layout_scan", layoutScan, Some(layoutScanSql)),
    Qdef("sample_stratified", sampleStratified, Some(sampleStratifiedSql)),
    Qdef("sample_exact_k", sampleExactK, Some(sampleExactKSql)),
    Qdef("corpus_shuffle", corpusShuffle, Some(corpusShuffleSql)),
    Qdef("corpus_mix", corpusMix, Some(corpusMixSql)),
    Qdef("mix_temperature", mixTemperatureQ, Some(mixTemperatureSql)),
    Qdef("corpus_drift", corpusDrift, Some(corpusDriftSql)),
    Qdef("corpus_dsir", corpusDsir, Some(corpusDsirSql)))
}
