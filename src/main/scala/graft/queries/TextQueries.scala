package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns
import graft.operators.{Chunker, Insights, Pack, TextAnalysis, Trends}

/** Text-analysis queries over `documents` (plus `part` for entity
  * codes). All derived integers are BIGINT on both sides.
  */
object TextQueries {

  private val stopList = TextFns.stopwords.map(TextFns.sqlLit).mkString(", ")

  /* ---------------- txt_stats ---------------- */

  private def txtStats(s: SparkSession, d: String): DataFrame =
    TextAnalysis.stats(Tables.documents(s, d), "doc_id", "text")
      .select(col("doc_id"),
        col("n_tokens").cast("long").as("n_tokens"),
        col("n_chars").cast("long").as("n_chars"),
        col("n_distinct").cast("long").as("n_distinct"),
        col("n_stopwords").cast("long").as("n_stopwords"),
        col("stop_ratio"), col("distinct_ratio"))
      .orderBy(col("doc_id"))

  private val txtStatsSql =
    s"""WITH t AS (SELECT doc_id,
       |    string_split_regex(lower(trim(text)), '\\s+') AS toks,
       |    length(text)::BIGINT AS n_chars
       |  FROM documents),
       |c AS (SELECT doc_id,
       |    len(toks)::BIGINT AS n_tokens, n_chars,
       |    len(list_distinct(toks))::BIGINT AS n_distinct,
       |    len(list_filter(toks, x -> x IN ($stopList)))::BIGINT AS n_stopwords
       |  FROM t)
       |SELECT doc_id, n_tokens, n_chars, n_distinct, n_stopwords,
       |  round(n_stopwords::DOUBLE / n_tokens, 6) AS stop_ratio,
       |  round(n_distinct::DOUBLE / n_tokens, 6) AS distinct_ratio
       |FROM c ORDER BY doc_id""".stripMargin

  /* ---------------- txt_quality ---------------- */

  private def txtQuality(s: SparkSession, d: String): DataFrame =
    TextAnalysis.qualityScore(Tables.documents(s, d), "doc_id", "text")
      .select(col("doc_id"),
        col("len_score").cast("long").as("len_score"),
        col("tok_score").cast("long").as("tok_score"),
        col("stop_score").cast("long").as("stop_score"),
        col("div_score").cast("long").as("div_score"),
        col("quality").cast("long").as("quality"))
      .orderBy(col("doc_id"))

  // per-doc quality-score CTE chain ending in `sc` — shared by
  // txt_quality and src_quality so the two stay in lockstep
  private val qualityCtes =
    s"""t AS (SELECT doc_id, text,
       |    string_split_regex(lower(trim(text)), '\\s+') AS toks
       |  FROM documents),
       |m AS (SELECT doc_id,
       |    length(text) AS n_chars, len(toks) AS n_tokens,
       |    len(list_filter(toks, x -> x IN ($stopList)))::DOUBLE / len(toks) AS stop_ratio,
       |    len(list_distinct(toks))::DOUBLE / len(toks) AS distinct_ratio
       |  FROM t),
       |sc AS (SELECT doc_id,
       |    (CASE WHEN n_chars > 1500 THEN 20 WHEN n_chars > 800 THEN 15
       |          WHEN n_chars > 300 THEN 10 WHEN n_chars > 100 THEN 5
       |          ELSE 0 END)::BIGINT AS len_score,
       |    (CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 20 ELSE 5 END)::BIGINT AS tok_score,
       |    (CASE WHEN stop_ratio BETWEEN 0.02 AND 0.4 THEN 15 ELSE 0 END)::BIGINT AS stop_score,
       |    (CASE WHEN distinct_ratio > 0.5 THEN 15 ELSE 5 END)::BIGINT AS div_score
       |  FROM m)""".stripMargin

  private val txtQualitySql =
    s"""WITH $qualityCtes
       |SELECT doc_id, len_score, tok_score, stop_score, div_score,
       |  (len_score + tok_score + stop_score + div_score)::BIGINT AS quality
       |FROM sc ORDER BY doc_id""".stripMargin

  /* ---------------- src_quality ---------------- */

  /** Source/domain-level curation rollup (TextAnalysis.sourceQuality):
    * per-source quality/dup/lang aggregates + keep/review/drop
    * decision on the ROUNDED aggregates.
    */
  private def srcQuality(s: SparkSession, d: String): DataFrame =
    TextAnalysis.sourceQuality(
      Tables.documents(s, d), "doc_id", "text", "source", "lang")

  private val srcQualitySql =
    s"""WITH $qualityCtes,
       |dq AS (SELECT d.doc_id, d.source, d.lang, md5(d.text) AS h,
       |    (sc.len_score + sc.tok_score + sc.stop_score + sc.div_score)
       |      AS quality
       |  FROM documents d JOIN sc USING (doc_id)),
       |fl AS (SELECT dq.*,
       |    CASE WHEN count(*) OVER (PARTITION BY h) > 1 THEN 1.0
       |      ELSE 0.0 END AS is_dup FROM dq),
       |ag AS (SELECT source, count(*)::BIGINT AS n_docs,
       |    round(avg(quality) + 0.000000001, 4) AS avg_quality,
       |    round(avg(CASE WHEN quality >= 40 THEN 1.0 ELSE 0.0 END)
       |      + 0.000000001, 4) AS good_share,
       |    round(avg(is_dup) + 0.000000001, 4) AS dup_rate,
       |    round(avg(CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END)
       |      + 0.000000001, 4) AS en_share
       |  FROM fl GROUP BY source)
       |SELECT source, n_docs, avg_quality, good_share, dup_rate, en_share,
       |  CASE WHEN avg_quality >= 40 AND dup_rate <= 0.1 THEN 'keep'
       |       WHEN avg_quality < 25 OR dup_rate > 0.5 THEN 'drop'
       |       ELSE 'review' END AS decision
       |FROM ag ORDER BY source""".stripMargin

  /* ---------------- txt_langid ---------------- */

  private def txtLangid(s: SparkSession, d: String): DataFrame =
    TextAnalysis.languageId(Tables.documents(s, d), "doc_id", "text",
      passThrough = Seq("lang"))
      .select(col("doc_id"),
        col("en_hits").cast("long").as("en_hits"),
        col("de_hits").cast("long").as("de_hits"),
        col("fr_hits").cast("long").as("fr_hits"),
        col("es_hits").cast("long").as("es_hits"),
        col("pred_lang"), col("lang"))
      .orderBy(col("doc_id"))

  private val langHits: Seq[String] = TextAnalysis.langMarkers.map {
    case (lang, markers) =>
      val list = markers.map(TextFns.sqlLit).mkString(", ")
      s"len(list_filter(toks, x -> x IN ($list)))::BIGINT AS ${lang}_hits"
  }

  private val txtLangidSql =
    s"""WITH t AS (SELECT doc_id, lang,
       |    string_split_regex(lower(trim(text)), '\\s+') AS toks
       |  FROM documents),
       |h AS (SELECT doc_id, lang, ${langHits.mkString(",\n    ")}
       |  FROM t)
       |SELECT doc_id, en_hits, de_hits, fr_hits, es_hits,
       |  CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= es_hits THEN 'en'
       |       WHEN de_hits >= fr_hits AND de_hits >= es_hits THEN 'de'
       |       WHEN fr_hits >= es_hits THEN 'fr'
       |       ELSE 'es' END AS pred_lang,
       |  lang
       |FROM h ORDER BY doc_id""".stripMargin

  /* ---------------- txt_keywords ---------------- */

  private def txtKeywords(s: SparkSession, d: String): DataFrame =
    TextAnalysis.topKeywords(Tables.documents(s, d), "text", 50)

  private val txtKeywordsSql =
    s"""WITH tok AS (SELECT
       |    unnest(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
       |           t -> length(t) > 2)) AS token
       |  FROM documents)
       |SELECT token, count(*) AS cnt FROM tok
       |WHERE length(token) > 3 AND token NOT IN ($stopList)
       |GROUP BY token ORDER BY cnt DESC, token LIMIT 50""".stripMargin

  /* ---------------- txt_entities ---------------- */

  private def txtEntities(s: SparkSession, d: String): DataFrame =
    TextAnalysis.extractEntities(
      Tables.part(s, d).select(
        concat_ws(" ", col("p_name"), col("p_brand"), col("p_type")).as("text")),
      "text")
      .orderBy(col("entity"))

  private val txtEntitiesSql =
    """WITH t AS (SELECT concat_ws(' ', p_name, p_brand, p_type) AS text FROM part),
      |e AS (SELECT unnest(regexp_extract_all(text, '[A-Za-z]+#[0-9]+')) AS entity FROM t)
      |SELECT entity, count(*) AS cnt FROM e GROUP BY entity ORDER BY entity""".stripMargin

  /* ---------------- txt_fingerprint ---------------- */

  private def txtFingerprint(s: SparkSession, d: String): DataFrame =
    TextAnalysis.fingerprints(Tables.documents(s, d), "doc_id", "text", 5)
      .orderBy(col("doc_id"))

  private val txtFingerprintSql =
    """WITH n AS (SELECT doc_id,
      |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm,
      |    string_split_regex(lower(trim(text)), '\s+') AS t
      |  FROM documents),
      |ix AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 4)) AS i FROM n),
      |sh AS (SELECT doc_id,
      |    t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4] AS s
      |  FROM ix),
      |m AS (SELECT doc_id, min(md5(s)) AS min_shingle_fp FROM sh GROUP BY doc_id)
      |SELECT n.doc_id, substr(md5(n.norm), 1, 16) AS content_fp, m.min_shingle_fp
      |FROM n LEFT JOIN m ON n.doc_id = m.doc_id ORDER BY n.doc_id""".stripMargin

  /* ---------------- chunk_fixed ---------------- */

  private def chunkFixed(s: SparkSession, d: String): DataFrame =
    Chunker.fixedChunks(Tables.documents(s, d), "doc_id", "text", 200, 50)
      .select(col("doc_id"),
        col("chunk_index").cast("long").as("chunk_index"),
        col("chunk_text"),
        col("chunk_len").cast("long").as("chunk_len"))
      .orderBy(col("doc_id"), col("chunk_index"))

  private val chunkFixedSql =
    s"""WITH ${SqlSnippets.chunkCtes(200, 150)}
       |SELECT doc_id, chunk_index, chunk_text,
       |  length(chunk_text)::BIGINT AS chunk_len
       |FROM ch ORDER BY doc_id, chunk_index""".stripMargin

  /* ---------------- chunk_filtered ---------------- */

  private val JunkKw = Seq("error", "null")

  /** Chunk + junk filter (BioPaperSplitter post-filter analog):
    * chunks shorter than 100 trimmed chars, mostly non-alphabetic,
    * or hitting > 1 boilerplate keyword are dropped before indexing.
    */
  private def chunkFiltered(s: SparkSession, d: String): DataFrame =
    Chunker.filterJunk(
      Chunker.fixedChunks(Tables.documents(s, d), "doc_id", "text", 200, 50),
      "chunk_text", minChars = 100, minAlphaRatio = 0.5,
      junkKeywords = JunkKw, maxJunkHits = 1)
      .select(col("doc_id"),
        col("chunk_index").cast("long").as("chunk_index"),
        col("chunk_text"),
        col("chunk_len").cast("long").as("chunk_len"))
      .orderBy(col("doc_id"), col("chunk_index"))

  private val chunkFilteredSql = {
    val junkHits = JunkKw
      .map(k => s"(CASE WHEN strpos(tr, '$k') > 0 THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH ${SqlSnippets.chunkCtes(200, 150)},
       |cf AS (SELECT doc_id, chunk_index, chunk_text,
       |    trim(chunk_text) AS tr FROM ch)
       |SELECT doc_id, chunk_index, chunk_text,
       |  length(chunk_text)::BIGINT AS chunk_len
       |FROM cf
       |WHERE length(tr) >= 100
       |  AND length(regexp_replace(tr, '[^a-zA-Z]', '', 'g')) >= 0.5 * length(tr)
       |  AND ($junkHits) <= 1
       |ORDER BY doc_id, chunk_index""".stripMargin
  }

  /* ---------------- chunk_sections ---------------- */

  /** Section names come from the reference's paper sections
    * (text_splitter.py emits methods/results/discussion/background);
    * the MARKERS are the demo binding for the synthetic engine-domain
    * corpus — production swaps in real header keywords, the
    * earliest-marker rule is unchanged.
    */
  val SectionMarkers: Seq[(String, String)] = Seq(
    "join" -> "methods",
    "scan" -> "results",
    "stream" -> "discussion",
    "vector" -> "background")

  val DefaultSection = "other"

  private def chunkSections(s: SparkSession, d: String): DataFrame =
    Chunker.tagSections(
      Chunker.fixedChunks(Tables.documents(s, d), "doc_id", "text", 200, 50),
      "chunk_text", SectionMarkers, DefaultSection)
      .select(col("doc_id"),
        col("chunk_index").cast("long").as("chunk_index"),
        col("section"),
        col("chunk_len").cast("long").as("chunk_len"))
      .orderBy(col("doc_id"), col("chunk_index"))

  private val chunkSectionsSql =
    s"""WITH ${SqlSnippets.chunkCtes(200, 150)},
       |sp AS (SELECT doc_id, chunk_index, chunk_text,
       |    ${SqlSnippets.sectionPosCols(SectionMarkers, "chunk_text")}
       |  FROM ch)
       |SELECT doc_id, chunk_index,
       |  ${SqlSnippets.sectionCase(SectionMarkers, DefaultSection)} AS section,
       |  length(chunk_text)::BIGINT AS chunk_len
       |FROM sp ORDER BY doc_id, chunk_index""".stripMargin

  /* ---------------- lens_classify ---------------- */

  private def lensClassify(s: SparkSession, d: String): DataFrame = {
    val base = TextAnalysis.lensClassify(Tables.documents(s, d), "doc_id", "text")
    val hitCols = TextAnalysis.lenses.map { case (l, _) =>
      col(s"${l}_hits").cast("long").as(s"${l}_hits")
    }
    base.select(Seq(col("doc_id")) ++ hitCols :+ col("lens"): _*)
      .orderBy(col("doc_id"))
  }

  private val lensHits: Seq[String] = TextAnalysis.lenses.map {
    case (lens, kws) =>
      val cases = kws.map(w =>
        s"(CASE WHEN strpos(text, ${TextFns.sqlLit(w)}) > 0 THEN 1 ELSE 0 END)").mkString(" + ")
      s"($cases)::BIGINT AS ${lens}_hits"
  }

  private val lensClassifySql =
    s"""WITH h AS (SELECT doc_id, ${lensHits.mkString(",\n    ")}
       |  FROM documents)
       |SELECT doc_id, performance_hits, execution_hits, data_model_hits, streaming_hits,
       |  CASE WHEN performance_hits >= execution_hits AND performance_hits >= data_model_hits
       |            AND performance_hits >= streaming_hits THEN 'performance'
       |       WHEN execution_hits >= data_model_hits AND execution_hits >= streaming_hits
       |            THEN 'execution'
       |       WHEN data_model_hits >= streaming_hits THEN 'data_model'
       |       ELSE 'streaming' END AS lens
       |FROM h ORDER BY doc_id""".stripMargin

  /* ---------------- corpus_stats ---------------- */

  /** Collection-level statistics — the reference's
    * get_collection_stats analog (vector_store.py:461: total chunks,
    * per-section counts, model/dim metadata). Sections map to
    * `source`; one map-side-combinable groupBy plus a broadcast
    * 1-row total.
    */
  private def corpusStats(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val totals = docs.agg(
      count(lit(1)).as("total_docs"),
      sum(col("n_chars")).as("total_chars"))
    docs.groupBy(col("source"))
      .agg(count(lit(1)).as("docs"),
        sum(col("n_chars")).as("chars"),
        round(avg(col("n_chars")) + lit(1e-9), 4).as("avg_chars"),
        countDistinct(col("lang")).as("n_langs"))
      .crossJoin(broadcast(totals))
      .withColumn("doc_share",
        round(col("docs").cast("double") / col("total_docs"), 6))
      .select(col("source"), col("docs"), col("chars"), col("avg_chars"),
        col("n_langs"), col("total_docs"), col("total_chars"), col("doc_share"))
      .orderBy(col("source"))
  }

  private val corpusStatsSql =
    """WITH t AS (SELECT count(*)::BIGINT AS total_docs,
      |    sum(n_chars)::BIGINT AS total_chars FROM documents),
      |g AS (SELECT source, count(*)::BIGINT AS docs,
      |    sum(n_chars)::BIGINT AS chars,
      |    round(avg(n_chars) + 0.000000001, 4) AS avg_chars,
      |    count(DISTINCT lang)::BIGINT AS n_langs
      |  FROM documents GROUP BY source)
      |SELECT source, docs, chars, avg_chars, n_langs,
      |  t.total_docs, t.total_chars,
      |  round(docs::DOUBLE / t.total_docs, 6) AS doc_share
      |FROM g CROSS JOIN t ORDER BY source""".stripMargin

  /* ---------------- txt_token_count ---------------- */

  /** LLM-token estimation: whitespace tokens plus a BPE-ish estimate —
    * alnum runs split into ceil(len/4) pieces (the ~4-chars-per-token
    * heuristic of byte-pair vocabularies) and every other non-space
    * character as its own token. Narrow codegen'd projection.
    */
  private def txtTokenCount(s: SparkSession, d: String): DataFrame = {
    val runs = regexp_extract_all(col("text"), lit("[A-Za-z0-9]+"), lit(0))
    val pieceTokens = aggregate(
      transform(runs, t => ((length(t) + lit(3)) / lit(4)).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val punctTokens = size(regexp_extract_all(
      col("text"), lit("[^A-Za-z0-9\\s]"), lit(0))).cast("long")
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(TextFns.wsTokens(col("text"))).cast("long").as("ws_tokens"),
        pieceTokens.as("piece_tokens"),
        punctTokens.as("punct_tokens"),
        col("n_chars"))
      .withColumn("est_tokens", col("piece_tokens") + col("punct_tokens"))
      .withColumn("chars_per_token", round(
        col("n_chars").cast("double") /
          greatest(col("est_tokens").cast("double"), lit(1.0)), 4))
      .orderBy(col("doc_id"))
  }

  private val txtTokenCountSql =
    """WITH t AS (SELECT doc_id, text, n_chars FROM documents),
      |r AS (SELECT doc_id, unnest(regexp_extract_all(text, '[A-Za-z0-9]+')) AS run
      |  FROM t),
      |p AS (SELECT doc_id, sum((length(run) + 3) // 4)::BIGINT AS piece_tokens
      |  FROM r GROUP BY doc_id),
      |b AS (SELECT t.doc_id,
      |    len(string_split_regex(lower(trim(t.text)), '\s+'))::BIGINT AS ws_tokens,
      |    coalesce(p.piece_tokens, 0)::BIGINT AS piece_tokens,
      |    len(regexp_extract_all(t.text, '[^A-Za-z0-9\s]'))::BIGINT AS punct_tokens,
      |    t.n_chars
      |  FROM t LEFT JOIN p ON t.doc_id = p.doc_id)
      |SELECT doc_id, ws_tokens, piece_tokens, punct_tokens, n_chars,
      |  (piece_tokens + punct_tokens)::BIGINT AS est_tokens,
      |  round(n_chars::DOUBLE /
      |        greatest((piece_tokens + punct_tokens)::DOUBLE, 1.0), 4)
      |    AS chars_per_token
      |FROM b ORDER BY doc_id""".stripMargin

  /* ---------------- txt_lm_score ---------------- */

  private val LmAlpha = 0.5

  /** Corpus-trained add-α bigram LM quality score (see
    * TextAnalysis.lmScore): per-doc mean bigram log-probability, the
    * CCNet/KenLM-style perplexity-proxy filter.
    */
  private def txtLmScore(s: SparkSession, d: String): DataFrame =
    TextAnalysis.lmScore(Tables.documents(s, d), "doc_id", "text", LmAlpha)

  /** Replays the same single-pass derivation: everything comes from
    * the (doc, bigram, cnt) frame; contexts/vocab from the bigram
    * totals; ln of the identical smoothed ratio.
    */
  private val txtLmScoreSql =
    s"""WITH toks AS (SELECT doc_id,
       |    string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents),
       |ix AS (SELECT doc_id, t,
       |    unnest(generate_series(1, len(t) - 1)) AS i FROM toks),
       |bgr AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS g FROM ix),
       |dbg AS (SELECT doc_id, g, count(*)::BIGINT AS cnt
       |  FROM bgr GROUP BY 1, 2),
       |cg AS (SELECT g, sum(cnt)::BIGINT AS c2,
       |    split_part(g, ' ', 1) AS w1 FROM dbg GROUP BY g),
       |cw AS (SELECT w1, sum(c2)::BIGINT AS c1 FROM cg GROUP BY w1),
       |vv AS (SELECT count(DISTINCT split_part(g, ' ', 2))::DOUBLE AS v
       |  FROM cg),
       |lp AS (SELECT g,
       |    ln((c2 + $LmAlpha) / (c1 + $LmAlpha * (SELECT v FROM vv))) AS logp
       |  FROM cg JOIN cw USING (w1)),
       |sc AS (SELECT doc_id, sum(cnt)::BIGINT AS n_bigrams,
       |    sum(cnt * logp) / sum(cnt)::DOUBLE AS alp
       |  FROM dbg JOIN lp USING (g) GROUP BY doc_id)
       |SELECT doc_id, n_bigrams, round(alp + 0.000000001, 6) AS avg_logprob
       |FROM sc ORDER BY avg_logprob, doc_id""".stripMargin

  /* ---------------- pack_shards ---------------- */

  private val ShardBudget = 10000L

  /** Token estimate for packing: the ~4-chars-per-token heuristic on
    * n_chars (kept deliberately simple so the oracle shares the exact
    * integer arithmetic; txt_token_count carries the richer
    * estimator).
    */
  private def packShards(s: SparkSession, d: String): DataFrame =
    Pack.packByTokenBudget(
      Tables.documents(s, d)
        .select(col("doc_id"),
          expr("n_chars div 4 + 1").as("est_tokens")),
      "doc_id", "est_tokens", ShardBudget)
      .select(col("doc_id"), col("est_tokens"),
        col("cum_tokens"), col("shard_id"))
      .orderBy(col("doc_id"))

  private val packShardsSql =
    s"""WITH t AS (SELECT doc_id, n_chars // 4 + 1 AS est_tokens
       |  FROM documents),
       |c AS (SELECT doc_id, est_tokens,
       |    (sum(est_tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
       |      AS cum_tokens
       |  FROM t)
       |SELECT doc_id, est_tokens, cum_tokens,
       |  ((cum_tokens - est_tokens) // $ShardBudget)::BIGINT AS shard_id
       |FROM c ORDER BY doc_id""".stripMargin

  /* ---------------- pack_audit ---------------- */

  /** budget 10000 = 5 × seqLen 2000: sequence cuts align to shard
    * boundaries (the sequenceAudit contract). */
  private val AuditSeqLen = 2000L

  private def packAudit(s: SparkSession, d: String): DataFrame =
    Pack.sequenceAudit(
      Pack.packByTokenBudget(
        Tables.documents(s, d)
          .select(col("doc_id"),
            expr("n_chars div 4 + 1").as("est_tokens")),
        "doc_id", "est_tokens", ShardBudget),
      "est_tokens", AuditSeqLen)
      .orderBy(col("shard_id"))

  private val packAuditSql =
    s"""WITH t AS (SELECT doc_id, n_chars // 4 + 1 AS est_tokens
       |  FROM documents),
       |c AS (SELECT doc_id, est_tokens,
       |    (sum(est_tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
       |      AS cum_tokens
       |  FROM t),
       |p AS (SELECT
       |    ((cum_tokens - est_tokens) // $ShardBudget)::BIGINT AS shard_id,
       |    est_tokens,
       |    CASE WHEN est_tokens > 0
       |      THEN (cum_tokens - est_tokens) // $AuditSeqLen END AS sf,
       |    CASE WHEN est_tokens > 0
       |      THEN (cum_tokens - 1) // $AuditSeqLen END AS sl
       |  FROM c)
       |SELECT shard_id, count(*)::BIGINT AS n_docs,
       |  sum(est_tokens)::BIGINT AS shard_tokens,
       |  coalesce(max(sl) - min(sf) + 1, 0)::BIGINT AS n_seqs,
       |  sum(CASE WHEN sl > sf THEN 1 ELSE 0 END)::BIGINT AS crossing_docs,
       |  round(sum(CASE WHEN sl > sf THEN 1 ELSE 0 END)::DOUBLE / count(*)
       |    + 0.000000001, 6) AS crossing_frac
       |FROM p GROUP BY shard_id ORDER BY shard_id""".stripMargin

  /* ---------------- txt_scrub ---------------- */

  /** Scrub binding on the part descriptions (the corpus slice that
    * actually contains code/number patterns): entity codes masked
    * first, remaining digit runs second — order matters and is
    * identical in the oracle.
    */
  private val ScrubPatterns: Seq[(String, String, String)] = Seq(
    ("entity", "[A-Za-z]+#[0-9]+", "[ENT]"),
    ("num", "[0-9]+", "[NUM]"))

  private def txtScrub(s: SparkSession, d: String): DataFrame =
    TextAnalysis.scrub(
      Tables.part(s, d).select(col("p_partkey"),
        concat_ws(" ", col("p_name"), col("p_brand"), col("p_type")).as("text")),
      "p_partkey", "text", ScrubPatterns)
      .orderBy(col("p_partkey"))

  private val txtScrubSql = {
    val Seq((n1, p1, r1), (n2, p2, r2)) = ScrubPatterns
    s"""WITH t AS (SELECT p_partkey,
       |    concat_ws(' ', p_name, p_brand, p_type) AS text FROM part),
       |m1 AS (SELECT p_partkey,
       |    len(regexp_extract_all(text, '$p1'))::BIGINT AS n_$n1,
       |    regexp_replace(text, '$p1', '$r1', 'g') AS t1
       |  FROM t)
       |SELECT p_partkey, n_$n1,
       |  len(regexp_extract_all(t1, '$p2'))::BIGINT AS n_$n2,
       |  regexp_replace(t1, '$p2', '$r2', 'g') AS scrubbed
       |FROM m1 ORDER BY p_partkey""".stripMargin
  }

  /* ---------------- txt_repetition ---------------- */

  private def txtRepetition(s: SparkSession, d: String): DataFrame =
    TextAnalysis.repetition(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"))

  private val txtRepetitionSql =
    """WITH t AS (SELECT doc_id,
      |    string_split_regex(lower(trim(text)), '\s+') AS tk
      |  FROM documents),
      |uc AS (SELECT doc_id, g, count(*) AS c
      |  FROM (SELECT doc_id, unnest(tk) AS g FROM t) GROUP BY doc_id, g),
      |ua AS (SELECT doc_id, sum(c)::BIGINT AS n_tokens,
      |    count(*)::BIGINT AS n_distinct, max(c)::BIGINT AS top_c
      |  FROM uc GROUP BY doc_id),
      |bx AS (SELECT doc_id, tk,
      |    unnest(generate_series(1, len(tk) - 1)) AS i FROM t),
      |bc AS (SELECT doc_id, g, count(*) AS c
      |  FROM (SELECT doc_id, tk[i] || ' ' || tk[i+1] AS g FROM bx)
      |  GROUP BY doc_id, g),
      |ba AS (SELECT doc_id, sum(c)::BIGINT AS n_bigrams,
      |    max(c)::BIGINT AS top_bc
      |  FROM bc GROUP BY doc_id)
      |SELECT ua.doc_id, n_tokens,
      |  round(1.0 - n_distinct::DOUBLE / n_tokens + 0.000000001, 6)
      |    AS dup_token_frac,
      |  round(top_c::DOUBLE / n_tokens + 0.000000001, 6) AS top_token_frac,
      |  round(top_bc::DOUBLE / n_bigrams + 0.000000001, 6) AS top_bigram_frac
      |FROM ua LEFT JOIN ba ON ua.doc_id = ba.doc_id
      |ORDER BY ua.doc_id""".stripMargin

  /* ---------------- trend_gaps ---------------- */

  /** Gap patterns in the reference's (pattern, report) shape
    * (trend_analyzer.py:284 _identify_gaps), with engine-domain terms
    * so some patterns ARE present in the corpus keyword set (filtered
    * out) and the survivors are data-dependent.
    */
  val gapPatterns: Seq[(String, String)] = Seq(
    "stream" -> "streaming coverage needed",
    "window" -> "windowed-analysis studies needed",
    "benchmark" -> "benchmark validation needed",
    "failover" -> "failover testing needed",
    "compaction" -> "compaction tuning studies needed",
    "lineage" -> "lineage tracking studies needed",
    "checkpoint" -> "checkpoint recovery studies needed")

  private def trendGaps(s: SparkSession, d: String): DataFrame =
    Trends.gaps(
      TextAnalysis.topKeywords(Tables.documents(s, d), "text", 50),
      "token", gapPatterns, 5)

  private val trendGapsSql = {
    val values = gapPatterns.zipWithIndex
      .map { case ((p, msg), i) => s"($i, '$p', '$msg')" }
      .mkString(",\n    ")
    s"""WITH tok AS (SELECT
       |    unnest(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
       |           t -> length(t) > 2)) AS token
       |  FROM documents),
       |kw AS (SELECT token FROM (
       |    SELECT token, count(*) AS cnt FROM tok
       |    WHERE length(token) > 3 AND token NOT IN ($stopList)
       |    GROUP BY token ORDER BY cnt DESC, token LIMIT 50)),
       |pat(pid, pattern, gap_msg) AS (VALUES
       |    $values)
       |SELECT pattern, gap_msg FROM pat
       |WHERE pattern NOT IN (SELECT token FROM kw)
       |ORDER BY pid LIMIT 5""".stripMargin
  }

  /* ---------------- topic_trends ---------------- */

  /** Lens classification joined to year trend windows (the synthetic
    * year binding matches rerank_recency: 2016 + doc_id % 10, midpoint
    * 2020 → early years 2016-2020, late 2021-2025).
    */
  private def topicTrends(s: SparkSession, d: String): DataFrame =
    Trends.topicGrowth(
      TextAnalysis.lensClassify(Tables.documents(s, d), "doc_id", "text")
        .select(col("doc_id"), col("lens"),
          (lit(2016) + pmod(col("doc_id"), lit(10))).as("year")),
      "lens", "year", midYear = 2020)
      .select(col("lens"),
        col("early_cnt").cast("long").as("early_cnt"),
        col("late_cnt").cast("long").as("late_cnt"),
        col("growth_ratio"), col("trend"))
      .orderBy(col("lens"))

  private val topicTrendsSql =
    s"""WITH h AS (SELECT doc_id, ${lensHits.mkString(",\n    ")}
       |  FROM documents),
       |c AS (SELECT doc_id,
       |  CASE WHEN performance_hits >= execution_hits AND performance_hits >= data_model_hits
       |            AND performance_hits >= streaming_hits THEN 'performance'
       |       WHEN execution_hits >= data_model_hits AND execution_hits >= streaming_hits
       |            THEN 'execution'
       |       WHEN data_model_hits >= streaming_hits THEN 'data_model'
       |       ELSE 'streaming' END AS lens,
       |  (2016 + doc_id % 10) AS year
       |  FROM h),
       |g AS (SELECT lens,
       |    sum(CASE WHEN year <= 2020 THEN 1 ELSE 0 END)::BIGINT AS early_cnt,
       |    sum(CASE WHEN year > 2020 THEN 1 ELSE 0 END)::BIGINT AS late_cnt
       |  FROM c GROUP BY lens)
       |SELECT lens, early_cnt, late_cnt,
       |  round(late_cnt::DOUBLE / greatest(early_cnt::DOUBLE, 1.0), 6) AS growth_ratio,
       |  CASE WHEN round(late_cnt::DOUBLE / greatest(early_cnt::DOUBLE, 1.0), 6) > 1.1
       |         THEN 'rising'
       |       WHEN round(late_cnt::DOUBLE / greatest(early_cnt::DOUBLE, 1.0), 6) < 0.9
       |         THEN 'declining'
       |       ELSE 'stable' END AS trend
       |FROM g ORDER BY lens""".stripMargin

  /* ---------------- trend_topics ---------------- */

  /** Emerging/declining/stable keyword detection
    * (trend_analyzer.py:232 _detect_trends): years 2016-2023 from
    * doc_id residues; the recent half's docs carry a tripled
    * 'trendmarker' token and the older half a tripled 'fadingmarker'
    * (ranked #1 per year at sf0.01), so the emerging and declining
    * ladders both fire on signal that's real within the synthetic
    * corpus; the common corpus vocabulary lands stable.
    */
  private def trendTopics2(s: SparkSession, d: String): DataFrame =
    Trends.keywordTrends(
      Tables.documents(s, d).select(
        (lit(2016) + pmod(col("doc_id"), lit(8))).cast("long")
          .as("year"),
        concat(col("text"),
          when(pmod(col("doc_id"), lit(8)) >= 4,
            lit(" trendmarker trendmarker trendmarker"))
            .otherwise(lit(" fadingmarker fadingmarker fadingmarker")))
          .as("text")),
      "year", "text")
      .orderBy(col("trend"), col("rnk"))

  private val trendTopicsSql = {
    val trendStop = Trends.trendStopwords
      .map(w => s"'$w'").mkString(", ")
    s"""WITH td AS (SELECT 2016 + doc_id % 8 AS year,
       |    text || (CASE WHEN doc_id % 8 >= 4
       |      THEN ' trendmarker trendmarker trendmarker'
       |      ELSE ' fadingmarker fadingmarker fadingmarker' END)
       |      AS text
       |  FROM documents),
       |ttk AS (SELECT year,
       |    unnest(regexp_extract_all(lower(text), '[a-z]{3,}'))
       |      AS keyword
       |  FROM td WHERE year > 0),
       |tcn AS (SELECT year, keyword, count(*)::BIGINT AS c FROM ttk
       |  WHERE length(keyword) > 3 AND keyword NOT IN ($trendStop)
       |  GROUP BY 1, 2),
       |ttp AS (SELECT *, row_number() OVER (PARTITION BY year
       |    ORDER BY c DESC, keyword) AS r FROM tcn),
       |tt2 AS (SELECT * FROM ttp WHERE r <= 20),
       |tyr AS (SELECT year, row_number() OVER (ORDER BY year) - 1
       |      AS idx, count(*) OVER () AS ny
       |  FROM (SELECT DISTINCT year FROM tt2)),
       |tyr2 AS (SELECT * FROM tyr WHERE ny >= 2),
       |thl AS (SELECT keyword,
       |    sum(CASE WHEN idx < ny // 2 THEN c ELSE 0 END)::BIGINT
       |      AS older_count,
       |    sum(CASE WHEN idx >= ny // 2 THEN c ELSE 0 END)::BIGINT
       |      AS recent_count
       |  FROM tt2 JOIN tyr2 USING (year) GROUP BY keyword),
       |tcl AS (SELECT keyword, older_count, recent_count,
       |    CASE WHEN older_count = 0 AND recent_count > 5
       |           THEN 'emerging'
       |         WHEN recent_count > older_count * 2
       |           AND recent_count > 5 THEN 'emerging'
       |         WHEN older_count > recent_count * 2
       |           AND older_count > 5 THEN 'declining'
       |         WHEN recent_count > 5 AND older_count > 5
       |           AND recent_count / older_count >= 0.5
       |           AND recent_count / older_count <= 2.0 THEN 'stable'
       |         END AS trend
       |  FROM thl),
       |tfn AS (SELECT *, row_number() OVER (PARTITION BY trend
       |      ORDER BY (older_count + recent_count) DESC,
       |        keyword)::BIGINT AS rnk
       |  FROM tcl WHERE trend IS NOT NULL)
       |SELECT trend, keyword, older_count, recent_count, rnk
       |FROM tfn WHERE rnk <= 10
       |ORDER BY trend, rnk""".stripMargin
  }

  /* ---------------- vocab_match ---------------- */

  /** Vocabulary match scoring (medical_vocabulary.py:339
    * match_score): the corpus vocabulary stands in for the MeSH
    * entry — every class is live at sf0.01 (primary 'spark',
    * synonyms stream/window, abbreviations agg/dup with the
    * word-boundary regex, related join/scan, exclusion 'slow').
    * max_possible = 1 + 2·0.9 + 2·0.85 = 4.5.
    */
  private val VocabDemo = TextAnalysis.VocabPanel(
    primary = "spark",
    synonyms = Seq("stream", "window"),
    abbreviations = Seq("agg", "dup"),
    related = Seq("join", "scan"),
    exclusions = Seq("slow"))

  private def vocabMatch(s: SparkSession, d: String): DataFrame =
    TextAnalysis.vocabMatch(Tables.documents(s, d), "doc_id", "text",
      VocabDemo)
      .orderBy(col("doc_id"))

  private val vocabMatchSql = {
    val p = VocabDemo
    def sub(t: String, w: Double) =
      s"CASE WHEN strpos(lower(text), '${t.toLowerCase}') > 0 THEN $w ELSE 0.0 END"
    def abbr(t: String, w: Double) = {
      val pat = TextAnalysis.abbrPattern(t).replace("'", "''")
      s"CASE WHEN regexp_matches(text, '$pat') THEN $w ELSE 0.0 END"
    }
    val rawParts =
      (Seq(sub(p.primary, 1.0)) ++
        p.synonyms.map(sub(_, 0.9)) ++
        p.abbreviations.map(abbr(_, 0.85)) ++
        p.related.map(sub(_, 0.5)) ++
        p.exclusions.map(sub(_, -0.5))).mkString("\n      + ")
    val nParts =
      (Seq(s"CASE WHEN strpos(lower(text), '${p.primary}') > 0 THEN 1 ELSE 0 END") ++
        p.synonyms.map(t => s"CASE WHEN strpos(lower(text), '$t') > 0 THEN 1 ELSE 0 END") ++
        p.abbreviations.map(t => s"CASE WHEN regexp_matches(text, '${TextAnalysis.abbrPattern(t).replace("'", "''")}') THEN 1 ELSE 0 END") ++
        p.related.map(t => s"CASE WHEN strpos(lower(text), '$t') > 0 THEN 1 ELSE 0 END") ++
        p.exclusions.map(t => s"CASE WHEN strpos(lower(text), '$t') > 0 THEN 1 ELSE 0 END"))
        .mkString("\n      + ")
    val exclCond = p.exclusions
      .map(t => s"strpos(lower(text), '$t') > 0").mkString(" OR ")
    s"""WITH vm AS (SELECT doc_id,
       |    ($rawParts) AS raw,
       |    ($nParts)::BIGINT AS n_matches,
       |    strpos(lower(text), '${p.primary}') > 0 AS has_primary,
       |    ($exclCond) AS has_exclusion
       |  FROM documents)
       |SELECT doc_id, n_matches,
       |  round(raw + 0.000000001, 6) AS raw_score,
       |  round(greatest(0.0, least(1.0, raw / ${p.maxPossible}))
       |    + 0.000000001, 6) AS score,
       |  has_primary, has_exclusion
       |FROM vm ORDER BY doc_id""".stripMargin
  }

  /* ---------------- trend_match ---------------- */

  /** Curated trend panel over the corpus vocabulary — every scoring
    * leg (keyword 15, gene-boundary 10, MeSH 8, title-top-3 bonus 20)
    * is live at sf0.01. The reference's panel is its ONCOLOGY_TRENDS
    * table (oncology_trends.py:104); definitions are data here like
    * every other panel.
    */
  private val TrendPanel = Seq(
    Trends.TrendDef("exec_engine", "execution",
      Seq("join", "merge", "hash"), Seq("scan", "sort"), Seq("table")),
    Trends.TrendDef("streaming", "realtime",
      Seq("stream", "window", "batch"), Seq("dup"), Seq("order")),
    Trends.TrendDef("vector_search", "retrieval",
      Seq("vector", "query", "fast"), Seq("key"), Seq("line")))

  /** Primary-trend classification (oncology_trends.py:62,:344,:377):
    * title = first 60 chars, abstract = the rest — the split
    * exercises the title-bonus leg separately from the body.
    */
  private def trendMatchQ(s: SparkSession, d: String): DataFrame =
    Trends.trendMatch(
      Tables.documents(s, d).select(col("doc_id"),
        substring(col("text"), 1, 60).as("title"),
        substring(col("text"), 61, 1048576).as("abstract")),
      "doc_id", "title", "abstract", TrendPanel)
      .orderBy(col("doc_id"))

  private val trendMatchSql = {
    val n = TrendPanel.size
    def scoreSql(t: Trends.TrendDef, i: Int): String = {
      val parts =
        t.keywords.map(kw =>
          s"CASE WHEN strpos(txt, '${kw.toLowerCase}') > 0 THEN 15 ELSE 0 END") ++
        t.genes.map(g =>
          s"CASE WHEN regexp_matches(txt, '${TextAnalysis.abbrPattern(g)}') THEN 10 ELSE 0 END") ++
        t.mesh.map(m =>
          s"CASE WHEN strpos(txt, '${m.toLowerCase}') > 0 THEN 8 ELSE 0 END") ++
        t.keywords.take(3).map(kw =>
          s"CASE WHEN strpos(tl, '${kw.toLowerCase}') > 0 THEN 20 ELSE 0 END")
      s"least(100, ${parts.mkString("\n      + ")})::BIGINT AS s_$i"
    }
    // first-definition-wins argmax ladder (the reference's stable
    // sort): trend i wins when its score >= every later trend's
    def ladder(pick: Trends.TrendDef => String): String =
      TrendPanel.zipWithIndex.map { case (t, i) =>
        if (i < n - 1) {
          val conds = (i + 1 until n).map(j => s"s_$i >= s_$j")
            .mkString(" AND ")
          s"WHEN $conds THEN '${pick(t)}'"
        } else s"ELSE '${pick(t)}'"
      }.mkString("CASE ", " ", " END")
    val scoreCols = TrendPanel.zipWithIndex
      .map { case (t, i) => scoreSql(t, i) }.mkString(",\n    ")
    val greatestAll = (0 until n).map(i => s"s_$i").mkString(", ")
    s"""WITH tm9 AS (SELECT doc_id, substr(text, 1, 60) AS title,
       |    substr(text, 61, 1048576) AS abstract FROM documents),
       |tx9 AS (SELECT doc_id, lower(title || ' ' || abstract) AS txt,
       |    lower(title) AS tl FROM tm9),
       |sc9 AS (SELECT doc_id,
       |    $scoreCols
       |  FROM tx9),
       |bf9 AS (SELECT doc_id,
       |    ${ladder(_.id)} AS trend_id,
       |    ${ladder(_.category)} AS category,
       |    greatest($greatestAll)::BIGINT AS score
       |  FROM sc9)
       |SELECT doc_id, trend_id, category, score FROM bf9
       |WHERE score >= 30 ORDER BY doc_id""".stripMargin
  }

  /* ---------------- trend_validate ---------------- */

  /** Trend validation scoring (trend_validator.py:561-733,:834): the
    * signals table is synthesized from order-key residues with
    * multipliers chosen so every branch of every ladder fires —
    * growth rates cross negative..109, volumes cross all four
    * thresholds, the gap ratio spans 0..11. The reference's signal
    * extraction is PubMed/ClinicalTrials HTTP, out of scope; scoring
    * a signals table is the deterministic analytics.
    */
  private val TvKeys = 40

  private def trendValidateQ(s: SparkSession, d: String): DataFrame = {
    val kid = col("kid")
    val signals = Tables.lineitem(s, d)
      .select(pmod(col("l_orderkey"), lit(TvKeys)).cast("long")
        .as("kid"))
      .distinct()
      .select(
        concat(lit("kw"), kid.cast("string")).as("keyword"),
        (pmod(kid * 7, lit(120)) - 10).cast("double")
          .as("growth_rate_5yr"),
        (pmod(kid * 11, lit(40)) - 5).cast("double")
          .as("growth_rate_yoy"),
        (pmod(kid * 13, lit(15)) * 1000 + pmod(kid, lit(4)) * 50)
          .as("total_papers_5yr"),
        pmod(kid * 3, lit(60)).as("unique_journals"),
        pmod(kid, lit(7)).as("high_if_journals"),
        pmod(kid * 17, lit(55)).as("systematic_reviews"),
        pmod(kid * 5, lit(25)).as("meta_analyses"),
        pmod(kid * 23, lit(110)).as("active_clinical_trials"),
        pmod(kid, lit(12)).as("phase3_trials"),
        pmod(kid * 19, lit(12)).cast("double").as("gap_ratio"))
    Trends.validateTrends(signals).orderBy(col("keyword"))
  }

  private val trendValidateSql =
    s"""WITH tv0 AS (SELECT DISTINCT (l_orderkey % $TvKeys)::BIGINT
       |      AS kid FROM lineitem),
       |tvs AS (SELECT 'kw' || kid::VARCHAR AS keyword,
       |    ((kid * 7) % 120 - 10)::DOUBLE AS g5,
       |    ((kid * 11) % 40 - 5)::DOUBLE AS gy,
       |    ((kid * 13) % 15 * 1000 + (kid % 4) * 50)::BIGINT AS tp,
       |    ((kid * 3) % 60)::BIGINT AS uj,
       |    (kid % 7)::BIGINT AS hj,
       |    ((kid * 17) % 55)::BIGINT AS sr,
       |    ((kid * 5) % 25)::BIGINT AS ma,
       |    ((kid * 23) % 110)::BIGINT AS ct,
       |    (kid % 12)::BIGINT AS p3,
       |    ((kid * 19) % 12)::DOUBLE AS gr
       |  FROM tv0),
       |tvc AS (SELECT keyword,
       |    least(100.0,
       |      CASE WHEN g5 >= 100 THEN 50.0 WHEN g5 >= 50 THEN 40.0
       |           WHEN g5 >= 25 THEN 30.0 WHEN g5 >= 10 THEN 20.0
       |           WHEN g5 > 0 THEN 10.0 ELSE 0.0 END
       |      + CASE WHEN gy >= 30 THEN 30.0 WHEN gy >= 15 THEN 20.0
       |           WHEN gy >= 5 THEN 10.0 ELSE 0.0 END
       |      + CASE WHEN tp >= 10000 THEN 20.0 WHEN tp >= 5000 THEN 15.0
       |           WHEN tp >= 1000 THEN 10.0 WHEN tp >= 100 THEN 5.0
       |           ELSE 0.0 END) AS publication_score,
       |    least(100.0,
       |      CASE WHEN uj >= 50 THEN 60.0 WHEN uj >= 30 THEN 45.0
       |           WHEN uj >= 15 THEN 30.0 WHEN uj >= 5 THEN 15.0
       |           ELSE 0.0 END
       |      + CASE WHEN hj >= 5 THEN 40.0 WHEN hj >= 3 THEN 30.0
       |           WHEN hj >= 1 THEN 15.0 ELSE 0.0 END)
       |      AS diversity_score,
       |    least(100.0,
       |      CASE WHEN sr >= 50 THEN 60.0 WHEN sr >= 20 THEN 45.0
       |           WHEN sr >= 10 THEN 30.0 WHEN sr >= 5 THEN 20.0
       |           WHEN sr >= 1 THEN 10.0 ELSE 0.0 END
       |      + CASE WHEN ma >= 20 THEN 40.0 WHEN ma >= 10 THEN 30.0
       |           WHEN ma >= 5 THEN 20.0 WHEN ma >= 1 THEN 10.0
       |           ELSE 0.0 END) AS review_score,
       |    least(100.0,
       |      CASE WHEN ct >= 100 THEN 70.0 WHEN ct >= 50 THEN 55.0
       |           WHEN ct >= 20 THEN 40.0 WHEN ct >= 10 THEN 25.0
       |           WHEN ct >= 1 THEN 10.0 ELSE 0.0 END
       |      + CASE WHEN p3 >= 10 THEN 30.0 WHEN p3 >= 5 THEN 20.0
       |           WHEN p3 >= 1 THEN 10.0 ELSE 0.0 END)
       |      AS clinical_score,
       |    CASE WHEN gr >= 10 THEN 100.0 WHEN gr >= 7 THEN 80.0
       |         WHEN gr >= 5 THEN 60.0 WHEN gr >= 3 THEN 40.0
       |         WHEN gr >= 1 THEN 20.0 ELSE 10.0 END AS gap_score
       |  FROM tvs),
       |tvt AS (SELECT *,
       |    publication_score * 0.25 + diversity_score * 0.20
       |      + review_score * 0.20 + clinical_score * 0.20
       |      + gap_score * 0.15 AS total
       |  FROM tvc)
       |SELECT keyword, publication_score, diversity_score,
       |  review_score, clinical_score, gap_score,
       |  round(total + 0.000000001, 6) AS total_score,
       |  CASE WHEN total >= 80 THEN 'high'
       |       WHEN total >= 50 THEN 'medium'
       |       WHEN total >= 30 THEN 'emerging'
       |       ELSE 'uncertain' END AS confidence
       |FROM tvt ORDER BY keyword""".stripMargin

  /* ---------------- paper_quality ---------------- */

  /** Study-quality insight extraction (paper_insights.py:274
    * extract_quality): the synthetic corpus has no clinical phrasing,
    * so — the lens_classify/deg_validate binding device — each doc
    * gets deterministic doc_id-residue markers appended (design by
    * mod 11 covering every ladder rung incl. the Unknown gap, sample
    * size by mod 7 incl. an out-of-range fall-through, strengths by
    * mod 3, bias vocabulary by mod 5), and the OPERATOR runs the
    * reference's real pattern ladder over the augmented text. The
    * oracle replays markers + ladder + caps textually.
    */
  private val pqDesign = Seq(
    "meta-analysis of pooled data", "systematic review",
    "randomized placebo-controlled", "cohort study", "case-control",
    "cross-sectional", "case series of consecutive patients",
    "case report", "in vitro cell line", "",
    "double-blind phase ii trial")
  private val pqSample = Seq(
    "", "n = 12", "n = 45", "n = 150", "n = 2500", "enrolled 80",
    "n = 2000000 with 450 patients")
  private val pqStrength = Seq("", "multicenter", "double-blind")
  private val pqBias = Seq(
    "", "selection bias", "confounders adjusted", "bias", "")

  private def pqMarker(opts: Seq[String], m: Int): Column =
    opts.zipWithIndex.foldRight(lit("")) { case ((s0, i), rest) =>
      when(pmod(col("doc_id"), lit(m)) === i, lit(s0)).otherwise(rest)
    }

  private def paperQuality(s: SparkSession, d: String): DataFrame = {
    val aug = Tables.documents(s, d).select(col("doc_id"),
      concat_ws(" ", col("text"),
        pqMarker(pqDesign, 11), pqMarker(pqSample, 7),
        pqMarker(pqStrength, 3), pqMarker(pqBias, 5)).as("text"))
    Insights.paperQuality(aug, "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  private def pqMarkerSql(opts: Seq[String], m: Int): String =
    opts.zipWithIndex.map { case (s0, i) =>
      s"WHEN doc_id % $m = $i THEN '$s0'"
    }.mkString("CASE ", " ", " ELSE '' END")

  private val paperQualitySql =
    s"""WITH a AS (SELECT doc_id, lower(text || ' ' ||
       |    ${pqMarkerSql(pqDesign, 11)} || ' ' ||
       |    ${pqMarkerSql(pqSample, 7)} || ' ' ||
       |    ${pqMarkerSql(pqStrength, 3)} || ' ' ||
       |    ${pqMarkerSql(pqBias, 5)}) AS t
       |  FROM documents),
       |d AS (SELECT doc_id, t,
       |    CASE WHEN regexp_matches(t, 'meta-analysis|meta analysis|pooled analysis')
       |        THEN 'Meta-Analysis'
       |      WHEN regexp_matches(t, 'systematic review|systematic literature review')
       |        THEN 'Systematic Review'
       |      WHEN regexp_matches(t, 'randomized|randomised|rct|phase [iv123]+|double-blind|placebo-controlled|clinical trial')
       |        THEN 'Randomized Controlled Trial'
       |      WHEN regexp_matches(t, 'cohort study|prospective study|retrospective study|longitudinal|follow-up study')
       |        THEN 'Cohort Study'
       |      WHEN regexp_matches(t, 'case-control|case control') THEN 'Case-Control'
       |      WHEN regexp_matches(t, 'cross-sectional|cross sectional|prevalence study')
       |        THEN 'Cross-Sectional'
       |      WHEN regexp_matches(t, 'case series|consecutive patients|patient series')
       |        THEN 'Case Series'
       |      WHEN regexp_matches(t, 'case report|case presentation') THEN 'Case Report'
       |      WHEN regexp_matches(t, 'in vitro|cell line|mouse model|animal model|xenograft|preclinical')
       |        THEN 'In Vitro/Animal'
       |      ELSE 'Unknown' END AS design,
       |    CASE WHEN regexp_matches(t, 'meta-analysis|meta analysis|pooled analysis') THEN 10
       |      WHEN regexp_matches(t, 'systematic review|systematic literature review') THEN 9
       |      WHEN regexp_matches(t, 'randomized|randomised|rct|phase [iv123]+|double-blind|placebo-controlled|clinical trial') THEN 8
       |      WHEN regexp_matches(t, 'cohort study|prospective study|retrospective study|longitudinal|follow-up study') THEN 6
       |      WHEN regexp_matches(t, 'case-control|case control') THEN 5
       |      WHEN regexp_matches(t, 'cross-sectional|cross sectional|prevalence study') THEN 4
       |      WHEN regexp_matches(t, 'case series|consecutive patients|patient series') THEN 3
       |      WHEN regexp_matches(t, 'case report|case presentation') THEN 2
       |      WHEN regexp_matches(t, 'in vitro|cell line|mouse model|animal model|xenograft|preclinical') THEN 0
       |      ELSE 0 END::BIGINT AS design_score,
       |    coalesce(
       |      CASE WHEN nullif(regexp_extract(t, 'n\\s*=\\s*(\\d+)', 1), '')::BIGINT
       |        BETWEEN 1 AND 1000000
       |        THEN nullif(regexp_extract(t, 'n\\s*=\\s*(\\d+)', 1), '')::BIGINT END,
       |      CASE WHEN nullif(regexp_extract(t, '(\\d+)\\s*patients', 1), '')::BIGINT
       |        BETWEEN 1 AND 1000000
       |        THEN nullif(regexp_extract(t, '(\\d+)\\s*patients', 1), '')::BIGINT END,
       |      CASE WHEN nullif(regexp_extract(t, '(\\d+)\\s*participants', 1), '')::BIGINT
       |        BETWEEN 1 AND 1000000
       |        THEN nullif(regexp_extract(t, '(\\d+)\\s*participants', 1), '')::BIGINT END,
       |      CASE WHEN nullif(regexp_extract(t, '(\\d+)\\s*subjects', 1), '')::BIGINT
       |        BETWEEN 1 AND 1000000
       |        THEN nullif(regexp_extract(t, '(\\d+)\\s*subjects', 1), '')::BIGINT END,
       |      CASE WHEN nullif(regexp_extract(t, 'sample size of\\s*(\\d+)', 1), '')::BIGINT
       |        BETWEEN 1 AND 1000000
       |        THEN nullif(regexp_extract(t, 'sample size of\\s*(\\d+)', 1), '')::BIGINT END,
       |      CASE WHEN nullif(regexp_extract(t, 'enrolled\\s*(\\d+)', 1), '')::BIGINT
       |        BETWEEN 1 AND 1000000
       |        THEN nullif(regexp_extract(t, 'enrolled\\s*(\\d+)', 1), '')::BIGINT END,
       |      CASE WHEN nullif(regexp_extract(t, 'included\\s*(\\d+)', 1), '')::BIGINT
       |        BETWEEN 1 AND 1000000
       |        THEN nullif(regexp_extract(t, 'included\\s*(\\d+)', 1), '')::BIGINT END,
       |      CASE WHEN nullif(regexp_extract(t, '(\\d+)\\s*individuals', 1), '')::BIGINT
       |        BETWEEN 1 AND 1000000
       |        THEN nullif(regexp_extract(t, '(\\d+)\\s*individuals', 1), '')::BIGINT END
       |    ) AS sample_size,
       |    (t LIKE '%multicenter%' OR t LIKE '%multi-center%') AS multicenter,
       |    t LIKE '%double-blind%' AS double_blind
       |  FROM a),
       |q AS (SELECT *,
       |    CASE WHEN sample_size >= 1000 THEN least(10.0, design_score + 1.0)
       |         WHEN sample_size >= 100 THEN least(10.0, design_score + 0.5)
       |         WHEN sample_size < 30 THEN greatest(0.0, design_score - 1.0)
       |         ELSE design_score::DOUBLE END AS q1
       |  FROM d),
       |q2 AS (SELECT *,
       |    CASE WHEN multicenter THEN least(10.0, q1 + 0.5) ELSE q1 END AS qq
       |  FROM q),
       |f AS (SELECT doc_id, design, design_score, sample_size,
       |    multicenter, double_blind,
       |    round(CASE WHEN double_blind THEN least(10.0, qq + 0.5)
       |      ELSE qq END, 1) AS quality_score,
       |    CASE WHEN (design = 'Randomized Controlled Trial'
       |          OR design = 'Meta-Analysis') AND double_blind THEN 'Low'
       |         WHEN design IN ('Case Report', 'Case Series') THEN 'High'
       |         WHEN t LIKE '%bias%' OR t LIKE '%confound%' THEN
       |           CASE WHEN t LIKE '%adjusted%' THEN 'Medium' ELSE 'High' END
       |         ELSE 'Medium' END AS bias_risk
       |  FROM q2)
       |SELECT doc_id, design, design_score, sample_size, multicenter,
       |  double_blind, quality_score,
       |  CASE WHEN quality_score >= 8.0 THEN 'High'
       |       WHEN quality_score >= 5.0 THEN 'Medium'
       |       ELSE 'Low' END AS quality_label,
       |  bias_risk
       |FROM f ORDER BY doc_id""".stripMargin

  /* ---------------- txt_quality_gate ---------------- */

  private val GateLow = 0.25
  private val GateHigh = 0.95

  /** CCNet-style distribution-calibrated band gate over the per-doc
    * quality score: drop the bottom quartile (gibberish tail) and
    * the top 5% (template-spam tail), thresholds derived from the
    * corpus itself.
    */
  private def txtQualityGate(s: SparkSession, d: String): DataFrame =
    TextAnalysis.percentileGate(
      TextAnalysis.qualityScore(Tables.documents(s, d), "doc_id", "text")
        .select(col("doc_id"), col("quality").cast("long").as("quality")),
      "doc_id", "quality", GateLow, GateHigh)
      .orderBy(col("doc_id"))

  private val txtQualityGateSql =
    s"""WITH $qualityCtes,
       |q AS (SELECT doc_id,
       |    (len_score + tok_score + stop_score + div_score)::BIGINT
       |      AS quality
       |  FROM sc),
       |thr AS (SELECT quantile_cont(quality, $GateLow) AS q_lo,
       |    quantile_cont(quality, $GateHigh) AS q_hi FROM q)
       |SELECT doc_id, quality,
       |  round(thr.q_lo + 0.000000001, 4) AS q_lo,
       |  round(thr.q_hi + 0.000000001, 4) AS q_hi
       |FROM q, thr WHERE quality BETWEEN thr.q_lo AND thr.q_hi
       |ORDER BY doc_id""".stripMargin

  /* ---------------- txt_gate_stratified ---------------- */

  /** The per-LANGUAGE band gate (the form CCNet ships): each lang's
    * cuts derive from its own score distribution, so a
    * systematically-lower-scoring language isn't wholesale-dropped
    * by head-language thresholds.
    */
  private def txtGateStratified(s: SparkSession, d: String): DataFrame =
    TextAnalysis.percentileGateBy(
      TextAnalysis.qualityScore(Tables.documents(s, d), "doc_id", "text",
        passThrough = Seq("lang"))
        .select(col("doc_id"), col("lang"),
          col("quality").cast("long").as("quality")),
      "doc_id", "quality", "lang", GateLow, GateHigh)
      .orderBy(col("doc_id"))

  private val txtGateStratifiedSql =
    s"""WITH $qualityCtes,
       |q AS (SELECT sc.doc_id, d.lang,
       |    (len_score + tok_score + stop_score + div_score)::BIGINT
       |      AS quality
       |  FROM sc JOIN documents d ON sc.doc_id = d.doc_id),
       |thr AS (SELECT lang, quantile_cont(quality, $GateLow) AS q_lo,
       |    quantile_cont(quality, $GateHigh) AS q_hi
       |  FROM q GROUP BY lang)
       |SELECT q.doc_id, q.lang, quality,
       |  round(thr.q_lo + 0.000000001, 4) AS q_lo,
       |  round(thr.q_hi + 0.000000001, 4) AS q_hi
       |FROM q JOIN thr ON q.lang = thr.lang
       |WHERE quality BETWEEN thr.q_lo AND thr.q_hi
       |ORDER BY q.doc_id""".stripMargin

  /* ---------------- txt_boilerplate ---------------- */

  private val BoilerN = 3
  private val BoilerTopK = 20
  // ONE shared constant for the per-doc token cap so the Spark
  // binding and the DuckDB twin can never drift (r15 advice: the
  // operator capped at 50 k while the SQL shingled the full array —
  // silent divergence on any >50 k-token doc)
  private val BoilerMaxTokens = 50000

  private def txtBoilerplate(s: SparkSession, d: String): DataFrame =
    TextAnalysis.boilerplateGrams(
      Tables.documents(s, d), "doc_id", "text", BoilerN, BoilerTopK,
      maxTokensPerDoc = BoilerMaxTokens)
      .orderBy(col("doc_id"))

  private val txtBoilerplateSql = {
    val concat = (0 until BoilerN).map(j => s"t[i+$j]")
      .mkString(" || ' ' || ")
    // t[1:$BoilerMaxTokens] = DuckDB list slice (clamped on short
    // lists) — the exact twin of the operator's slice(tokens, 1, cap)
    s"""WITH toks AS (SELECT doc_id,
       |    (string_split_regex(lower(trim(text)), '\\s+'))[1:$BoilerMaxTokens] AS t
       |  FROM documents),
       |ix AS (SELECT doc_id, t,
       |    unnest(generate_series(1, len(t) - ${BoilerN - 1})) AS i
       |  FROM toks),
       |shs AS (SELECT DISTINCT doc_id, $concat AS g FROM ix),
       |dfc AS (SELECT g, count(*)::BIGINT AS df FROM shs GROUP BY g),
       |top AS (SELECT g FROM dfc ORDER BY df DESC, g LIMIT $BoilerTopK)
       |SELECT s.doc_id, count(*)::BIGINT AS n_grams,
       |  sum(CASE WHEN top.g IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
       |    AS n_boiler,
       |  round(sum(CASE WHEN top.g IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
       |    / count(*) + 0.000000001, 6) AS boiler_ratio
       |FROM shs s LEFT JOIN top ON s.g = top.g
       |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin
  }

  val defs: Seq[Qdef] = Seq(
    Qdef("txt_stats", txtStats, Some(txtStatsSql)),
    Qdef("txt_quality", txtQuality, Some(txtQualitySql)),
    Qdef("txt_quality_gate", txtQualityGate, Some(txtQualityGateSql)),
    Qdef("txt_gate_stratified", txtGateStratified,
      Some(txtGateStratifiedSql)),
    Qdef("txt_boilerplate", txtBoilerplate, Some(txtBoilerplateSql)),
    Qdef("txt_langid", txtLangid, Some(txtLangidSql)),
    Qdef("txt_keywords", txtKeywords, Some(txtKeywordsSql)),
    Qdef("txt_entities", txtEntities, Some(txtEntitiesSql)),
    Qdef("txt_fingerprint", txtFingerprint, Some(txtFingerprintSql)),
    Qdef("chunk_fixed", chunkFixed, Some(chunkFixedSql)),
    Qdef("chunk_filtered", chunkFiltered, Some(chunkFilteredSql)),
    Qdef("chunk_sections", chunkSections, Some(chunkSectionsSql)),
    Qdef("lens_classify", lensClassify, Some(lensClassifySql)),
    Qdef("txt_token_count", txtTokenCount, Some(txtTokenCountSql)),
    Qdef("txt_lm_score", txtLmScore, Some(txtLmScoreSql)),
    Qdef("src_quality", srcQuality, Some(srcQualitySql)),
    Qdef("txt_scrub", txtScrub, Some(txtScrubSql)),
    Qdef("txt_repetition", txtRepetition, Some(txtRepetitionSql)),
    Qdef("pack_shards", packShards, Some(packShardsSql)),
    Qdef("pack_audit", packAudit, Some(packAuditSql)),
    Qdef("corpus_stats", corpusStats, Some(corpusStatsSql)),
    Qdef("trend_gaps", trendGaps, Some(trendGapsSql)),
    Qdef("topic_trends", topicTrends, Some(topicTrendsSql)),
    Qdef("trend_topics", trendTopics2, Some(trendTopicsSql)),
    Qdef("paper_quality", paperQuality, Some(paperQualitySql)),
    Qdef("vocab_match", vocabMatch, Some(vocabMatchSql)),
    Qdef("trend_match", trendMatchQ, Some(trendMatchSql)),
    Qdef("trend_validate", trendValidateQ, Some(trendValidateSql)))
}
