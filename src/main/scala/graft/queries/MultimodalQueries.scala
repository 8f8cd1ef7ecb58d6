package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Multimodal

/** Multimodal binary-column pipeline, oracle-checked leg.
  *
  * The decode itself is stubbed (no codec libraries in-container —
  * see Multimodal.FakeDecoder), but the PLUMBING is real and this
  * row drives every stage of it end-to-end: binary payload column →
  * kind routing (repartition by kind + sort within partitions) →
  * batched kind-homogeneous mapPartitions decode → frame sampling →
  * per-kind metadata aggregation. The aggregated outputs (counts,
  * byte sizes, frame counts) are decode-independent and therefore
  * DuckDB-replayable: the oracle recomputes them from
  * octet_length(encode(text)) without running the stub.
  *
  * Scale: payloads never shuffle except the ONE kind-routing
  * repartition (which a production pipeline needs anyway to pin
  * codecs to executor pools); only (media_id, kind, n_bytes,
  * features) rows — no blobs — flow into the joins/aggregates.
  */
object MultimodalQueries {

  private val FrameN = 4

  /** Demo media table derived from the documents corpus: payload =
    * UTF-8 bytes of the text (a deterministic stand-in for real
    * image/audio/video payloads), kind round-robined by doc_id.
    */
  private def media(s: SparkSession, d: String): Dataset[Multimodal.MediaRow] = {
    import s.implicits._
    Tables.documents(s, d).select(
      col("doc_id").as("media_id"),
      when(pmod(col("doc_id"), lit(3)) === 0, "image")
        .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
        .otherwise("video").as("kind"),
      col("text").cast("binary").as("payload"),
      lit(64).as("width"), lit(48).as("height"),
      lit(16000).as("sample_rate"))
      .as[Multimodal.MediaRow]
  }

  private def mmStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val m = media(s, d)
    // the real pipeline: route by kind, then batch-decode — n_bytes
    // comes out of the mapPartitions decode stage, so the aggregate
    // below fails if the batching drops/duplicates/misroutes any row
    val feats = Multimodal.extractFeatures(
      Multimodal.partitionByKind(m.toDF, 32).as[Multimodal.MediaRow])
    val frames = Multimodal.sampleFrames(m, FrameN)
      .groupBy(col("media_id")).agg(count(lit(1)).as("nf"))
    feats.toDF.join(frames, Seq("media_id"), "left")
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        round(avg(col("n_bytes")) + lit(1e-9), 2).as("avg_bytes"),
        max(col("n_bytes")).as("max_bytes"),
        sum(coalesce(col("nf"), lit(0L))).as("n_frames"))
      .orderBy(col("kind"))
  }

  /** The decode-independent replay: byte counts from
    * octet_length(encode(text)); frames = min(FrameN, n_bytes) per
    * non-empty video payload (sampleFrames' exact emission count).
    */
  private val mmStatsSql =
    s"""WITH m AS (SELECT doc_id AS media_id,
       |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
       |      ELSE 'video' END AS kind,
       |    octet_length(encode(text))::BIGINT AS n_bytes FROM documents)
       |SELECT kind, count(*)::BIGINT AS n_media,
       |  sum(n_bytes)::BIGINT AS total_bytes,
       |  round(avg(n_bytes) + 0.000000001, 2) AS avg_bytes,
       |  max(n_bytes) AS max_bytes,
       |  sum(CASE WHEN kind = 'video' THEN least($FrameN, n_bytes)
       |    ELSE 0 END)::BIGINT AS n_frames
       |FROM m GROUP BY kind ORDER BY kind""".stripMargin

  private val DigestBytes = 40

  /** Content-digest dedup over BINARY payloads (the image/audio
    * near-dup collapse of a multimodal training pipeline): md5 a
    * fixed-length digest slice of the payload bytes — the stand-in
    * for a perceptual digest (thumbnail/fingerprint), which is what
    * media dedup hashes in production, full-byte equality being too
    * strict for re-encoded media. Groups per (kind, digest) with
    * canonical id + reclaimable bytes. ONLY 32-char hashes and byte
    * counts shuffle — payload blobs never leave their scan
    * partitions, which is what makes this viable on TB media corpora.
    *
    * Oracle parity: payload = UTF-8 bytes of ASCII text in this
    * binding, so the Spark byte-slice md5 equals DuckDB's
    * md5(substr(text, 1, n)) exactly (byte = char on ASCII; a regen
    * to non-ASCII text fails the compare loudly, by design).
    */
  private def mmDedup(s: SparkSession, d: String): DataFrame =
    media(s, d).toDF
      .select(col("media_id"), col("kind"),
        md5(substring(col("payload"), 1, DigestBytes))
          .as("payload_digest"),
        length(col("payload")).cast("long").as("n_bytes"))
      .groupBy(col("kind"), col("payload_digest"))
      .agg(count(lit(1)).cast("long").as("dup_cnt"),
        min(col("media_id")).as("canonical_id"),
        sum(col("n_bytes")).cast("long").as("group_bytes"),
        // reclaim = bytes freed by keeping exactly the CANONICAL
        // (min-id) member — digest groups can mix sizes (same
        // 40-byte prefix, different tails), so this is
        // sum - canonical's size (min(struct) = value-at-min-key),
        // not sum - max
        (sum(col("n_bytes")) -
          min(struct(col("media_id"), col("n_bytes")))
            .getField("n_bytes")).cast("long")
          .as("reclaimable_bytes"))
      .where(col("dup_cnt") > 1)
      .orderBy(col("kind"), col("payload_digest"))

  private val mmDedupSql =
    s"""WITH m AS (SELECT doc_id AS media_id,
       |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
       |      ELSE 'video' END AS kind,
       |    md5(substr(text, 1, $DigestBytes)) AS payload_digest,
       |    octet_length(encode(text))::BIGINT AS n_bytes FROM documents)
       |SELECT kind, payload_digest, count(*)::BIGINT AS dup_cnt,
       |  min(media_id) AS canonical_id,
       |  sum(n_bytes)::BIGINT AS group_bytes,
       |  (sum(n_bytes)::BIGINT - arg_min(n_bytes, media_id))::BIGINT
       |    AS reclaimable_bytes
       |FROM m GROUP BY kind, payload_digest HAVING count(*) > 1
       |ORDER BY kind, payload_digest""".stripMargin

  val defs: Seq[Qdef] = Seq(
    Qdef("mm_stats", mmStats, Some(mmStatsSql)),
    Qdef("mm_dedup", mmDedup, Some(mmDedupSql)))
}
