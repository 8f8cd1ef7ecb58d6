package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.annotation.tailrec

import graft.functions.TextFns

/** Document chunking — re-expression of the reference's splitter
  * (reference: backend/app/core/text_splitter.py:68 BioPaperSplitter:
  * RecursiveCharacterTextSplitter with chunk_size/chunk_overlap and
  * chunk_index/total metadata).
  *
  * `fixedChunks` is the declarative, oracle-checkable variant (pure
  * sequence + substring — narrow, codegen'd). `recursiveSplit` is the
  * separator-aware variant used via Dataset.flatMap for real corpora;
  * it is deterministic pure Scala, spec-tested.
  */
object Chunker {

  /** Fixed-size overlapping character chunks.
    * stride = chunkSize - overlap; starts at 0, stride, 2*stride …
    * while start < doc length.
    */
  def fixedChunks(
      docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int): DataFrame = {
    // same argument contract as recursiveSplit — stride <= 0 would
    // otherwise surface as a sequence-step error mid-scan
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got size=$chunkSize overlap=$overlap")
    val stride = chunkSize - overlap
    docs
      .withColumn("n", length(col(textCol)))
      .where(col("n") > 0)
      .select(col(idCol), col(textCol),
        explode(sequence(lit(0), greatest(col("n") - 1, lit(0)), lit(stride)))
          .as("start"))
      .select(
        col(idCol),
        (col("start") / stride).cast("int").as("chunk_index"),
        // Column.substr, not an expr() splice — arbitrary column
        // names stay legal
        col(textCol).substr(col("start") + 1, lit(chunkSize)).as("chunk_text"))
      .withColumn("chunk_len", length(col("chunk_text")))
  }

  /** Junk-chunk filter — the reference drops chunks that are too
    * short, mostly non-alphabetic, or dominated by boilerplate
    * keywords before indexing (reference:
    * backend/app/core/text_splitter.py:147 _is_junk_content — junk
    * patterns over 30% of content, contribution-keyword density,
    * excluded sections). Narrow codegen'd predicates, no shuffle.
    */
  def filterJunk(
      chunks: DataFrame, textCol: String,
      minChars: Int, minAlphaRatio: Double,
      junkKeywords: Seq[String], maxJunkHits: Int): DataFrame = {
    val trimmed = trim(col(textCol))
    val junkHits = junkKeywords
      .map(k => when(trimmed.contains(k), 1).otherwise(0))
      .reduceOption(_ + _).getOrElse(lit(0))
    chunks
      .where(length(trimmed) >= minChars)
      .where(length(regexp_replace(trimmed, "[^a-zA-Z]", "")) >=
        lit(minAlphaRatio) * length(trimmed))
      .where(junkHits <= maxJunkHits)
  }

  /** Section tagging — the Spark-native analog of the reference
    * splitter's section detection (reference:
    * backend/app/core/text_splitter.py:68 section-aware splitting;
    * backend/app/core/vector_store.py:420 search_by_section filters
    * retrieval on the resulting `section` metadata).
    *
    * Rule: the section of the EARLIEST-occurring marker in `textCol`
    * wins; position ties resolve to marker priority order (the
    * sequence order of `markers`); no marker → `default`. Narrow
    * codegen'd CASE over instr positions — no shuffle, and the same
    * CASE is expressible verbatim in an oracle.
    *
    * At ingest the emitted `section` column is STORED (and typically a
    * partition column — see the partition-pruning spec in
    * ChunkerSpec), so section-scoped reads prune at the scan; this
    * function is the write-path tagger, not a per-query cost.
    */
  def tagSections(
      chunks: DataFrame, textCol: String,
      markers: Seq[(String, String)], default: String): DataFrame = {
    val Big = Int.MaxValue
    // markers lowercased like the text — a capitalized marker would
    // silently never match and tag every chunk with the default
    val pos: Seq[Column] = markers.map { case (kw, _) =>
      val p = instr(lower(col(textCol)), TextFns.lcRoot(kw))
      when(p > 0, p).otherwise(lit(Big))
    }
    // first marker whose position is <= every LATER marker's position
    // (earlier markers already failed their clause, so priority order
    // breaks ties) — the langid-style chained CASE, oracle-mirrorable
    val section = markers.zipWithIndex.reverse.foldLeft(lit(default)) {
      case (els, ((_, sec), i)) =>
        val isMin = ((i + 1) until markers.size)
          .map(j => pos(i) <= pos(j))
          .foldLeft(pos(i) =!= Big)(_ && _)
        when(isMin, lit(sec)).otherwise(els)
    }
    chunks.withColumn("section", section)
  }

  /** Separator-aware recursive splitter (pure function).
    * Tries separators in order; greedily packs pieces into chunks of
    * at most `chunkSize` chars, with `overlap` chars carried between
    * consecutive chunks. Deterministic; mirrors the behavior contract
    * of RecursiveCharacterTextSplitter (not its implementation).
    */
  def recursiveSplit(
      text: String, chunkSize: Int, overlap: Int,
      separators: Seq[String] = Seq("\n\n", "\n", ". ", "; ", ", ", " ", "")
  ): Seq[String] = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize)

    def splitBy(t: String, seps: Seq[String]): Seq[String] = {
      if (t.length <= chunkSize) return Seq(t)
      seps match {
        case Nil => t.grouped(chunkSize).toSeq
        case "" +: _ => t.grouped(chunkSize).toSeq
        case sep +: rest =>
          val parts = t.split(java.util.regex.Pattern.quote(sep), -1)
          if (parts.length <= 1) splitBy(t, rest)
          else {
            // re-attach separator to each piece except the last
            val pieces = parts.init.map(_ + sep) :+ parts.last
            pieces.toSeq.flatMap { p =>
              if (p.length > chunkSize) splitBy(p, rest) else Seq(p)
            }
          }
      }
    }

    @tailrec
    def pack(pieces: List[String], cur: String, acc: List[String]): List[String] =
      pieces match {
        case Nil => if (cur.nonEmpty) (cur :: acc) else acc
        case p :: rest =>
          if (cur.isEmpty) pack(rest, p, acc)
          else if ((cur + p).length <= chunkSize) pack(rest, cur + p, acc)
          else {
            // Trim the carried overlap so carried+piece never exceeds
            // chunkSize (splitBy guarantees p.length <= chunkSize, so
            // the budget is never negative).
            val carried = cur.takeRight(math.min(overlap, chunkSize - p.length))
            pack(rest, carried + p, cur :: acc)
          }
      }

    val pieces = splitBy(text, separators.toList).filter(_.nonEmpty)
    pack(pieces.toList, "", Nil).reverse.map(_.trim).filter(_.nonEmpty)
  }
}
