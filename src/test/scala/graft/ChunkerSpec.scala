package graft

import graft.operators.Chunker

class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  test("fixedChunks covers the doc with the configured stride and overlap") {
    val docs = Seq((1L, "a" * 450), (2L, "b" * 100), (3L, "")).toDF("id", "text")
    val chunks = Chunker.fixedChunks(docs, "id", "text", 200, 50)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))

    val doc1 = chunks.filter(_._1 == 1L).sortBy(_._2)
    // starts 0,150,300 -> lens 200,200,150
    assert(doc1.map(_._3.length).toSeq == Seq(200, 200, 150))
    // overlap: chunk i+1 starts 150 in, so last 50 chars of chunk i repeat
    assert(doc1(0)._3.takeRight(50) == doc1(1)._3.take(50))
    assert(chunks.count(_._1 == 2L) == 1)
    assert(!chunks.exists(_._1 == 3L)) // empty doc yields no chunks
  }

  test("recursiveSplit respects chunkSize and prefers separator boundaries") {
    val text = ("alpha beta gamma. " * 30).trim
    val chunks = Chunker.recursiveSplit(text, chunkSize = 100, overlap = 20)
    assert(chunks.nonEmpty)
    assert(chunks.forall(_.length <= 100))
    // sentence-boundary splits: every chunk except possibly the last
    // should end at or near a sentence end
    assert(chunks.init.forall(c => c.endsWith(".") || c.endsWith(". ")))
  }

  test("recursiveSplit never exceeds chunkSize when pieces are near chunkSize") {
    // pieces of ~90 chars with overlap 20: a naive carried+piece would
    // produce 110-char chunks; the carried overlap must be trimmed
    val text = (1 to 8).map(i => s"$i" + "w" * 88).mkString(" ")
    val chunks = Chunker.recursiveSplit(text, chunkSize = 100, overlap = 20)
    assert(chunks.nonEmpty)
    assert(chunks.forall(_.length <= 100),
      s"oversized chunk: ${chunks.map(_.length).mkString(",")}")
    // and with a piece exactly at chunkSize the overlap budget is zero
    val tight = ("y" * 100) + " " + ("z" * 100)
    val tc = Chunker.recursiveSplit(tight, chunkSize = 100, overlap = 30)
    assert(tc.forall(_.length <= 100))
  }

  test("tagSections: earliest marker wins, priority breaks ties, default otherwise") {
    val markers = Seq("alpha" -> "methods", "beta" -> "results")
    val docs = Seq(
      (1L, "xx alpha yy beta"),   // alpha first -> methods
      (2L, "beta zz alpha"),      // beta first -> results
      (3L, "alphabeta"),          // alpha at 1, beta at 6 -> methods
      (4L, "nothing here"),       // no marker -> other
      (5L, "ALPHA loud")          // case-insensitive -> methods
    ).toDF("id", "text")
    val out = Chunker.tagSections(docs, "text", markers, "other")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out == Map(1L -> "methods", 2L -> "results", 3L -> "methods",
      4L -> "other", 5L -> "methods"))
    // tie at identical position: both markers found at pos 1 is
    // impossible for distinct strings, but equal positions CAN arise
    // across columns; priority order (sequence order) must win
    val tie = Seq((6L, "alpha beta alpha")).toDF("id", "text")
    assert(Chunker.tagSections(tie, "text", Seq("alpha" -> "a", "alph" -> "b"),
      "other").collect().head.getString(2) == "a")
  }

  test("stored section column prunes section-scoped reads at the scan") {
    // the production layout vs_section_topk documents: chunks written
    // partitioned BY SECTION, so a section predicate becomes a
    // PartitionFilter (whole directories skipped), not a row filter
    val docs = Seq(
      (1L, "join the tables"), (2L, "scan the index"),
      (3L, "stream results"), (4L, "plain text")).toDF("doc_id", "text")
    val tagged = Chunker.tagSections(
      Chunker.fixedChunks(docs, "doc_id", "text", 10, 2),
      "chunk_text", Seq("join" -> "methods", "scan" -> "results",
        "stream" -> "discussion"), "other")
    val dir = java.nio.file.Files.createTempDirectory("sectioned").toString
    graft.sources.Corpus.writePartitioned(tagged, dir, Seq("section"))
    val scoped = spark.read.parquet(dir).where($"section" === "methods")
    val plan = scoped.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("section"),
      s"section predicate did not reach the scan:\n$plan")
    assert(scoped.select("doc_id").distinct().collect().map(_.getLong(0))
      .toSet == Set(1L))
  }

  test("recursiveSplit is deterministic and handles short text") {
    val t = "short text"
    assert(Chunker.recursiveSplit(t, 100, 10) == Seq("short text"))
    val long = "x" * 250
    val c = Chunker.recursiveSplit(long, 100, 0)
    assert(c.map(_.length).sum == 250)
  }
}
