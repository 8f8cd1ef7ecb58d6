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

  test("recursiveSplit is deterministic and handles short text") {
    val t = "short text"
    assert(Chunker.recursiveSplit(t, 100, 10) == Seq("short text"))
    val long = "x" * 250
    val c = Chunker.recursiveSplit(long, 100, 0)
    assert(c.map(_.length).sum == 250)
  }
}
