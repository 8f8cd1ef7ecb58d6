package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Benchmark decontamination — flag training documents that overlap an
  * evaluation/benchmark set by shared word n-grams, the standard
  * pre-training hygiene step (GPT-3 appendix C / PaLM-style 8-13-gram
  * overlap checks). The reference's corpus builder has no equivalent;
  * this extends the engine's LLM-data-pipeline surface.
  *
  * Scale shape: the benchmark side is an eval suite — thousands of
  * documents, not terabytes — so its distinct n-gram set broadcasts
  * and the 100 TB corpus side streams through a broadcast hash join
  * with no corpus shuffle for the membership probe. The only wide
  * exchanges are the per-doc distinct + count aggregates, both keyed
  * by (doc, gram)/(doc) and map-side combined. N-grams come from the
  * native TokenShingles expression (codegen'd).
  */
object Decontam {

  /** Documents from `corpus` sharing ≥1 word n-gram with `bench`.
    * Output: (idCol, n_grams, hit_grams, contamination) — distinct
    * n-grams in the doc, distinct n-grams also present anywhere in
    * the benchmark set, and their ratio. Docs with zero overlap (or
    * fewer than n tokens, hence no n-grams) are absent.
    *
    * Caches the corpus gram frame (consumed by both the per-doc
    * total and the overlap probe) — caller owns the lifecycle, see
    * [[graft.Caching]].
    */
  def contaminated(
      corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    def grams(df: DataFrame) = df.select(
      explode(TextFns.shinglesOfTokens(
        TextFns.wsTokens(col(textCol)), n)).as("g"))
    val corpusGrams = corpus
      .select(col(idCol),
        explode(TextFns.shinglesOfTokens(
          TextFns.wsTokens(col(textCol)), n)).as("g"))
      .distinct()
      .cache()
    val benchGrams = grams(bench).distinct()
    val perDoc = corpusGrams.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"))
    val hits = corpusGrams
      .join(broadcast(benchGrams), Seq("g"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("hit_grams"))
    hits.join(perDoc, Seq(idCol))
      .select(col(idCol),
        col("n_grams").cast("long").as("n_grams"),
        col("hit_grams").cast("long").as("hit_grams"),
        round(col("hit_grams").cast("double") / col("n_grams") + lit(1e-9), 6)
          .as("contamination"))
  }

  /** Bloom-pruned twin of [[contaminated]] — IDENTICAL output, built
    * for the 100 TB regime where `contaminated`'s corpus-wide
    * (doc, gram) `.distinct()` is the bottleneck: that distinct
    * shuffles EVERY corpus n-gram once (O(total grams) exchange rows)
    * before the broadcast probe ever prunes anything. Here nothing
    * corpus-sized is shuffled unless it (probably) overlaps the
    * benchmark:
    *
    *  1. per-doc dedup happens INSIDE the row — `array_distinct` on
    *     the shingle array replaces the corpus-wide distinct exchange,
    *     and the per-doc gram total rides along as a projected column;
    *  2. the benchmark's distinct grams (bounded — an eval suite)
    *     fold into ONE serialized bloom filter via Spark's own
    *     `BloomFilterAggregate` (a distributed aggregate; only the
    *     sketch bytes reach the driver), embedded in the plan as a
    *     binary literal;
    *  3. the corpus gram stream is pruned map-side by the codegen'd
    *     `BloomFilterMightContain` — the exact device Spark's runtime
    *     filter injection uses — so only grams that PROBABLY hit
    *     (true hits + the fpp tail) survive;
    *  4. survivors are verified EXACTLY against the broadcast bench
    *     gram set (bloom false positives drop here — the bloom is a
    *     prune, never the answer), making the output bit-identical to
    *     `contaminated` for any fpp;
    *  5. the only wide exchange left is the per-doc hit aggregate
    *     over surviving rows — O(hit grams), not O(corpus grams).
    *
    * `estimatedNumItems`/`numBits` are clamped by Spark's runtime-
    * bloom conf maxima (items 4 M / 8 MiB bits by default) — past the
    * clamp the fpp degrades gracefully and the exact verify absorbs
    * the extra false positives.
    */
  def contaminatedBloom(
      corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int,
      fpp: Double = 0.03): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{
      BloomFilterMightContain, Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftshim.ColumnShim
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1), got $fpp")
    val benchGrams = bench.select(
      explode(TextFns.shinglesOfTokens(
        TextFns.wsTokens(col(textCol)), n)).as("g"))
      .distinct()
    // the two bench passes (count + bloom build) and the driver-side
    // sketch are all eval-suite-bounded — the same legitimacy class
    // as annIvfProbe's nprobe-cell collect
    val nBench = benchGrams.count()
    val bloomBytes: Option[Array[Byte]] =
      if (nBench == 0L) None
      else {
        val bits = math.max(64L, math.ceil(
          -nBench * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
        val agg = new BloomFilterAggregate(
          new XxHash64(Seq(ColumnShim.expression(col("g")))),
          Literal(nBench), Literal(bits)).toAggregateExpression()
        Option(benchGrams.select(ColumnShim.column(agg).as("bf"))
          .head().getAs[Array[Byte]]("bf"))
      }
    val docGrams = corpus
      .select(col(idCol),
        array_distinct(TextFns.shinglesOfTokens(
          TextFns.wsTokens(col(textCol)), n)).as("gs"))
      .select(col(idCol), size(col("gs")).cast("long").as("n_grams"),
        explode(col("gs")).as("g"))
    val probe = bloomBytes match {
      case None => lit(false) // empty bench: nothing can be contaminated
      case Some(bytes) => ColumnShim.column(new BloomFilterMightContain(
        Literal(bytes),
        new XxHash64(Seq(ColumnShim.expression(col("g"))))))
    }
    docGrams.where(probe)
      .join(broadcast(benchGrams), Seq("g"))
      .groupBy(col(idCol))
      // every surviving row of a doc carries the same n_grams — first
      // is deterministic and map-side combinable
      .agg(count(lit(1)).cast("long").as("hit_grams"),
        first(col("n_grams")).as("n_grams"))
      .select(col(idCol), col("n_grams"), col("hit_grams"),
        round(col("hit_grams").cast("double") / col("n_grams") + lit(1e-9), 6)
          .as("contamination"))
  }

  /** SPAN-level decontamination (the positional twin of
    * `contaminated`, Lee et al.-style): instead of distinct-gram set
    * overlap, find the token SPANS of each training document covered
    * by verbatim `windowTokens`-token passages from the benchmark
    * set, union-merge them (the `Dedup.repeatedSpans` lag device:
    * each contaminated start past the first contributes
    * min(Δpos, w) tokens), and report coverage — the difference
    * matters for TRIMMING: set overlap says "how much of the doc's
    * vocabulary leaks", span coverage says "which contiguous text to
    * cut".
    *
    * Scale shape: the benchmark window set broadcasts (eval suites
    * are bounded); the corpus side is positional postings probed by
    * one broadcast semi-join — no corpus shuffle for the membership
    * probe, then a (doc)-keyed window + rollup. Docs with zero
    * contaminated windows are absent.
    */
  def contaminatedSpans(
      corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, windowTokens: Int): DataFrame = {
    val w = windowTokens
    require(w >= 2, s"windowTokens must be >= 2, got $w")
    def windows(df: DataFrame) = df.select(col(idCol),
      posexplode(TextFns.shinglesOfTokens(
        TextFns.wsTokens(col(textCol)), w)).as(Seq("pos", "win")))
    val benchWins = windows(bench).select(col("win")).distinct()
    val toks = corpus.select(col(idCol),
      TextFns.wsTokens(col(textCol)).as("tk"))
      .select(col(idCol), col("tk"), size(col("tk")).as("ntok"))
    val hits = toks
      .select(col(idCol), col("ntok"),
        posexplode(TextFns.shinglesOfTokens(col("tk"), w))
          .as(Seq("pos", "win")))
      .join(broadcast(benchWins), Seq("win"))
    val perDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
    hits
      .withColumn("contrib",
        coalesce(least(col("pos") - lag(col("pos"), 1).over(perDoc),
          lit(w)), lit(w)))
      .groupBy(col(idCol))
      .agg(max(col("ntok")).cast("long").as("n_tokens"),
        count(lit(1)).cast("long").as("contam_windows"),
        sum(col("contrib")).cast("long").as("contam_cover_tokens"))
      .withColumn("contam_frac",
        round(col("contam_cover_tokens").cast("double") /
          col("n_tokens") + lit(1e-9), 6))
  }
}
