package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.Sessions

/** Dev harness: amplify the sf0.1 testdata 10x into an sf1-shaped
  * directory for local scale probes (the driver only generates up to
  * sf0.1). NOT part of the library surface — the output is a probe
  * input for Bench, never an oracle input (correctness stays bound to
  * the driver's testdata + DuckDB).
  *
  * Amplification is key-offset replication, preserving referential
  * integrity exactly:
  *   - fixed-cardinality dims (region, nation) copy verbatim;
  *   - every synthetic-key table replicates REP times with key
  *     offset i*stride (stride = pow10 above the global max key, so
  *     replica key spaces never collide), and every foreign key gets
  *     the SAME stride, so each replica is a self-consistent copy of
  *     the star schema;
  *   - documents perturb replica text with a per-replica suffix
  *     token: replicas become NEAR-duplicates (realistic crawl-dup
  *     structure for the dedup family) instead of exact clones;
  *   - events keep their time range (10x density, same window) —
  *     the realistic direction for a busier stream;
  *   - embeddings replicate with a deterministic tiny first-component
  *     nudge per replica so ANN/kmeans see distinct-but-clustered
  *     points, not 10-way ties.
  *
  * All replication is `explode(sequence(...))` — a narrow per-row
  * fan-out, no shuffle; writes repartition only to keep output file
  * counts sane.
  */
object ScaleUp {

  val Rep = 10

  /** Smallest power of 10 strictly above the max over the given key
    * columns, shared by a table family so PK and FK offset alike. */
  private def stride(maxKey: Long): Long = {
    var s = 1L
    while (s <= maxKey) s *= 10
    s
  }

  private var repN = Rep

  private def rep(df: DataFrame): DataFrame =
    df.withColumn("__r", explode(sequence(lit(0), lit(repN - 1))))

  private def off(c: String, strideV: Long) =
    col(c) + col("__r").cast("long") * lit(strideV)

  /** args: [in] [out] [rep] [mode]. mode `near` (default) perturbs
    * replicas lightly so they stay NEAR-DUPS of their source (the
    * dup-amplified direction: clusters get rep× deeper — right for
    * one decade, but re-applying it compounds cluster sizes until
    * the dedup guards fire). mode `far` perturbs replicas past every
    * dup threshold — a marker token spliced after every 4th token
    * drops cross-replica 3-gram Jaccard to ~0.29 (< the 0.5 ops
    * threshold) and a 0.35 component-0 nudge drops cosine far below
    * the 0.999 embedding-dup bar — so the output has rep× as MANY
    * dup clusters at the SOURCE's cluster sizes: the realistic
    * bigger-crawl direction for chaining probes (sf1 → sf3 → ...)
    * without compounding dup depth.
    */
  def main(args: Array[String]): Unit = {
    val in = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/root/repo/.scaleprobe/sf1"
    repN = if (args.length > 2) args(2).toInt else Rep
    val far = args.length > 3 && args(3) == "far"
    val spark = Sessions.localBuilder(32).appName("graft-scaleup").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(n: String) = spark.read.parquet(s"$in/$n.parquet")
    def write(df: DataFrame, n: String, parts: Int): Unit =
      df.repartition(parts)
        .write.mode(SaveMode.Overwrite).parquet(s"$out/$n.parquet")

    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c).cast("long"))).head().getLong(0)

    // fixed dims: verbatim
    write(read("region"), "region", 1)
    write(read("nation"), "nation", 1)

    val customer = read("customer")
    val supplier = read("supplier")
    val part_ = read("part")
    val orders = read("orders")
    val lineitem = read("lineitem")
    val custS = stride(maxOf(customer, "c_custkey"))
    val suppS = stride(maxOf(supplier, "s_suppkey"))
    val partS = stride(maxOf(part_, "p_partkey"))
    val ordS = stride(maxOf(orders, "o_orderkey"))

    write(rep(customer)
      .withColumn("c_custkey", off("c_custkey", custS))
      .drop("__r"), "customer", 4)
    write(rep(supplier)
      .withColumn("s_suppkey", off("s_suppkey", suppS))
      .drop("__r"), "supplier", 2)
    write(rep(part_)
      .withColumn("p_partkey", off("p_partkey", partS))
      .drop("__r"), "part", 4)
    write(rep(orders)
      .withColumn("o_orderkey", off("o_orderkey", ordS))
      .withColumn("o_custkey", off("o_custkey", custS))
      .drop("__r"), "orders", 8)
    write(rep(lineitem)
      .withColumn("l_orderkey", off("l_orderkey", ordS))
      .withColumn("l_partkey", off("l_partkey", partS))
      .withColumn("l_suppkey", off("l_suppkey", suppS))
      .drop("__r"), "lineitem", 16)

    val events = read("events")
    val evS = stride(maxOf(events, "event_id"))
    val userS = stride(maxOf(events, "user_id"))
    write(rep(events)
      .withColumn("event_id", off("event_id", evS))
      .withColumn("user_id", off("user_id", userS))
      .drop("__r"), "events", 8)

    val documents = read("documents")
    val docS = stride(maxOf(documents, "doc_id"))
    write(rep(documents)
      .withColumn("doc_id", off("doc_id", docS))
      // replica 0 keeps the original text; replicas i>0 either append
      // a short variant token (near: high-Jaccard near-duplicates) or
      // splice a replica-tagged marker after every 4th token (far:
      // ~0.29 Jaccard to the source AND to sibling replicas — new
      // independent documents that carry the source's own dup
      // structure along verbatim)
      .withColumn("text",
        when(col("__r") === 0, col("text"))
          .otherwise(if (far)
            array_join(transform(split(col("text"), "\\s+"), (t, i) =>
              when(i % 4 === 3,
                concat(t, lit(" vvvmark"), col("__r").cast("string")))
                .otherwise(t)), " ")
          else concat(col("text"), lit(" variant "),
            col("__r").cast("string"))))
      // keep the derived length column consistent with the perturbed
      // text — n_chars-driven queries (pack/drift/stats) and
      // text-tokenizing queries must see the SAME corpus
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("__r"), "documents", 8)

    val embeddings = read("embeddings")
    val vecS = stride(maxOf(embeddings, "vec_id"))
    write(rep(embeddings)
      .withColumn("vec_id", off("vec_id", vecS))
      // near: nudge component 0 by r * 1e-3 — replicas stay inside
      // their source's dup neighborhood but are not bit-identical.
      // far: r * 0.35 — replicas leave every dup threshold (cosine
      // well below 0.999) yet keep the source's LOCAL structure, so
      // cluster count scales instead of cluster depth.
      .withColumn("embedding",
        transform(col("embedding"), (x, i) =>
          when(i === 0, x + col("__r").cast("float") *
            (if (far) lit(0.35f) else lit(1e-3f)))
            .otherwise(x)))
      .drop("__r"), "embeddings", 4)

    val counts = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
      .map(n => n -> spark.read.parquet(s"$out/$n.parquet").count())
    counts.foreach { case (n, c) => println(s"[scaleup] $n: $c rows") }
    spark.stop()
  }
}
