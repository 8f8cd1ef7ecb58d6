package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Corpus

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "spark shuffles data", "en", "src0", 19L),
    (2L, "fenster funktionen", "de", "src0", 18L),
    (3L, "joins are fast", "en", "src1", 14L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("jsonl round-trip with declared schema") {
    val dir = Files.createTempDirectory("graft_jsonl").toString
    docs.write.mode("overwrite").json(dir)
    val back = Corpus.readJsonl(spark, dir, Corpus.documentsSchema)
    assert(back.count() == 3)
    assert(back.schema == Corpus.documentsSchema)
    assert(back.where(col("lang") === "de").count() == 1)
  }

  test("csv round-trip with declared schema") {
    val dir = Files.createTempDirectory("graft_csv").toString
    docs.write.mode("overwrite").option("header", "true").csv(dir)
    val back = Corpus.readCsv(spark, dir, Corpus.documentsSchema)
    assert(back.count() == 3)
    assert(back.select(sum(col("n_chars"))).head.getLong(0) == 51L)
  }

  test("partitioned write prunes partitions in the scan") {
    val dir = Files.createTempDirectory("graft_part").toString + "/docs"
    Corpus.writePartitioned(docs, dir, Seq("lang"))
    val filtered = spark.read.parquet(dir).where(col("lang") === "en")
    assert(filtered.count() == 2)
    // partition pruning must reach the file scan (inputFiles lists the
    // relation pre-pruning, so the plan's PartitionFilters is the
    // authoritative signal)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"))
  }

  test("bucketed tables join without an exchange on the bucket key") {
    def rmrf(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles.foreach(rmrf)
      p.delete(): Unit
    }
    Seq("graft_docs_bucketed", "graft_meta_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      // a crashed prior run can leave the managed location behind
      rmrf(new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t))
    }
    Corpus.writeBucketed(docs, "graft_docs_bucketed", "doc_id", 4)
    Corpus.writeBucketed(
      docs.select(col("doc_id"), col("source")), "graft_meta_bucketed", "doc_id", 4)
    val joined = spark.table("graft_docs_bucketed")
      .join(spark.table("graft_meta_bucketed"), Seq("doc_id"))
    assert(joined.count() == 3)
    val plan = joined.queryExecution.executedPlan.toString
    // co-located bucketed join: no shuffle exchange on either side
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"))
  }
}
