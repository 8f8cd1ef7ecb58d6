package graft

import org.apache.spark.sql.functions.col

import graft.operators.Decontam

class DecontamSpec extends SparkSpec {
  import spark.implicits._

  test("contaminated flags docs sharing an n-gram with the benchmark") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta"), // "beta gamma delta" hits bench
      (2L, "one two three four"),     // no overlap
      (3L, "tiny doc")                // < n tokens -> no grams -> absent
    ).toDF("doc_id", "text")
    val bench = Seq(
      Tuple1("zzz beta gamma delta yyy")).toDF("text")
    val out = Decontam.contaminated(corpus, bench, "doc_id", "text", 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.keySet == Set(1L))
    val r = out(1L)
    assert(r.getAs[Long]("n_grams") == 2L)   // 2 distinct 3-grams in doc 1
    assert(r.getAs[Long]("hit_grams") == 1L) // "beta gamma delta"
    assert(r.getAs[Double]("contamination") == 0.5)
  }

  test("duplicate n-grams count once per doc and once in the benchmark") {
    val corpus = Seq(
      (1L, "a b c a b c")).toDF("doc_id", "text") // "a b c" twice
    val bench = Seq(Tuple1("a b c"), Tuple1("a b c")).toDF("text")
    val r = Decontam.contaminated(corpus, bench, "doc_id", "text", 3).head()
    // grams: "a b c", "b c a", "c a b", "a b c" -> 3 DISTINCT
    assert(r.getAs[Long]("n_grams") == 3L)
    assert(r.getAs[Long]("hit_grams") == 1L)
    assert(r.getAs[Double]("contamination") == 0.333333)
  }

  test("empty benchmark yields an empty result, not a crash") {
    val corpus = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val bench = Seq.empty[Tuple1[String]].toDF("text")
    assert(Decontam.contaminated(corpus, bench, "doc_id", "text", 3)
      .where(col("hit_grams") > 0).count() == 0L)
  }
}
