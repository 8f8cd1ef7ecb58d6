package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("extractFeatures decodes batches into fixed-dim features") {
    val media = Multimodal.syntheticMedia(spark, 100)
    val feats = Multimodal.extractFeatures(media, batchSize = 16).collect()
    assert(feats.length == 100)
    assert(feats.forall(_.features.length == Multimodal.FakeDecoder.FeatureDim))
    assert(feats.forall(f => f.features.forall(v => v >= 0f && v <= 1f)))
    // deterministic: same id -> same features on recompute
    val again = Multimodal.extractFeatures(media, batchSize = 7).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    assert(feats.forall(f => again(f.media_id) == f.features.toSeq))
  }

  test("partitionByKind co-locates modalities") {
    val media = Multimodal.syntheticMedia(spark, 30).toDF()
    val parted = Multimodal.partitionByKind(media, 3)
    assert(parted.rdd.getNumPartitions == 3)
    import org.apache.spark.sql.functions._
    // every kind lands in exactly one partition
    val kindsPerPart = parted
      .withColumn("pid", spark_partition_id())
      .groupBy("kind").agg(countDistinct("pid").as("nparts"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kindsPerPart.values.forall(_ == 1L))
  }
}
