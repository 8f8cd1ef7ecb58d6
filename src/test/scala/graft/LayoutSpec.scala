package graft

import org.apache.spark.sql.functions._

import graft.sources.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zorderKey interleaves bin bits into a Morton code") {
    // a = 0b11 (even positions), b = 0b01 (odd positions):
    // pos0 = a.bit0 = 1, pos1 = b.bit0 = 1, pos2 = a.bit1 = 1,
    // pos3 = b.bit1 = 0 -> 0b0111 = 7
    val key = spark.range(1)
      .select(Layout.zorderKey(Seq(lit(3), lit(1)), 2).as("z"))
      .head.getLong(0)
    assert(key == 7L)
    intercept[IllegalArgumentException] {
      Layout.zorderKey(Seq(lit(1), lit(1)), 32)
    }
  }

  test("binByCuts ranks against cut points; nulls land in bin 0") {
    val out = Seq(Some(5.0), Some(25.0), Some(95.0), None).toDF("x")
      .select(Layout.binByCuts(col("x"), Array(10.0, 50.0, 90.0)).as("b"))
      .collect().map(_.getInt(0)).toSeq
    assert(out == Seq(0, 1, 3, 0))
    // > 8 bits of cuts = a 256-branch conditional chain per row;
    // refused rather than codegen-bombed
    intercept[IllegalArgumentException] {
      Layout.binByCuts(col("x"), (1 to 256).map(_.toDouble).toArray)
    }
  }

  test("writeZordered clusters BOTH columns per file where a single-column " +
    "sort leaves the other column unprunable") {
    // two wide-spread dims: a is i scrambled by a unit multiplier,
    // b wraps a steep line over the square — a small a-range maps to
    // b values across the full range, the layout-hostile case
    val n = 40000
    val df = (0 until n).map { i =>
      (i.toLong, (i * 35761L % n).toDouble, (i * 40503L % n).toDouble)
    }.toDF("id", "a", "b")
    val tmp = java.nio.file.Files.createTempDirectory("graft_layout")
    val (zdir, sdir) = (s"$tmp/zorder", s"$tmp/asorted")
    val cuts = Layout.writeZordered(df, zdir, Seq("a", "b"),
      bits = 5, numFiles = 16)
    assert(cuts("a").length == 31 && cuts("b").length == 31)
    df.repartitionByRange(16, col("a")).sortWithinPartitions(col("a"))
      .write.parquet(sdir)

    // per-file min-max span = what parquet stats expose to a scan's
    // file/row-group skipping; fraction of the global range
    def avgSpan(dir: String, c: String): Double = {
      val files = new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet") &&
          !f.getName.startsWith("."))
      assert(files.length >= 12, s"expected ~16 data files in $dir")
      val spans = files.map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min(col(c)).as("lo"), max(col(c)).as("hi")).head()
        (r.getDouble(1) - r.getDouble(0)) / n
      }
      spans.sum / spans.length
    }
    val (sa, sb) = (avgSpan(sdir, "a"), avgSpan(sdir, "b"))
    val (za, zb) = (avgSpan(zdir, "a"), avgSpan(zdir, "b"))
    // the a-sort prunes a perfectly and b not at all
    assert(sa < 0.15, s"a-sorted layout must cluster a: $sa")
    assert(sb > 0.8, s"a-sorted layout must be blind on b: $sb")
    // z-order: EVERY file is a small rectangle — both columns narrow,
    // and b's file spans collapse vs the sorted layout's full-range
    assert(za < 0.6, s"zorder a-span too wide: $za")
    assert(zb < 0.6 && zb < sb / 2,
      s"zorder must make b prunable: $zb vs sorted $sb")
  }

  test("a selective predicate on the SECOND z-ordered column actually " +
    "skips row groups: rows actually decoded by the scan are a " +
    "fraction of what the single-column-sorted control decodes, " +
    "with identical results") {
    // same layout-hostile square as the span test: a-sort clusters a
    // perfectly and leaves b full-range in every file, so a filter on
    // b can skip NOTHING there; z-order gives every file a narrow b
    // window, so parquet min/max stats skip most groups at read time
    val n = 40000
    val df = (0 until n).map { i =>
      (i.toLong, (i * 35761L % n).toDouble, (i * 40503L % n).toDouble)
    }.toDF("id", "a", "b")
    val tmp = java.nio.file.Files.createTempDirectory("graft_layout_skip")
    val (zdir, sdir) = (s"$tmp/zorder", s"$tmp/asorted")
    Layout.writeZordered(df, zdir, Seq("a", "b"), bits = 5, numFiles = 16)
    df.repartitionByRange(16, col("a")).sortWithinPartitions(col("a"))
      .write.parquet(sdir)

    // the scan node's own numOutputRows SQL metric = rows the parquet
    // reader actually DECODED — rows in skipped row groups/pages
    // never increment it, so it measures the skip itself. Unlike a
    // SparkListener bytes sum, the metric is per-plan and its
    // accumulators are final when the job returns (merged on task
    // completion in the scheduler): deterministic under the parallel
    // full-suite run, where async listener-bus delivery from OTHER
    // suites' scans made the listener approach flaky.
    def scanRowsOf(dir: String): (Long, Long) = {
      val df = spark.read.parquet(dir)
        .where(col("b") >= 100 && col("b") < 600)
      val qe = df.queryExecution
      val cnt = qe.executedPlan.execute().count()
      val plan = qe.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val scanRows = plan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numOutputRows").value
      }.sum
      (scanRows, cnt)
    }
    val (sortedRows, sortedCnt) = scanRowsOf(sdir)
    val (zRows, zCnt) = scanRowsOf(zdir)
    assert(zCnt == sortedCnt && zCnt == 500L,
      s"layout must not change results: z=$zCnt sorted=$sortedCnt")
    // the a-sorted control decodes essentially everything (every file
    // spans b's full range); the z-ordered layout skips the row
    // groups whose b-window misses [100,600)
    assert(sortedRows > (n * 9) / 10,
      s"control must be unprunable on b: decoded $sortedRows of $n")
    assert(zRows < sortedRows * 0.7,
      s"z-order must skip rows the a-sort cannot: z=$zRows " +
        s"vs sorted=$sortedRows")
  }
}
