package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.BatchSize

/** BatchSize: the streaming batch-size advisor's model math (the r19
  * throughput curve's doctrine as code — StreamSmoke's "advise" mode
  * drives it end to end; this spec pins the pure derivations).
  */
class BatchSizeSpec extends AnyFunSuite {

  test("fit recovers the trigger constant and per-row cost from a " +
    "two-size sample") {
    // synthetic truth: C = 0.5 s, r = 5 us/row (the r19 curve's
    // magnitude: ~700 ms batches at ~80 k rows)
    def mk(rows: Long) = (rows, (500 + rows * 0.005).round)
    val fitted =
      BatchSize.fit(Seq(mk(80000), mk(80000), mk(160000), mk(160000)))
    assert(fitted.isDefined)
    val (c, r) = fitted.get
    assert(math.abs(c - 0.5) < 1e-9, s"constant $c")
    assert(math.abs(r - 5e-6) < 1e-15, s"per-row $r")
  }

  test("fit refuses the one-point trap and degenerate slopes") {
    // ONE distinct size cannot separate constant from marginal cost —
    // exactly the r18 one-point doctrine this module replaces
    assert(BatchSize.fit(Seq((1000L, 700L), (1000L, 710L))).isEmpty)
    // negative slope = noise dominates: refuse, don't extrapolate
    assert(BatchSize.fit(Seq((1000L, 700L), (2000L, 600L))).isEmpty)
    assert(BatchSize.fit(Nil).isEmpty)
    // zero-row batches (sentinels) are ignored, not fitted
    assert(BatchSize.fit(Seq((0L, 5L), (0L, 6L))).isEmpty)
  }

  test("rowsPerTrigger sits at k x the constant; maxFilesFor rounds " +
    "to nearest file and clamps to the recovery-unit cap") {
    assert(BatchSize.rowsPerTrigger(0.5, 5e-6) == 400000L)
    assert(BatchSize.rowsPerTrigger(0.5, 5e-6, workFactor = 1.0)
      == 100000L)
    intercept[IllegalArgumentException] {
      BatchSize.rowsPerTrigger(0.0, 5e-6)
    }
    assert(BatchSize.maxFilesFor(400000L, 83000L) == 5)
    assert(BatchSize.maxFilesFor(10L, 83000L) == 1)
    assert(BatchSize.maxFilesFor(Long.MaxValue / 2, 1L) == 64)
    // throughput saturation: at rows = k*C/r the rate is k/(k+1) of
    // the 1/r asymptote — the knee the default k=4 targets (80%)
    val atK4 = BatchSize.predictedRowsPerSec(0.5, 5e-6, 400000L)
    assert(math.abs(atK4 * 5e-6 - 0.8) < 1e-9)
  }
}
