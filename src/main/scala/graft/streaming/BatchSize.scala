package graft.streaming

/** Micro-batch sizing from MEASURED trigger telemetry — the shipped
  * form of the r19 StreamSmoke throughput-curve doctrine ("micro-batch
  * cost is constant-dominated: grow batches until per-batch row work
  * ≈ the trigger constant, then stop"), the way SkewAdvisor and
  * `Sessions.broadcastThresholdFor` shipped their probes' rules.
  *
  * Model (measured at sf1, maxFiles 1/2/4: 91 k → 134 k → 166 k
  * rows/s, p50 batch 697 → 985 ms — every point on this curve):
  *
  *   batchWall ≈ C + r · rows
  *
  * where C is the per-trigger CONSTANT (offset log + planning + state
  * store commit + sink commit — paid per batch regardless of size)
  * and r the per-row marginal cost. Throughput rows/(C + r·rows)
  * rises monotonically with batch size but saturates: at
  * rows = k·C/r the batch is k/(k+1) of the asymptote (k=1 → 50%,
  * k=4 → 80%, k=9 → 90%). Past that, bigger batches buy little rate
  * and cost LATENCY linearly (the state-store/recovery unit is the
  * batch). `workFactor` is that k; the default 4 lands within ~20% of
  * the asymptotic rate at ~1/3 the latency of a k=9 batch.
  *
  * None of this is guessed at plan time: `fit` takes observed
  * (rows, wallMs) pairs from `StreamingQueryProgress` (numInputRows /
  * durationMs.triggerExecution — what StreamSmoke's listener already
  * collects), and the recommendation is re-derived per deployment the
  * way the curve was measured.
  */
object BatchSize {

  /** Least-squares fit of batchWall = C + r·rows over observed
    * batches (rows, triggerWallMs). Needs ≥2 DISTINCT batch sizes —
    * a single size cannot separate the constant from the marginal
    * cost (the r18 one-point trap this module exists to end); returns
    * None otherwise, or when the fit degenerates (non-positive slope:
    * noise dominates — measure with more separation, e.g. stride 1
    * then stride 4). Result: (constantSecs, perRowSecs).
    */
  def fit(batches: Seq[(Long, Long)]): Option[(Double, Double)] = {
    val pts = batches.filter(_._1 > 0)
    if (pts.map(_._1).distinct.size < 2) return None
    val n = pts.size.toDouble
    val mx = pts.map(_._1.toDouble).sum / n
    val my = pts.map(_._2.toDouble / 1000.0).sum / n
    val sxx = pts.map(p => (p._1 - mx) * (p._1 - mx)).sum
    val sxy = pts.map(p => (p._1 - mx) * (p._2 / 1000.0 - my)).sum
    val slope = sxy / sxx
    val icept = my - slope * mx
    // non-positive marginal cost or constant: the sample is noise
    // (e.g. two near-identical sizes, or a cache warmed mid-sample)
    if (slope <= 0 || icept <= 0) None else Some((icept, slope))
  }

  /** Rows per trigger that put per-batch row work at `workFactor` ×
    * the trigger constant — the measured curve's knee (see object
    * doc). Floor 1.
    */
  def rowsPerTrigger(
      constantSecs: Double, perRowSecs: Double,
      workFactor: Double = 4.0): Long = {
    require(constantSecs > 0 && perRowSecs > 0 && workFactor > 0,
      s"need positive constants (got C=$constantSecs r=$perRowSecs " +
        s"k=$workFactor)")
    math.max(1L, (workFactor * constantSecs / perRowSecs).round)
  }

  /** The `maxFilesPerTrigger` that approximates [[rowsPerTrigger]]
    * for a file source whose input files hold ~`rowsPerFile` rows —
    * rounded to the NEAREST file count (ceil would overshoot latency
    * on big files), clamped to [1, maxFiles] (an unbounded
    * recommendation on a cold backlog would ask for the whole backlog
    * in one batch — recovery-unit sanity caps it).
    */
  def maxFilesFor(
      targetRows: Long, rowsPerFile: Long, maxFiles: Int = 64): Int = {
    require(rowsPerFile > 0, s"rowsPerFile must be positive")
    // clamp in LONG before narrowing — a huge target over tiny files
    // overflows Int and would wrap to a nonsense recommendation
    val files = (targetRows.toDouble / rowsPerFile).round
    math.min(maxFiles.toLong, math.max(1L, files)).toInt
  }

  /** Predicted sustained rows/s at a given batch size under the
    * fitted model — printable next to the achieved rate so a
    * deployment can see whether the model held.
    */
  def predictedRowsPerSec(
      constantSecs: Double, perRowSecs: Double, rows: Long): Double =
    rows / (constantSecs + perRowSecs * rows)
}
