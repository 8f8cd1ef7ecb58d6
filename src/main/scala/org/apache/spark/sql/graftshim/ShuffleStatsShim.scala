package org.apache.spark.sql.graftshim

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec

/** Read-only view of a materialized AQE shuffle stage's map-output
  * statistics. `ShuffleQueryStageExec.mapStats` returns the
  * `private[spark]` `MapOutputStatistics` — the per-reduce-partition
  * COMPRESSED byte sizes that AQE's own skew classifier
  * (`OptimizeSkewedJoin`) compares against
  * `skewedPartitionThresholdInBytes`. graft's SkewAdvisor needs
  * exactly those numbers (an uncompressed row-count proxy is the r18
  * probe's measured trap: a constant hot key compresses so well the
  * default threshold never fires), so this shim re-exports them as
  * plain values (no internals modified).
  */
object ShuffleStatsShim {

  /** `(shuffleId, numMappers, bytesByPartitionId)` if this node is a
    * materialized shuffle stage with statistics. numMappers is the
    * split-feasibility bound: AQE splits a skewed partition into
    * contiguous MAP-INDEX ranges, so one mapper ⇒ unsplittable.
    */
  def shuffleStats(p: SparkPlan): Option[(Int, Int, Array[Long])] =
    p match {
      case s: ShuffleQueryStageExec =>
        s.mapStats.map(ms =>
          (ms.shuffleId, s.shuffle.numMappers, ms.bytesByPartitionId))
      case _ => None
    }
}
