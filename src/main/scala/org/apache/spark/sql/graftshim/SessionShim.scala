package org.apache.spark.sql.graftshim

import org.apache.spark.sql.SparkSession

/** Read-only view of session cache state. Spark 4's public API can
  * clear the cache (`spark.catalog.clearCache()`) but cannot ASK
  * whether anything is cached — the CacheManager hangs off the classic
  * session's SharedState. graft.Caching's lifecycle spec needs that
  * predicate to prove "no net cached plans after the documented
  * lifecycle call", so this shim re-exports it (no internals modified).
  */
object SessionShim {
  def cacheIsEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty
}
