package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession

/** Test-only bridge to the session's `private[sql]` CacheManager, so specs
  * can assert that library calls do not leave pinned cached frames behind
  * (cache-leak regression guard). */
object CacheProbe {
  def cacheIsEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty
}
