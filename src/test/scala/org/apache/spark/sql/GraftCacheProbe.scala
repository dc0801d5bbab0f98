package org.apache.spark.sql

/** Test-only window into the session's `private[sql]` CacheManager, so
  * specs can assert that library operators leave no session-lifetime cache
  * entries behind (a cache leak on a long-lived cluster session grows until
  * executors evict hot data — invisible to correctness tests, lethal at
  * 100 TB). Lives in package org.apache.spark.sql purely for access. */
object GraftCacheProbe {
  def cacheIsEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager.isEmpty

  def cachedEntryCount(spark: SparkSession): Int =
    spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager.numCachedEntries
}
