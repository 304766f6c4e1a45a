package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Process-lifetime cache for INGEST-time artifacts (trained ANN
  * models, built graphs): build once, probe many — repeated
  * invocations of a registered query reuse one build per
  * (applicationId, key) instead of re-running it per call.
  *
  * Keys carry the applicationId because a localCheckpointed table is
  * bound to its SparkContext: a fresh context must never see a stale
  * entry, and entries from DEAD contexts are evicted on the next
  * lookup, so a JVM cycling sessions cannot accumulate dead plan
  * graphs. */
private[graft] object ProcessCache {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def get(s: SparkSession, key: String)(mk: => DataFrame): DataFrame = {
    val prefix = s.sparkContext.applicationId + ":"
    cache.keySet.removeIf(k => !k.startsWith(prefix))
    cache.computeIfAbsent(prefix + key, _ => mk)
  }
}
