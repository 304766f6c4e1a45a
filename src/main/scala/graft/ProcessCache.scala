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
  private val buildSecs =
    new java.util.concurrent.ConcurrentHashMap[String, Double]()

  /** Per-key build wall seconds for this process (keys without the
    * applicationId prefix). The bench record publishes this so the
    * one-time ingest cost of each artifact is a separately-timed,
    * visible number instead of hiding inside whichever warmup query
    * happened to touch the cache first — cross-round deltas of the
    * artifact-CONSUMING queries then compare probe work only. */
  def builds: Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    buildSecs.asScala.toMap
  }

  /** Lookup-or-build. The build runs OUTSIDE the map's bin lock
    * (lookup → build → putIfAbsent, NOT computeIfAbsent) so an
    * artifact whose build consumes ANOTHER cached artifact — the
    * oriented edge set over the canonical one, a PQ codebook over
    * trained centroids — can nest `get` calls legally;
    * `computeIfAbsent` throws "Recursive update" when the nested call
    * lands in the same bin. The race this admits (two threads both
    * building, first put wins) is benign — both builds produce the
    * same deterministic artifact and the mains run queries
    * sequentially anyway. */
  def get(s: SparkSession, key: String)(mk: => DataFrame): DataFrame = {
    val prefix = s.sparkContext.applicationId + ":"
    cache.keySet.removeIf(k => !k.startsWith(prefix))
    val k = prefix + key
    val existing = cache.get(k)
    if (existing != null) existing
    else {
      val t0 = System.nanoTime()
      val df = mk
      val prev = cache.putIfAbsent(k, df)
      if (prev != null) prev
      else {
        buildSecs.put(key, (System.nanoTime() - t0) / 1e9)
        df
      }
    }
  }
}
