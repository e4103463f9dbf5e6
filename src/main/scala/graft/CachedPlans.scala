package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped registry for shared persisted plans (dedup inverted
  * indexes, ANN corpus projections). Reusing the SAME DataFrame
  * instance — instead of re-persisting an identical plan — avoids
  * CacheManager's "Asked to cache already cached data" double-persist,
  * and gives the caches an explicit unpersist lifecycle instead of
  * living until session teardown. */
object CachedPlans {

  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  /** Get-or-build the persisted plan for `key` in this session. */
  def cached(s: SparkSession, key: String)(build: => DataFrame): DataFrame =
    cache.getOrElseUpdate((s, key), build.persist())

  /** Unpersist and drop every plan this session registered. */
  def clear(s: SparkSession): Unit =
    cache.keys.filter(_._1 eq s).foreach { k =>
      cache.remove(k).foreach(_.unpersist(blocking = false))
    }
}
