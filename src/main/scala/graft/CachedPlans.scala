package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped registry for shared persisted plans (dedup inverted
  * indexes, ANN corpus projections). Reusing the SAME DataFrame
  * instance — instead of re-persisting an identical plan — avoids
  * CacheManager's "Asked to cache already cached data" double-persist,
  * and gives the caches an explicit unpersist lifecycle instead of
  * living until session teardown.
  *
  * Sessions are held WEAKLY: a caller that never invokes [[clear]]
  * (tests, notebooks, embedding apps) doesn't pin its session — once
  * the session is unreachable its cached plans are too, and the entry
  * drops out of the registry. Entry insertion is putIfAbsent-shaped so
  * a racing builder unpersists its losing copy instead of leaking an
  * unreferenced persisted plan in the CacheManager.
  */
object CachedPlans {

  // WeakHashMap keys on the session; inner map keys on the plan name.
  // All access synchronized — plan builds happen outside the lock.
  private val cache =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[String, DataFrame]]()

  private def sessionMap(s: SparkSession): scala.collection.mutable.Map[String, DataFrame] =
    cache.synchronized {
      var m = cache.get(s)
      if (m == null) { m = scala.collection.mutable.Map.empty[String, DataFrame]; cache.put(s, m) }
      m
    }

  /** Get-or-build the persisted plan for `key` in this session. */
  def cached(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val m = sessionMap(s)
    m.synchronized(m.get(key)) match {
      case Some(df) => df
      case None =>
        val built = build.persist() // build outside the lock; race resolved below
        val prior = m.synchronized {
          val p = m.get(key)
          if (p.isEmpty) m.update(key, built)
          p
        }
        prior match {
          case Some(winner) =>
            built.unpersist(blocking = false) // lost the race: release our copy
            winner
          case None => built
        }
    }
  }

  // Session-scoped side-effect artifacts (temp-dir rewrites like the
  // ORC interchange copy): one materialization per (session, key),
  // same weak-session lifecycle as the plan registry.
  private val paths =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[String, String]]()

  /** Get-or-build a session-scoped materialized PATH for `key` (e.g. a
    * format-converted copy of a table) — the build runs at most once
    * per session+key; racing builders reuse the winner's path. */
  def cachedPath(s: SparkSession, key: String)(build: => String): String = {
    val m = paths.synchronized {
      var x = paths.get(s)
      if (x == null) { x = scala.collection.mutable.Map.empty[String, String]; paths.put(s, x) }
      x
    }
    m.synchronized(m.get(key)) match {
      case Some(p) => p
      case None =>
        val built = build
        m.synchronized(m.getOrElseUpdate(key, built))
    }
  }

  /** Unpersist and drop ONE plan (no-op when absent) — the rebuild
    * path for registry entries that can go stale (e.g. an ANN index
    * after corpus growth). */
  def invalidate(s: SparkSession, key: String): Unit = {
    val m = sessionMap(s)
    m.synchronized(m.remove(key)).foreach(_.unpersist(blocking = false))
  }

  /** Unpersist and drop every plan this session registered. */
  def clear(s: SparkSession): Unit = {
    val m = cache.synchronized(Option(cache.remove(s)))
    m.foreach(_.synchronized {
      m.get.values.foreach(_.unpersist(blocking = false))
      m.get.clear()
    })
  }
}
