package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard tuning.
  *
  * Local-mode testing stands in for a multi-executor cluster: AQE on
  * (runtime coalesce + skew-join splitting), shuffle partitions sized
  * to cores (not the 200 default), UTC session time for oracle parity.
  */
object GraftSession {
  def builder(master: String = "local[*]", cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", math.max(cores, 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // pinned to their Spark 4 defaults deliberately: both are
      // load-bearing for the 100-TB plan shape (AQE skew-join split
      // for hot keys; runtime bloom filters pruning the fact side of
      // shuffle joins before the exchange), and pinning keeps an ops
      // config override from silently turning them off
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // static conf, read once at first-session bring-up: the default
      // 100-entry generated-class cache thrashes on a 200+-query
      // surface (every pass evicts everything, so every query repays
      // Janino compilation — pure driver-side latency that grows with
      // the library, not the data); size it to hold the whole surface.
      // r15: 4000 → 8000 after the 449-query surface started evicting
      // mid-session (pass-2 emb/graph spikes with flat GC — recompiles,
      // not heap; cold-isolated the same ops matched their r14 times)
      .config("spark.sql.codegen.cache.maxEntries", "8000")
      // Long-session health (r12, after two driver rounds showed the
      // SECOND full pass over a ~390-query surface running 2.2× slower
      // than the first with 30–96× single-query GC spikes): a session
      // that executes hundreds of plans accretes driver-side state
      // that the defaults size for a handful of long jobs, not
      // thousands of short ones.
      //  - AppStatus/SQL listener stores retain 1000 jobs / 1000
      //    stages / 100k tasks / 1000 SQL executions by default —
      //    hundreds of MB of old-gen on a 780-execution session, all
      //    dead weight with the UI off. Cap them low; nothing here
      //    reads them back.
      //  - ContextCleaner is GC-driven (shuffle files, broadcasts and
      //    accumulators are only released when a GC enqueues their
      //    weak refs) and its safety-net periodic GC fires every 30
      //    MINUTES by default — an 11-minute bench session never gets
      //    one, so shuffle/broadcast state piles up until heap
      //    pressure forces stop-the-world collections mid-query.
      //    5 minutes keeps the reclaim cadence ahead of accretion.
      .config("spark.ui.retainedJobs", "200")
      .config("spark.ui.retainedStages", "400")
      .config("spark.ui.retainedTasks", "20000")
      .config("spark.sql.ui.retainedExecutions", "100")
      .config("spark.cleaner.periodicGC.interval", "5min")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")

  def getOrCreate(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
