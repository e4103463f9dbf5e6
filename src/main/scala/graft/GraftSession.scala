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
      // explicit: AQE splits skewed shuffle-join partitions at runtime
      // (the per-key hot-spot answer at 100 TB, alongside SkewJoin's
      // deliberate salting for known-skew keys)
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // runtime bloom filters: a shuffle join's selective side injects
      // a bloom filter into the other side's scan — at 100 TB this
      // prunes fact-table rows before the exchange, off by default
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
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
