package graft.config

import java.io.FileInputStream
import java.util.Properties
import scala.jdk.CollectionConverters._

/** Typed pipeline configuration — covers the reference's
  * `test.properties` surface (/root/reference/test.properties): Kafka
  * consumer, checkpoint/restart policy, sink target + retry, window
  * size, required-field validation, string-typed columns.
  */
final case class PipelineConfig(
    // source
    bootstrapServers: String = "localhost:9092",
    topics: Seq[String] = Seq("events"),
    groupId: String = "graft",
    startingOffsets: String = "earliest",
    maxOffsetsPerTrigger: Option[Long] = Some(100000L),
    // validation (reference `check.field`)
    requiredFields: Seq[String] = Seq("cTime", "essCode"),
    // batching (reference `window.size`)
    windowSize: Int = 20,
    // checkpoint / restart (reference checkpoint.* / restart.*)
    env: String = "test",
    checkpointLocation: String = "/tmp/graft-checkpoints",
    triggerIntervalMs: Long = 5000L,
    // sink (reference clickhouse.*)
    sinkDatabase: String = "sink",
    sinkTable: String = "events",
    sinkMaxRetries: Int = 3,
    sinkRetryBackoffMs: Long = 100L,
    stringTypes: Set[String] = Set("string", "date", "datetime"),
    // state backend (reference state.backend → Flink Fs/RocksDB state
    // backends; Spark's analog is the streaming state store provider)
    stateBackend: String = "hashmap") {

  /** Session confs implied by this config. `rocksdb` selects Spark's
    * RocksDB state store provider — at 100-TB keyed state the default
    * in-memory HDFS-backed store holds every key's state on-heap;
    * RocksDB keeps it off-heap with incremental snapshots, the same
    * role RocksDBStateBackend plays in the reference. */
  def sparkConfs: Map[String, String] = stateBackend.toLowerCase match {
    case "rocksdb" => Map(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true")
    case _ => Map.empty
  }
}

object PipelineConfig {

  def fromProperties(props: Properties): PipelineConfig = {
    val m = props.asScala
    def get(k: String, dflt: String) = m.getOrElse(k, dflt)
    def getList(k: String, dflt: String) =
      get(k, dflt).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    PipelineConfig(
      bootstrapServers = get("kafka.bootstrap.servers", "localhost:9092"),
      topics = getList("kafka.topic", "events"),
      groupId = get("kafka.consumer.groupid", "graft"),
      startingOffsets = get("kafka.auto.offset.reset", "earliest"),
      maxOffsetsPerTrigger =
        m.get("kafka.maxOffsetsPerTrigger").map(_.trim.toLong).orElse(Some(100000L)),
      requiredFields = getList("check.field", "cTime,essCode"),
      windowSize = get("window.size", "20").toInt,
      env = get("flink.env", get("env", "test")),
      checkpointLocation = get("checkpoint.path", "/tmp/graft-checkpoints"),
      triggerIntervalMs = get("checkpoint.interval", "5000").toLong,
      sinkDatabase = get("clickhouse.database", "sink"),
      sinkTable = get("clickhouse.table", "events"),
      sinkMaxRetries = get("clickhouse.maxRetries", "3").toInt,
      sinkRetryBackoffMs = get("clickhouse.retryBackoffMs", "100").toLong,
      stringTypes = get("clickhouse.stringTypes", "String,Date,DateTime")
        .split(",").map(_.trim.toLowerCase).toSet,
      stateBackend = get("state.backend", "hashmap"))
  }

  def fromFile(path: String): PipelineConfig = {
    val props = new Properties()
    val in = new FileInputStream(path)
    try props.load(in) finally in.close()
    fromProperties(props)
  }
}
