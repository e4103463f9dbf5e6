package graft.ingest

import graft.config.PipelineConfig
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSON ingest: parse + metadata enrichment + required-field validation
  * with dirty-record routing — the Spark-first re-expression of
  * MyKafkaDeserializationSchema (/root/reference/src/main/scala/
  * MyKafkaDeserializationSchema.scala:17-43, checkAndProcess:44-60).
  *
  * Works on any Kafka-shaped DataFrame (`topic`, `partition`, `offset`,
  * `value`) — batch or streaming — so it's testable without a broker.
  * All parsing is `from_json` (codegen'd), validation is a pushable
  * predicate, and the dirty stream is the complement of the same scan.
  */
object JsonIngest {

  final case class Parsed(valid: DataFrame, dirty: DataFrame)

  /** Parse `value` (JSON bytes/string) with `schema`, inject source
    * metadata columns (reference injects topicName/topicOffset/
    * topicPartition/topicGroupId), and split on required fields. */
  def parse(kafkaShaped: DataFrame, schema: StructType, cfg: PipelineConfig): Parsed = {
    val parsed = kafkaShaped
      .withColumn("payload", from_json(col("value").cast("string"), schema))
      .withColumn("topicName", col("topic"))
      .withColumn("topicPartition", col("partition"))
      .withColumn("topicOffset", col("offset"))
      .withColumn("topicGroupId", lit(cfg.groupId))
    val required: Column = cfg.requiredFields
      .map(f => col(s"payload.$f").isNotNull)
      .reduceOption(_ && _).getOrElse(lit(true))
    val flat = parsed.select(
      (schema.fieldNames.map(f => col(s"payload.$f").as(f)) ++
        Seq(col("topicName"), col("topicPartition"), col("topicOffset"), col("topicGroupId"))
        ).toIndexedSeq: _*)
    Parsed(
      valid = flat.filter(required),
      dirty = flat.filter(!required))
  }
}
