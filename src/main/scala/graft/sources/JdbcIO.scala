package graft.sources

import graft.config.PipelineConfig
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink builders (the reference's ClickHouse JDBC surface,
  * ClickHouseSink.scala:38-47 / MyWindowFunction.getCoumnName —
  * generalized to Spark's jdbc format).
  *
  * Spark's JDBC relation already does what the reference hand-rolled:
  * schema discovery from database metadata, predicate pushdown into
  * the remote query, partitioned parallel reads (`partitionColumn` /
  * `numPartitions`), and batched writes (`batchsize`). No JDBC driver
  * ships in this image, so these are compile-level builders exercised
  * where a driver is present.
  */
object JdbcIO {

  def read(spark: SparkSession, url: String, table: String,
      user: String, password: String,
      partitionColumn: Option[(String, Long, Long, Int)] = None): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
    partitionColumn.fold(base) { case (c, lo, hi, n) =>
      base.option("partitionColumn", c)
        .option("lowerBound", lo).option("upperBound", hi)
        .option("numPartitions", n)
    }.load()
  }

  /** Batched idempotent-leaning append (reference batch INSERT). */
  def write(df: DataFrame, cfg: PipelineConfig, url: String,
      user: String, password: String, batchSize: Int = 10000): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", s"${cfg.sinkDatabase}.${cfg.sinkTable}")
      .option("user", user)
      .option("password", password)
      .option("batchsize", batchSize)
      .option("isolationLevel", "NONE")
      .mode(SaveMode.Append)
      .save()
}
