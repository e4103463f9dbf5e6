package graft.sinks

import graft.config.PipelineConfig
import org.apache.spark.sql.DataFrame

/** Pluggable statement writer — the seam where a JDBC/ClickHouse/HTTP
  * client plugs in (reference: ClickHouseSink's connection). Must be
  * serializable: it runs inside executor tasks. */
trait StatementWriter extends Serializable {
  /** Write one batch of statements; throw to signal a retryable failure. */
  def write(batchId: Long, statements: Iterator[String]): Unit
}

/** Batched sink with bounded retry + backoff, re-expressing the
  * reference's ClickHouseSink.retryOnFailure (ClickHouseSink.scala:
  * 49-70) for Spark's execution model:
  *
  *  - statement generation is distributed (SqlInsertFormatter);
  *  - writes run per-partition on executors, not on the driver;
  *  - retry is per-partition with exponential backoff; exhausting
  *    retries rethrows, failing the task → Spark/Structured Streaming
  *    replays the batch (at-least-once; pair with an idempotence key —
  *    `batchId` — for effectively-once, which the reference lacks).
  */
class BatchedRetrySink(
    writer: StatementWriter,
    maxRetries: Int = 3,
    backoffMs: Long = 100L,
    chunkSize: Int = 4096) extends Serializable {

  /** foreachBatch-compatible entry point: format + write one micro-batch.
    * `keyExpr` partitions the batching (reference keyBy(essCode));
    * `spark_partition_id()` keys batches by source partition so the
    * single batching shuffle stays uniform — use a domain key when
    * per-key statement ordering matters. Statements stream through in
    * chunks of `chunkSize` (the retry unit must be replayable, so each
    * chunk is materialized, but never the whole partition). */
  def writeBatch(table: String, keyExpr: org.apache.spark.sql.Column, batchSize: Int,
      targetTypes: Map[String, String] = Map.empty,
      dialect: SqlDialect = SqlDialect.ClickHouseLike)(
      df: DataFrame, batchId: Long): Unit = {
    val stmts = SqlInsertFormatter.insertStatements(df, table, keyExpr, batchSize,
      targetTypes, dialect)
    val w = writer
    val (retries, backoff, chunk) = (maxRetries, backoffMs, chunkSize)
    stmts.select("stmt").foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      rows.map(_.getString(0)).grouped(chunk).foreach { group =>
        BatchedRetrySink.retryOnFailure(retries, backoff) {
          w.write(batchId, group.iterator)
        }
      }
    }
  }

  def fromConfig(cfg: PipelineConfig): (DataFrame, Long) => Unit =
    writeBatch(s"${cfg.sinkDatabase}.${cfg.sinkTable}",
      org.apache.spark.sql.functions.spark_partition_id(), cfg.windowSize)
}

object BatchedRetrySink {
  /** Bounded retry with exponential backoff; rethrows after the last
    * attempt so the caller (task) fails loudly — unlike the reference,
    * which swallows the final failure and drops the batch. Fatal errors
    * and interrupts (Spark's task-cancellation signal) propagate
    * immediately instead of sleeping through backoffs. */
  def retryOnFailure[T](maxRetries: Int, backoffMs: Long)(block: => T): T = {
    var attempt = 0
    var result: Option[T] = None
    var lastErr: Throwable = null
    while (result.isEmpty && attempt <= maxRetries) {
      try result = Some(block)
      catch {
        case scala.util.control.NonFatal(e) if !e.isInstanceOf[InterruptedException] =>
          lastErr = e
          attempt += 1
          if (attempt <= maxRetries) Thread.sleep(backoffMs * (1L << (attempt - 1)))
      }
    }
    result.getOrElse(throw lastErr)
  }
}
