package graft.sinks

/** [[StatementWriter]] over plain JDBC — the seam's real
  * implementation (reference: ClickHouseSink executes its batched
  * INSERTs through a pooled JDBC connection). One connection per
  * `write` call (i.e. per retry-chunk on an executor); the statements
  * of a chunk run in a single transaction so a mid-chunk failure
  * rolls back and the retry replays a clean slate — Spark task retry
  * plus this transaction boundary is what makes the chunk the unit of
  * at-least-once delivery.
  *
  * Serializable by construction: only the URL and properties travel to
  * executors; connections are opened where the partition runs.
  */
class JdbcStatementWriter(
    url: String,
    props: Map[String, String] = Map.empty) extends StatementWriter {

  override def write(batchId: Long, statements: Iterator[String]): Unit = {
    val p = new java.util.Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    val conn = java.sql.DriverManager.getConnection(url, p)
    try {
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      try {
        statements.foreach(st.execute)
        conn.commit()
      } catch {
        case e: Throwable =>
          try conn.rollback()
          catch { case re: Throwable => e.addSuppressed(re) }
          throw e
      } finally st.close()
    } finally conn.close()
  }
}
