package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Type-aware SQL literal formatting, generalized from the reference's
  * MyWindowFunction.formatValue (quote + escape string-ish types, raw
  * numerics, NULL for missing) — but as codegen'd Column expressions
  * that run distributed, instead of per-record driver string work.
  */
object SqlInsertFormatter {

  /** Literal-format one column according to its Spark type. */
  def literal(c: Column, dt: DataType): Column = {
    val formatted = dt match {
      case StringType =>
        concat(lit("'"), regexp_replace(regexp_replace(c, "\\\\", "\\\\\\\\"), "'", "\\\\'"), lit("'"))
      case TimestampType | TimestampNTZType =>
        concat(lit("'"), date_format(c, "yyyy-MM-dd HH:mm:ss"), lit("'"))
      case DateType =>
        concat(lit("'"), date_format(c, "yyyy-MM-dd"), lit("'"))
      case _: DecimalType | DoubleType | FloatType => c.cast(StringType)
      case _ => c.cast(StringType)
    }
    coalesce(formatted, lit("NULL"))
  }

  /** Per-row `(v1,v2,...)` tuple column for the given DataFrame. */
  def valuesTuple(df: DataFrame): Column = {
    val parts = df.schema.fields.map(f => literal(col(f.name), f.dataType))
    concat(lit("("), concat_ws(",", parts.toIndexedSeq: _*), lit(")"))
  }

  /** Batch the rows of `df` into multi-row INSERT statements of at most
    * `batchSize` rows per target-partition key. Output: one row per
    * statement, column `stmt`. Single shuffle on the batch key. */
  def insertStatements(df: DataFrame, table: String, keyExpr: Column, batchSize: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cols = df.columns.mkString(",")
    // materialize the key ONCE before the window shuffle: a
    // nondeterministic keyExpr (e.g. spark_partition_id) re-evaluated
    // after the exchange would merge batches across source partitions
    // and overflow the batchSize contract
    val keyed = df.withColumn("__tuple", valuesTuple(df)).withColumn("__key", keyExpr)
    val byKey = Window.partitionBy(col("__key")).orderBy(monotonically_increasing_id())
    keyed
      .withColumn("__rn", row_number().over(byKey))
      .withColumn("__batch", floor((col("__rn") - 1) / batchSize))
      .groupBy(col("__key"), col("__batch"))
      .agg(concat_ws(",", collect_list(col("__tuple"))).as("__vals"))
      .select(concat(lit(s"INSERT INTO $table ($cols) VALUES "), col("__vals")).as("stmt"))
  }
}
