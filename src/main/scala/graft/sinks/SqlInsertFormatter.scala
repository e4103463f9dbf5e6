package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Type-aware SQL literal formatting, generalized from the reference's
  * MyWindowFunction.formatValue (quote + escape string-ish types, raw
  * numerics, NULL for missing) — but as codegen'd Column expressions
  * that run distributed, instead of per-record driver string work.
  *
  * Two sources of type truth, mirroring the reference: the TARGET
  * table's declared column types (MyWindowFunction looks them up from
  * `system.columns`) decide quoting when supplied via `targetTypes`;
  * the DataFrame schema is the fallback. A string df-column bound to a
  * numeric target column is emitted raw/unquoted, and a numeric
  * df-column bound to a String target is quoted — exactly the
  * reference's behavior.
  *
  * See [[SqlDialect]] for the escaping rules of the target engine;
  * defaults everywhere are ClickHouse-like (the reference's sink).
  */

/** Literal-escaping dialect of the target SQL engine. */
sealed trait SqlDialect
object SqlDialect {
  /** Backslash escapes incl. control characters — ClickHouse/MySQL
    * string-literal rules (the reference's target). */
  case object ClickHouseLike extends SqlDialect
  /** Standard SQL: the single quote doubles; backslash and newlines are
    * ordinary characters inside a string literal (Derby/Postgres
    * standard-conforming strings). */
  case object Ansi extends SqlDialect
}

object SqlInsertFormatter {

  /** Escape a string Column for single-quoted SQL literals per the
    * target dialect — ClickHouse-like: backslash escapes + the control
    * characters NUL/\n/\r/\t (raw control bytes would break statement
    * text there); ANSI: only the quote doubles, everything else is
    * legal inside the literal. */
  private def escaped(c: Column, dialect: SqlDialect): Column = dialect match {
    case SqlDialect.Ansi =>
      regexp_replace(c, "'", "''")
    case SqlDialect.ClickHouseLike =>
      val steps: Seq[(String, String)] = Seq(
        "\\\\" -> "\\\\\\\\", // backslash first, it's the escape char
        "'" -> "\\\\'",
        "\u0000" -> "\\\\0",
        "\n" -> "\\\\n",
        "\r" -> "\\\\r",
        "\t" -> "\\\\t")
      steps.foldLeft(c) { case (acc, (from, to)) => regexp_replace(acc, from, to) }
  }

  private def quoted(c: Column, dialect: SqlDialect): Column =
    concat(lit("'"), escaped(c, dialect), lit("'"))

  /** Render the column as text per its DataFrame type (timestamps and
    * dates in the reference's wall-clock formats), without quoting. */
  private def rendered(c: Column, dt: DataType): Column = dt match {
    case TimestampType | TimestampNTZType => date_format(c, "yyyy-MM-dd HH:mm:ss")
    case DateType => date_format(c, "yyyy-MM-dd")
    case _ => c.cast(StringType)
  }

  /** Literal-format one column according to its Spark type. */
  def literal(c: Column, dt: DataType,
      dialect: SqlDialect = SqlDialect.ClickHouseLike): Column = {
    val formatted = dt match {
      case StringType | TimestampType | TimestampNTZType | DateType =>
        quoted(rendered(c, dt), dialect)
      case at: ArrayType =>
        // schema-driven array literal: element rules from the element type
        val elemDeclared = at.elementType match {
          case StringType | TimestampType | TimestampNTZType | DateType => "String"
          case _ => "Int64"
        }
        arrayLiteral(c, at, elemDeclared, dialect)
      case _ => rendered(c, dt)
    }
    coalesce(formatted, lit("NULL"))
  }

  /** Strip ClickHouse transparent wrappers — `Nullable(T)` /
    * `LowCardinality(T)` (in any nesting order) → `T`. What a real
    * `system.columns` reports is almost always wrapped; literal rules
    * follow the inner type. */
  private[graft] def unwrap(declared: String): String = {
    var t = declared.trim
    var changed = true
    while (changed) {
      changed = false
      for (w <- Seq("Nullable(", "LowCardinality(")) {
        if (t.startsWith(w) && t.endsWith(")")) {
          t = t.substring(w.length, t.length - 1).trim
          changed = true
        }
      }
    }
    t
  }

  /** `Array(T)` → Some(T) (unwrapped element type), None otherwise. */
  private[graft] def arrayElementType(declared: String): Option[String] = {
    val t = unwrap(declared)
    if (t.startsWith("Array(") && t.endsWith(")"))
      Some(unwrap(t.substring("Array(".length, t.length - 1)))
    else None
  }

  /** `DateTime64(p[, 'tz'])` → Some(p) clamped to [0, 6] (Spark's
    * date_format fraction ceiling — ClickHouse allows up to 9). */
  private[graft] def dateTime64Precision(declared: String): Option[Int] = {
    val t = unwrap(declared)
    if (!t.startsWith("DateTime64")) None
    else "[0-9]+".r.findFirstIn(t.stripPrefix("DateTime64"))
      .map(_.toInt.min(6).max(0)).orElse(Some(3)) // CH default precision 3
  }

  /** True when a declared target type takes a quoted literal.
    * ClickHouse wrappers (Nullable, LowCardinality) are stripped
    * first; both ClickHouse names (`String`, `DateTime`) and ANSI DDL
    * text as a catalog reports it (`VARCHAR(40) NOT NULL`,
    * `TIMESTAMP` — what [[JdbcCatalogTypes.derby]] returns) are
    * understood, so a queried type map drops straight in. */
  private[graft] def targetIsQuoted(declared: String): Boolean = {
    val t = unwrap(declared)
    val ch = Seq("String", "FixedString", "UUID", "Enum", "IPv4", "IPv6",
      "Date", "DateTime").exists(t.startsWith)
    val up = t.toUpperCase(java.util.Locale.ROOT)
    val ansi = Seq("VARCHAR", "CHAR", "CLOB", "LONG VARCHAR", "DATE", "TIME", "TIMESTAMP")
      .exists(up.startsWith)
    ch || ansi
  }

  /** True when the DataFrame type's rendered text can't contain SQL
    * metacharacters by construction — safe to emit raw. */
  private def rendersNumericSafe(dt: DataType): Boolean = dt match {
    case _: NumericType | BooleanType => true
    case _ => false
  }

  /** Numeric-literal shape accepted on the unquoted emission path. */
  private[sinks] val NumericLiteral = "^-?[0-9]+(\\.[0-9]+)?([eE][+-]?[0-9]+)?$"

  /** ClickHouse array literal `['a','b',...]` from an ArrayType
    * DataFrame column: elements are formatted per the declared element
    * type (quoted+escaped string-ish, numeric-shape-checked raw
    * otherwise — the same splice-safety contract as scalars), NULL
    * elements render as NULL inside the brackets. */
  private def arrayLiteral(c: Column, dt: ArrayType, elemDeclared: String,
      dialect: SqlDialect): Column = {
    val elems = transform(c, e => {
      val text = rendered(e, dt.elementType)
      val f =
        if (targetIsQuoted(elemDeclared)) quoted(text, dialect)
        else if (rendersNumericSafe(dt.elementType)) text
        else when(text.rlike(NumericLiteral), text)
      coalesce(f, lit("NULL"))
    })
    concat(lit("["), concat_ws(",", elems), lit("]"))
  }

  /** Literal-format driven by the TARGET column's declared type; the
    * DataFrame type only controls rendering (timestamp formats).
    *
    * `Nullable(T)`/`LowCardinality(T)` unwrap to T; `DateTime64(p)`
    * renders p fractional-second digits; `Array(T)` takes an array
    * literal with per-element T rules (a non-array DataFrame column
    * bound to an Array target degrades to NULL — malformed shape, the
    * reference's missing-field contract).
    *
    * The unquoted (numeric-target) path never emits raw text straight
    * from a string-typed DataFrame column: a value like `1),(999` or
    * `1; DROP ...` would splice into the statement, since the quoting
    * escapes are bypassed here by design. Non-numeric-shaped values
    * become NULL — the same "malformed value degrades to NULL" contract
    * the reference applies to missing fields. */
  def literalForTarget(c: Column, dt: DataType, declaredTargetType: String,
      dialect: SqlDialect = SqlDialect.ClickHouseLike): Column = {
    (arrayElementType(declaredTargetType), dt) match {
      case (Some(elemT), at: ArrayType) =>
        coalesce(arrayLiteral(c, at, elemT, dialect), lit("NULL"))
      case (Some(_), _) => lit("NULL") // array target, scalar column: malformed
      case (None, _) =>
        val text = dateTime64Precision(declaredTargetType) match {
          case Some(p) if p > 0 && Seq(TimestampType, TimestampNTZType).contains(dt) =>
            date_format(c, "yyyy-MM-dd HH:mm:ss." + "S" * p)
          case _ => rendered(c, dt)
        }
        val formatted =
          if (targetIsQuoted(declaredTargetType)) quoted(text, dialect)
          else if (rendersNumericSafe(dt)) text
          else when(text.rlike(NumericLiteral), text) // else null → NULL below
        coalesce(formatted, lit("NULL"))
    }
  }

  /** Per-row `(v1,v2,...)` tuple column for the given DataFrame.
    * `targetTypes` maps column name → declared sink type; columns
    * absent from the map fall back to DataFrame-schema formatting. */
  def valuesTuple(df: DataFrame, targetTypes: Map[String, String] = Map.empty,
      dialect: SqlDialect = SqlDialect.ClickHouseLike): Column = {
    val parts = df.schema.fields.map { f =>
      targetTypes.get(f.name) match {
        case Some(t) => literalForTarget(col(f.name), f.dataType, t, dialect)
        case None => literal(col(f.name), f.dataType, dialect)
      }
    }
    concat(lit("("), concat_ws(",", parts.toIndexedSeq: _*), lit(")"))
  }

  /** Batch the rows of `df` into multi-row INSERT statements of at most
    * `batchSize` rows per target-partition key. Output: one row per
    * statement, column `stmt`. Single shuffle on the batch key. */
  def insertStatements(df: DataFrame, table: String, keyExpr: Column, batchSize: Int,
      targetTypes: Map[String, String] = Map.empty,
      dialect: SqlDialect = SqlDialect.ClickHouseLike): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cols = df.columns.mkString(",")
    // materialize the key ONCE before the window shuffle: a
    // nondeterministic keyExpr (e.g. spark_partition_id) re-evaluated
    // after the exchange would merge batches across source partitions
    // and overflow the batchSize contract
    val keyed = df.withColumn("__tuple", valuesTuple(df, targetTypes, dialect))
      .withColumn("__key", keyExpr)
    val byKey = Window.partitionBy(col("__key")).orderBy(monotonically_increasing_id())
    keyed
      .withColumn("__rn", row_number().over(byKey))
      .withColumn("__batch", floor((col("__rn") - 1) / batchSize))
      .groupBy(col("__key"), col("__batch"))
      .agg(concat_ws(",", collect_list(col("__tuple"))).as("__vals"))
      .select(concat(lit(s"INSERT INTO $table ($cols) VALUES "), col("__vals")).as("stmt"))
  }
}
