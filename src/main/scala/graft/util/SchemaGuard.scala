package graft.util

import org.apache.spark.sql.types._

/** Output-type guard for oracle-compared results.
  *
  * The DuckDB oracle never emits DECIMAL for the arithmetic our queries do
  * (`BIGINT / 100.0` is DOUBLE there), but a bare `x / 100.0` inside a Spark
  * SQL string parses the literal as DecimalType and silently promotes the
  * whole column — rows and schema *names* still match, only the value hash
  * diverges. This class of bug recurred in three separate rounds
  * (q_llm_span_corruption r8, q15_top_supplier + q_window_range_interval r9),
  * so every registered query's output schema is now walked for DecimalType:
  * once in a spec over all entries, and again at Verify time as a hard fail.
  * Divide with `lit(100.0)` / `Exact.fix` instead of a SQL decimal literal.
  */
object SchemaGuard {
  /** Fully-qualified paths of every DecimalType leaf in the schema,
    * descending into structs, arrays, and maps. */
  def decimalColumns(schema: StructType): Seq[String] = {
    def walk(dt: DataType, path: String): Seq[String] = dt match {
      case _: DecimalType      => Seq(path)
      case s: StructType       => s.fields.flatMap(f => walk(f.dataType, s"$path.${f.name}")).toSeq
      case a: ArrayType        => walk(a.elementType, s"$path[]")
      case m: MapType          => walk(m.keyType, s"$path<key>") ++ walk(m.valueType, s"$path<val>")
      case _                   => Nil
    }
    schema.fields.flatMap(f => walk(f.dataType, f.name)).toSeq
  }

  /** Throws with a fix-it message if the schema carries any DecimalType. */
  def assertNoDecimal(name: String, schema: StructType): Unit = {
    val hits = decimalColumns(schema)
    if (hits.nonEmpty) throw new IllegalStateException(
      s"[decimal-guard] $name emits DecimalType column(s) ${hits.mkString(", ")} — " +
      "the DuckDB oracle emits DOUBLE for this arithmetic, so the value hash WILL " +
      "mismatch. Use Column-API division (lit(100.0)) or CAST(... AS DOUBLE) " +
      "instead of a bare decimal literal inside SQL strings.")
  }
}
