package graft

import graft.util.SchemaGuard
import org.apache.spark.sql.types._

/** The no-DecimalType output gate over EVERY registered entry.
  *
  * Three rounds in a row a single `x / 100.0` decimal literal inside a SQL
  * string turned one query's output DECIMAL while the DuckDB oracle stayed
  * DOUBLE — rows green, schema-names green, value hash red. Building each
  * entry's DataFrame at sf0.001 and walking its schema catches the class at
  * `sbt test` time instead of in the driver's correctness artifact.
  *
  * Only `.schema` is forced (analysis, not execution); entries whose
  * CONSTRUCTION is eager (streaming ticks, incremental stores) still run,
  * which is why this spec uses the smallest fixture.
  */
class SchemaGuardSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("decimalColumns walks structs, arrays, and maps") {
    val nested = StructType(Seq(
      StructField("ok", DoubleType),
      StructField("d", DecimalType(28, 7)),
      StructField("s", StructType(Seq(StructField("inner", DecimalType(10, 2))))),
      StructField("a", ArrayType(DecimalType(5, 1))),
      StructField("m", MapType(StringType, DecimalType(3, 0)))))
    assert(SchemaGuard.decimalColumns(nested) ===
      Seq("d", "s.inner", "a[]", "m<val>"))
    assert(SchemaGuard.decimalColumns(StructType(Seq(StructField("x", DoubleType)))).isEmpty)
  }

  test("no registered entry emits a DecimalType output column") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val hits =
        try SchemaGuard.decimalColumns(fn(spark, dir).schema)
        catch { case e: Throwable => Seq(s"<failed to build: ${e.getMessage}>") }
      if (hits.isEmpty) Nil else Seq(s"$name -> ${hits.mkString(", ")}")
    }
    assert(offenders.isEmpty,
      s"DecimalType output (oracle emits DOUBLE — divide via lit(...)/CAST AS DOUBLE):\n" +
        offenders.mkString("\n"))
  }
}
