package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev smoke tool: runs SparkEntry.entry (the driver's t1 check) and shows
  * the result; with arg "explain <name> <sfDir>", prints a query's plan. */
object Probe {
  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled","false")
      .config("spark.sql.shuffle.partitions","8")
    graft.sources.Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.toList match {
      case "explain" :: name :: dir :: Nil =>
        graft.SparkEntry.queries(name)(spark, dir).explain("formatted")
      case _ =>
        val df = graft.SparkEntry.entry(spark)
        println("ENTRY rows=" + df.count())
        df.show(20, false)
    }
    spark.stop()
  }
}
