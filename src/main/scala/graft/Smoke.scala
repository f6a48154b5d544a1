package graft

import org.apache.spark.sql.SparkSession

/** Dev smoke runner: executes SparkEntry.entry exactly as the driver's t1
  * check does and prints the row count + result. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    df.show(30, truncate = false)
    println(s"[smoke] rows=${df.count()}")
    spark.stop()
  }
}
