package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Regenerate the `docs/plans` physical-plan snapshots.
  *
  * Usage: `runMain graft.PlanSnapshot <sfDir> <outDir> <name>[,<name>...]`.
  * The snapshots document the plan each headline operator is EXPECTED to
  * produce (pushed filters, codegen spans, exchange count) so a plan
  * regression is reviewable as a diff, not just a bench delta.
  */
object PlanSnapshot {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, names) = args
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.split(',').foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      Files.writeString(Paths.get(s"$outDir/$name.txt"),
        df.queryExecution.explainString(ExplainMode.fromString("formatted")))
      println(s"[plan] wrote $outDir/$name.txt")
    }
    spark.stop()
  }
}
