package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingestion adapter for the testdata lake: session prep + table loading.
  *
  * The `events` table stores `ts` as Parquet TIMESTAMP(NANOS), which Spark's
  * vectorized reader rejects; we read it as raw nanos
  * (`spark.sql.legacy.parquet.nanosAsLong`) and normalize to a micros
  * timestamp at ingest — the standard lakehouse pattern of normalizing
  * source precision at the boundary so every downstream operator sees a
  * native TimestampType column (codegen-friendly, prunable).
  */
object Tables {

  /** Session settings every query path needs; idempotent and cheap. */
  def prepare(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  /** Load `<dir>/<name>.parquet`, normalizing known nanos columns. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    prepare(spark)
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeNanos(df, "ts") else df
  }

  /** Replace a nanos-as-long column with a micros TimestampType column of
    * the same name, preserving column position. Floor division (not SQL
    * `div`, which truncates toward zero) so pre-epoch nanos round to the
    * earlier microsecond, agreeing with any floor-semantics oracle; integer
    * arithmetic throughout — nanos exceed 2^53, double division would lose
    * precision. */
  def normalizeNanos(df: DataFrame, colName: String): DataFrame =
    if (df.schema.fieldNames.contains(colName) &&
        df.schema(colName).dataType == org.apache.spark.sql.types.LongType)
      df.withColumn(colName, timestamp_micros(expr(
        s"($colName div 1000) + (CASE WHEN $colName % 1000 < 0 THEN -1 ELSE 0 END)")))
    else df
}
