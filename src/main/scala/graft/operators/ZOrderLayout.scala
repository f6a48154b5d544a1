package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge

import graft.functions.{InterleaveBits, QuantileBinSearch}

/** Z-order clustered parquet layout with a min/max file-skipping manifest
  * — the lakehouse OPTIMIZE ZORDER pattern, self-contained.
  *
  * WRITE: each clustering column is binned to an equi-depth rank (bounded
  * driver-side approx-quantile cuts -> codegen'd binary search), ranks are
  * bit-interleaved MSB-first into a Morton code (codegen'd), and the data
  * is range-partitioned + sorted by that code, so every output file covers
  * a tight box in clustering space. A manifest of per-file min/max per
  * clustering column is computed in the same pass (one aggregation over
  * `input_file_name()`) and written beside the data.
  *
  * READ: `readBox` intersects the predicate box with the manifest and
  * plans a scan over ONLY the intersecting files, then re-applies the
  * exact predicate. Rows are never lost (the manifest bounds are exact
  * per-file aggregates); what is saved is opening the 90+% of files whose
  * boxes miss the predicate. Vanilla Spark cannot skip FILES by
  * column stats (parquet row-group pruning happens after the file is
  * opened); this manifest is the missing index — the same idea as Delta
  * Lake's add-file stats, expressed over plain parquet.
  *
  * At 100 TB: the write is one extra range shuffle at ingest; the
  * manifest is O(files), driver-readable; multi-dimensional slices read
  * a few percent of the files instead of all of them.
  */
object ZOrderLayout {

  private val ManifestName = "_ZORDER_MANIFEST.json"

  /** Morton code column over equi-depth ranks of `cols` (all cast to
    * double). `bitsPer` bounds cut-array size; cols.size * bitsPer <= 63. */
  def zcode(df: DataFrame, cols: Seq[String], bitsPer: Int = 12): Column = {
    require(cols.nonEmpty && cols.size * bitsPer <= 63,
      s"need 1..${63 / bitsPer} clustering columns at $bitsPer bits")
    val nCuts = (1 << bitsPer) - 1
    val probs = (1 to nCuts).map(_.toDouble / (nCuts + 1)).toArray
    val cuts = df.stat.approxQuantile(cols.toArray, probs, 0.001)
    val ranks = cols.zip(cuts).map { case (c, cut) =>
      bridge.column(QuantileBinSearch(
        bridge.expression(coalesce(col(c).cast("double"), lit(Double.MinValue))),
        cut.sorted))
    }
    bridge.column(InterleaveBits(
      bridge.expression(array(ranks: _*)), bridge.expression(lit(bitsPer))))
  }

  /** Write `df` z-ordered by `cols` into `nFiles` parquet files plus the
    * skipping manifest. */
  def write(df: DataFrame, cols: Seq[String], path: String, nFiles: Int,
      bitsPer: Int = 12): Unit = {
    require(nFiles >= 1)
    val z = zcode(df, cols, bitsPer)
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
    val spark = df.sparkSession
    val written = spark.read.parquet(path)
    val aggs = cols.flatMap { c =>
      Seq(min(col(c)).cast("double").as(s"min_$c"),
        max(col(c)).cast("double").as(s"max_$c"))
    }
    val stats = written.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    val sb = new StringBuilder("[")
    stats.zipWithIndex.foreach { case (r, i) =>
      if (i > 0) sb.append(',')
      sb.append(s"""{"file":"${r.getString(0)}"""")
      cols.foreach { c =>
        sb.append(s""","min_$c":${r.getAs[Double](s"min_$c")}""")
        sb.append(s""","max_$c":${r.getAs[Double](s"max_$c")}""")
      }
      sb.append('}')
    }
    sb.append(']')
    val p = new org.apache.hadoop.fs.Path(path, ManifestName)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    out.write(sb.toString.getBytes("UTF-8"))
    out.close()
  }

  /** Files whose manifest box intersects the predicate box. Bounds are
    * inclusive; a column absent from `bounds` is unconstrained. */
  def filesFor(spark: SparkSession, path: String,
      bounds: Map[String, (Double, Double)]): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path, ManifestName)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(p)
    val json = new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
    in.close()
    // manifest is engine-written, schema-fixed: parse with the same
    // minimal quoting rules Verify uses for emission
    val entries = json.stripPrefix("[").stripSuffix("]").split("\\},\\{").toSeq
      .filter(_.nonEmpty)
    entries.flatMap { e =>
      val body = e.stripPrefix("{").stripSuffix("}")
      val fields = body.split(",(?=\")").map { kv =>
        val Array(k, v) = kv.split(":", 2)
        k.replaceAll("\"", "") -> v.replaceAll("\"", "")
      }.toMap
      val keep = bounds.forall { case (c, (lo, hi)) =>
        require(fields.contains(s"min_$c"),
          s"column '$c' is not in this layout's manifest (clustered " +
            s"columns: ${fields.keys.filter(_.startsWith("min_"))
              .map(_.stripPrefix("min_")).mkString(", ")}) — " +
            "only clustering columns can drive file skipping")
        val mn = fields(s"min_$c").toDouble
        val mx = fields(s"max_$c").toDouble
        mx >= lo && mn <= hi
      }
      if (keep) Some(fields("file")) else None
    }
  }

  /** Scan only the manifest-selected files, then re-apply the exact
    * inclusive box predicate (skipping is a superset selection — the
    * predicate stays authoritative). */
  def readBox(spark: SparkSession, path: String,
      bounds: Map[String, (Double, Double)]): DataFrame = {
    val files = filesFor(spark, path, bounds)
    val df =
      if (files.isEmpty) {
        spark.read.parquet(path).limit(0)
      } else spark.read.parquet(files: _*)
    bounds.foldLeft(df) { case (acc, (c, (lo, hi))) =>
      acc.filter(col(c).cast("double") >= lo && col(c).cast("double") <= hi)
    }
  }
}
