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
  * a tight box in clustering space. The manifest of per-file min/max per
  * clustering column comes from the PARQUET FOOTER STATISTICS of the
  * just-written files — the same metadata source Delta's add-file stats
  * use: a driver-side O(files) footer read, NEVER a second scan over the
  * data (r7 read the table back through a groupBy(input_file_name())
  * aggregation — a full extra pass at ingest; ZOrderSpec now pins the
  * records-read budget so the re-scan cannot come back). A file whose
  * column chunk has no non-null values (or a non-numeric physical type)
  * gets NO bounds entry and is treated as always-intersecting — missing
  * stats can only cost skipping, never rows.
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

  /** Per-file [min, max] of `colName` from the file's parquet footer:
    * minimum/maximum over the row groups whose statistics carry non-null
    * values. None when no row group has stats for the column (all-null
    * file, or a physical type the footer can't bound numerically) — the
    * caller records no bounds and the file is never skipped. Metadata
    * only: reads the footer, not a single data page. */
  private def footerBounds(conf: org.apache.hadoop.conf.Configuration,
      file: org.apache.hadoop.fs.Path, colName: String): Option[(Double, Double)] = {
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf))
    try {
      var lo = Double.PositiveInfinity
      var hi = Double.NegativeInfinity
      var seen = false
      reader.getFooter.getBlocks.forEach { block =>
        block.getColumns.forEach { chunk =>
          if (chunk.getPath.toDotString == colName) {
            val stats = chunk.getStatistics
            if (stats != null && stats.hasNonNullValue) {
              (stats.genericGetMin, stats.genericGetMax) match {
                case (mn: java.lang.Number, mx: java.lang.Number) =>
                  lo = math.min(lo, mn.doubleValue)
                  hi = math.max(hi, mx.doubleValue)
                  seen = true
                case _ => // non-numeric physical type: no usable bounds
              }
            }
          }
        }
      }
      if (seen) Some((lo, hi)) else None
    } finally reader.close()
  }

  /** Inner text of the `"key":[ ... ]` array in the engine-written
    * manifest (entries never contain ']'); None when the key is absent
    * (manifests written before the field existed). */
  private def arraySection(json: String, key: String): Option[String] = {
    val marker = s""""$key":["""
    val i = json.indexOf(marker)
    if (i < 0) None
    else {
      val start = i + marker.length
      Some(json.substring(start, json.indexOf(']', start)))
    }
  }

  /** One manifest entry per data file: the file path plus footer-derived
    * min/max per clustering column (absent when the footer has no usable
    * stats — such a file is never skipped).
    *
    * Footers are read in PARALLEL (a parallel collection over the file
    * list — each read is independent metadata I/O), so the manifest pass
    * scales with driver cores, not file count: a serial loop at 100k
    * files is minutes of single-threaded driver wall per write/append
    * for work that is embarrassingly parallel. `par.map` preserves input
    * order, so the manifest entry order (and any hash over it) is
    * byte-identical to the serial formulation. */
  private def fileEntries(conf: org.apache.hadoop.conf.Configuration,
      cols: Seq[String],
      files: Seq[org.apache.hadoop.fs.Path]): Seq[String] = {
    import scala.collection.parallel.CollectionConverters._
    files.par.map { f =>
      val sb = new StringBuilder(s"""{"file":"${f.toString}"""")
      cols.foreach { c =>
        footerBounds(conf, f, c).foreach { case (lo, hi) =>
          sb.append(s""","min_$c":$lo""")
          sb.append(s""","max_$c":$hi""")
        }
      }
      sb.append('}')
      sb.toString
    }.seq
  }

  private def writeManifest(fs: org.apache.hadoop.fs.FileSystem, path: String,
      cols: Seq[String], entries: Seq[String], applied: Seq[String],
      excised: Seq[String] = Nil, tombstoneCol: Option[String] = None): Unit = {
    val json = "{\"cols\":[" + cols.map(c => s""""$c"""").mkString(",") +
      "],\"files\":[" + entries.mkString(",") +
      "],\"applied\":[" + applied.map(t => s""""$t"""").mkString(",") +
      "],\"excised\":[" + excised.map(t => s""""$t"""").mkString(",") +
      "],\"tombstone_col\":[" +
      tombstoneCol.map(c => s""""$c"""").getOrElse("") + "]}"
    val p = new org.apache.hadoop.fs.Path(path, ManifestName)
    val out = fs.create(p, true)
    out.write(json.getBytes("UTF-8"))
    out.close()
  }

  /** Parse a string-array ledger section ("applied"/"excised"/
    * "tombstone_col") out of the engine-written manifest. */
  private def ledgerSection(json: String, key: String): Seq[String] =
    arraySection(json, key).toSeq
      .flatMap(_.split(",")).map(_.replaceAll("\"", "")).filter(_.nonEmpty)

  /** The manifest's file-entry objects, re-braced after the "},{"-split
    * round-trip — THE one parse shared by append/excise/compact so the
    * entry format can never silently diverge between maintenance
    * paths. */
  private def filesSection(json: String): Seq[String] =
    arraySection(json, "files").getOrElse("")
      .split("\\},\\{").filter(_.nonEmpty)
      .map(e => if (e.startsWith("{")) e else "{" + e)
      .map(e => if (e.endsWith("}")) e else e + "}").toSeq

  /** Directory holding one excise batch's tombstoned ids: a hidden
    * (underscore-prefixed, so every data-path read ignores it) subdir
    * keyed by a digest of the ledger tag — digesting sidesteps filesystem
    * charset/length limits without constraining tags beyond appendTo's
    * rules. */
  private def tombstoneDir(path: String, tag: String): String = {
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(tag.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    s"$path/_ZORDER_TOMBSTONES/$digest"
  }

  /** The pending tombstoned-id set of a layout: the union of every
    * LEDGERED excise batch whose tombstone directory still exists (a
    * compact folds the physical drop in and removes the data, keeping
    * the ledger for replay idempotence; an orphan directory whose tag
    * never committed to the ledger is invisible — the manifest is the
    * commit point, exactly as for appendTo's data files). None when no
    * tombstones are pending. */
  private def pendingTombstones(spark: SparkSession, path: String,
      json: String): Option[(String, DataFrame)] = {
    val col = ledgerSection(json, "tombstone_col").headOption.getOrElse(
      return None)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val dirs = ledgerSection(json, "excised")
      .map(tombstoneDir(path, _))
      .filter(d => fs.exists(new org.apache.hadoop.fs.Path(d)))
    if (dirs.isEmpty) None
    else Some((col, spark.read.parquet(dirs: _*)))
  }

  private def readManifestJson(fs: org.apache.hadoop.fs.FileSystem,
      path: String): String = {
    val in = fs.open(new org.apache.hadoop.fs.Path(path, ManifestName))
    try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
    finally in.close()
  }

  private def zWrite(df: DataFrame, cols: Seq[String], path: String,
      nFiles: Int, bitsPer: Int, mode: String): Unit = {
    val z = zcode(df, cols, bitsPer)
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(mode).parquet(path)
  }

  /** Write `df` z-ordered by `cols` into `nFiles` parquet files plus the
    * skipping manifest (footer-derived — no second pass over the data). */
  def write(df: DataFrame, cols: Seq[String], path: String, nFiles: Int,
      bitsPer: Int = 12): Unit = {
    require(nFiles >= 1)
    // rebuild IS the crash recovery: drop any lease a dead maintainer left
    WriterLease.clear(df.sparkSession, path)
    zWrite(df, cols, path, nFiles, bitsPer, "overwrite")
    val spark = df.sparkSession
    val conf = spark.sessionState.newHadoopConf()
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(conf)
    val dataFiles = fs.listStatus(dir).map(_.getPath)
      .filter(_.getName.startsWith("part-")).sortBy(_.toString).toSeq
    writeManifest(fs, path, cols, fileEntries(conf, cols, dataFiles), Nil)
  }

  /** Incrementally extend a written layout with new rows — the OPTIMIZE
    * ZORDER append path: new rows are z-clustered among THEMSELVES (their
    * own equi-depth cuts; per-file min/max stays exact regardless of
    * binning, so skipping never loses rows — only the new files' box
    * tightness depends on the batch) and written as additional files whose
    * footer stats extend the manifest. No existing file is read or
    * rewritten.
    *
    * Idempotent under retry via the applied-source ledger: `sourceTag`
    * names the ingested batch; a tag already in the manifest makes the
    * call a NO-OP (returns false) instead of silently duplicating rows —
    * the crashed-job-retry failure the index appends close the same way.
    * The MANIFEST update is the commit point: a crash after the data
    * write but before it leaves orphan part-files that no manifest entry
    * references, which manifest-driven reads ([[filesFor]]/[[readBox]])
    * never see; the retry then appends a complete fresh set. */
  def appendTo(df: DataFrame, path: String, nFiles: Int, sourceTag: String,
      bitsPer: Int = 12): Boolean = {
    require(nFiles >= 1)
    // ',' is forbidden because the applied ledger is read back by
    // splitting the JSON array text on ',' — a comma-bearing tag would be
    // written as one entry but parsed as two, so a retry with the same
    // tag would NOT be recognized as applied and would duplicate the batch
    require(sourceTag.nonEmpty &&
      !sourceTag.exists(c => c == '"' || c == ']' || c == ',' || c == '{' || c == '}'),
      s"sourceTag must be non-empty without any of \" ] , {{ }}: $sourceTag")
    val spark = df.sparkSession
    // one maintainer at a time (the index-family writer contract): an
    // append reads the manifest, spends minutes in the clustered write,
    // then rewrites the manifest from its stale read — a concurrent
    // excise or second append committing inside that window would be
    // silently lost-updated out of the ledger (a committed TAKEDOWN
    // resurfacing is the worst case)
    WriterLease.withLease(spark, path) {
    val conf = spark.sessionState.newHadoopConf()
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(conf)
    val json = readManifestJson(fs, path)
    val applied = ledgerSection(json, "applied")
    if (applied.contains(sourceTag)) return false
    val cols = ledgerSection(json, "cols")
    val oldEntries = filesSection(json)
    val before = fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.startsWith("part-")).toSet
    zWrite(df, cols, path, nFiles, bitsPer, "append")
    val added = fs.listStatus(dir).map(_.getPath)
      .filter(p => p.getName.startsWith("part-") && !before(p.getName))
      .sortBy(_.toString).toSeq
    writeManifest(fs, path, cols, oldEntries ++ fileEntries(conf, cols, added),
      applied :+ sourceTag,
      // carry the takedown state: dropping the excise ledger here would
      // un-tombstone every pending takedown on the next daily append
      ledgerSection(json, "excised"),
      ledgerSection(json, "tombstone_col").headOption)
    true
    }
  }

  /** DELETE rows from a written layout — the takedown path that completes
    * write → append → compact with the lifecycle step every other
    * appendable durable artifact in the engine already has: `ids` (one
    * column, `idCol`) names the rows to remove; they are TOMBSTONED — a
    * metadata-sized parquet write of the id list under a hidden subdir
    * plus a manifest ledger entry, NEVER a rewrite of the clustered data
    * files — and [[readBox]] anti-joins the pending tombstones after file
    * pruning, so serving honors the takedown immediately. The physical
    * drop folds into the next [[compact]] (which reads through the same
    * anti-join), after which the tombstone data is gone and the box scan
    * pays nothing.
    *
    * Idempotent under retry via the excised-source ledger (same contract
    * as [[appendTo]]'s applied ledger): a `sourceTag` already ledgered
    * no-ops (returns false) instead of re-staging. The MANIFEST rewrite
    * is the commit point — a crash after the tombstone write but before
    * it leaves an orphan directory no ledger names, which
    * [[pendingTombstones]] never reads; the retry overwrites it and
    * commits. Excising an id absent from the layout is a harmless
    * no-op row-wise (the anti-join matches nothing). Every excise of a
    * layout must use the SAME `idCol` — enforced against the manifest
    * AND against the layout's own schema before the commit point (a
    * mistyped column would otherwise brick every later read with no
    * repair path, since the identity pin refuses the correction) —
    * because one layout has one row identity.
    *
    * TAKEDOWN-BY-ID contract, stated precisely: a tombstoned id is
    * suppressed from serving — including rows for it APPENDED after the
    * excise — until the next [[compact]] folds the drop in physically
    * and clears the tombstone data (the ledger stays, so the tag
    * replays as a no-op). Re-ingesting the same id after that fold
    * serves again: ids are not banned forever (gate re-ingestion with
    * the blocklist operators if the takedown must outlive the
    * artifact's own maintenance cycle). */
  def excise(spark: SparkSession, path: String, ids: DataFrame,
      idCol: String, sourceTag: String): Boolean = {
    require(sourceTag.nonEmpty &&
      !sourceTag.exists(c => c == '"' || c == ']' || c == ',' || c == '{' || c == '}'),
      s"sourceTag must be non-empty without any of \" ] , {{ }}: $sourceTag")
    // same fencing as appendTo: the read-manifest -> write-manifest
    // window must not interleave with another maintainer's
    WriterLease.withLease(spark, path) {
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val json = readManifestJson(fs, path)
    val excised = ledgerSection(json, "excised")
    if (excised.contains(sourceTag)) return false // already applied: no-op
    ledgerSection(json, "tombstone_col").headOption.foreach { prior =>
      require(prior == idCol,
        s"layout at $path is tombstoned by '$prior'; an excise by " +
          s"'$idCol' would leave two irreconcilable row identities")
    }
    // schema proof BEFORE the commit point: one footer read of one
    // manifest file — a column the layout doesn't have would commit a
    // ledger entry every later readBox/compact fails on
    filesSection(json).headOption.foreach { entry =>
      val f = entry.split(",(?=\")").head
        .stripPrefix("{").split(":", 2)(1).replaceAll("\"", "")
      val schema = spark.read.parquet(f).schema
      require(schema.fieldNames.contains(idCol),
        s"layout at $path has no column '$idCol' (columns: " +
          s"${schema.fieldNames.mkString(", ")}) — an excise by it " +
          "would brick every later read")
    }
    // tombstone data first (overwrite — a crashed attempt's orphan is
    // replaced), manifest ledger LAST as the commit point
    ids.select(idCol).distinct()
      .write.mode("overwrite").parquet(tombstoneDir(path, sourceTag))
    writeManifest(fs, path,
      ledgerSection(json, "cols"), filesSection(json),
      ledgerSection(json, "applied"),
      excised :+ sourceTag, Some(idCol))
    true
    }
  }

  /** Rewrite a fragmented layout as ONE fresh z-ordered table — the
    * OPTIMIZE step after many [[appendTo]] batches: each append z-clusters
    * only among ITSELF, so over time the table accumulates small files
    * with overlapping boxes and `readBox` prunes less and less; compact
    * re-bins and re-sorts EVERYTHING under corpus-wide equi-depth cuts,
    * restoring tight per-file boxes. Staged like the index retrains: the
    * fresh layout (data + manifest) lands in a staging dir while the live
    * table keeps serving manifest reads, then delete + rename swaps it in;
    * the applied-source ledger is CARRIED OVER so a late retry of any
    * pre-compact batch is still a no-op. A crash between delete and
    * rename leaves no manifest at `path` (detected — and staging still
    * holds the complete rewrite). */
  def compact(spark: SparkSession, path: String, nFiles: Int,
      bitsPer: Int = 12): Unit = {
    require(nFiles >= 1)
    // same fencing as appendTo/excise: a compact swapping the directory
    // out from under a concurrent maintainer is the canonical disaster
    WriterLease.withLease(spark, path) {
    val conf = spark.sessionState.newHadoopConf()
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(conf)
    val json = readManifestJson(fs, path)
    val cols = ledgerSection(json, "cols")
    val applied = ledgerSection(json, "applied")
    val excised = ledgerSection(json, "excised")
    val tombCol = ledgerSection(json, "tombstone_col").headOption
    // read through the MANIFEST's file list (not a bare dir listing), so
    // orphan part-files from a crashed append stay invisible here too
    val files = filesForJson(json, Map.empty)
    require(files.nonEmpty, s"nothing to compact at $path")
    // fold any pending takedowns into the rewrite: the same anti-join
    // readBox serves through, so a compacted layout physically holds
    // exactly what the tombstoned layout was serving
    val survivors = pendingTombstones(spark, path, json) match {
      case Some((c, tombs)) =>
        spark.read.parquet(files: _*).join(tombs, Seq(c), "left_anti")
      case None => spark.read.parquet(files: _*)
    }
    val staging = s"$path.compact"
    fs.delete(new org.apache.hadoop.fs.Path(staging), true)
    write(survivors, cols, staging, nFiles, bitsPer)
    if (applied.nonEmpty || excised.nonEmpty) {
      // carry BOTH ledgers into the fresh manifest (a late retry of any
      // pre-compact append OR excise batch must still no-op); the
      // tombstone DATA is gone with the old directory — the drop is now
      // physical — so the carried excise ledger has nothing pending
      val sJson = readManifestJson(fs, staging)
      writeManifest(fs, staging, cols, filesSection(sJson), applied,
        excised, tombCol)
    }
    fs.delete(dir, true)
    require(fs.rename(new org.apache.hadoop.fs.Path(staging), dir),
      s"rename $staging -> $path failed")
    // the manifest's file entries were recorded under the staging dir —
    // rewrite them to the final location (file names are unchanged by the
    // rename, only the directory component moves)
    val moved = readManifestJson(fs, path)
      .replace(s"/${dir.getName}.compact/", s"/${dir.getName}/")
    val mp = new org.apache.hadoop.fs.Path(path, ManifestName)
    val out = fs.create(mp, true)
    out.write(moved.getBytes("UTF-8"))
    out.close()
    }
  }

  /** Re-home a byte-copied layout's manifest onto its NEW directory:
    * manifest file entries record ABSOLUTE paths, so a copy of a layout
    * (a takedown clone, a backup restore) still points every read at
    * the SOURCE's part-files — silently correct while the source is
    * byte-identical and alive, FileNotFound (or worse, stale data) the
    * moment it isn't. Rewrites each entry's directory component to
    * `path` (file names, bounds, and both ledgers preserved) — the same
    * substitution [[compact]] applies after its staging rename. Call
    * immediately after copying a layout directory. */
  def rehome(spark: SparkSession, path: String): Unit = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val here = fs.makeQualified(dir).toString.stripSuffix("/")
    val json = readManifestJson(fs, path)
    val rehomed = """"file":"[^"]*/([^/"]+)"""".r
      .replaceAllIn(json, m => java.util.regex.Matcher
        .quoteReplacement(s""""file":"$here/${m.group(1)}""""))
    val mp = new org.apache.hadoop.fs.Path(path, ManifestName)
    val out = fs.create(mp, true)
    out.write(rehomed.getBytes("UTF-8"))
    out.close()
  }

  /** Files whose manifest box intersects the predicate box. Bounds are
    * inclusive; a column absent from `bounds` is unconstrained; a FILE
    * with no recorded bounds for a constrained column is kept (missing
    * stats mean "cannot prune", never "drop"). */
  def filesFor(spark: SparkSession, path: String,
      bounds: Map[String, (Double, Double)]): Seq[String] = {
    val fs = new org.apache.hadoop.fs.Path(path, ManifestName)
      .getFileSystem(spark.sessionState.newHadoopConf())
    filesForJson(readManifestJson(fs, path), bounds)
  }

  /** [[filesFor]] over an already-read manifest — so a caller composing
    * several manifest-driven decisions ([[readBox]]'s prune + tombstone
    * pair, [[compact]]'s file list + ledgers) reads and parses the
    * manifest ONCE, from one consistent version. */
  private def filesForJson(json: String,
      bounds: Map[String, (Double, Double)]): Seq[String] = {
    // manifest is engine-written, schema-fixed: parse with the same
    // minimal quoting rules Verify uses for emission
    val clustered = ledgerSection(json, "cols").toSet
    bounds.keys.foreach { c =>
      require(clustered.contains(c),
        s"column '$c' is not in this layout's manifest (clustered " +
          s"columns: ${clustered.mkString(", ")}) — only clustering " +
          "columns can drive file skipping")
    }
    filesSection(json).flatMap { e =>
      val body = e.stripPrefix("{").stripSuffix("}")
      val fields = body.split(",(?=\")").map { kv =>
        val Array(k, v) = kv.split(":", 2)
        k.replaceAll("\"", "") -> v.replaceAll("\"", "")
      }.toMap
      val keep = bounds.forall { case (c, (lo, hi)) =>
        (fields.get(s"min_$c"), fields.get(s"max_$c")) match {
          case (Some(mn), Some(mx)) => mx.toDouble >= lo && mn.toDouble <= hi
          case _ => true // no stats recorded for this file: cannot prune
        }
      }
      if (keep) Some(fields("file")) else None
    }
  }

  /** Scan only the manifest-selected files, then re-apply the exact
    * inclusive box predicate (skipping is a superset selection — the
    * predicate stays authoritative).
    *
    * The predicate is phrased in the column's NATIVE type wherever that
    * is exactly equivalent — integral columns compare against the
    * tightened integer bounds ceil(lo)..floor(hi) (clamped to the type's
    * range), doubles compare directly — because a cast-to-double
    * comparison blocks parquet filter pushdown: the files the manifest
    * could not skip would lose ROW-GROUP pruning inside them, which is
    * the second half of the skipping story (ZOrderSpec asserts the
    * PushedFilters). Other types keep the cast formulation (for a float
    * column a double-literal comparison still casts the column, and
    * narrowing the bound to float could widen the box). */
  def readBox(spark: SparkSession, path: String,
      bounds: Map[String, (Double, Double)]): DataFrame = {
    import org.apache.spark.sql.types._
    // ONE manifest read drives both decisions (prune + tombstones): the
    // serving hot path pays a single driver-side open, and both views
    // come from the same manifest version (no skew between a file list
    // and a tombstone ledger read moments apart)
    val fs = new org.apache.hadoop.fs.Path(path, ManifestName)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val json = readManifestJson(fs, path)
    val files = filesForJson(json, bounds)
    val raw =
      if (files.isEmpty) {
        spark.read.parquet(path).limit(0)
      } else spark.read.parquet(files: _*)
    // serve-time takedown honor: anti-join any pending tombstoned ids
    // (metadata-sized — batches since the last compact) after file
    // pruning, so an excised row can never surface between the takedown
    // and the compact that folds it in physically
    val df = pendingTombstones(spark, path, json) match {
      case Some((c, tombs)) => raw.join(tombs, Seq(c), "left_anti")
      case None => raw
    }
    bounds.foldLeft(df) { case (acc, (c, (lo, hi))) =>
      acc.schema(c).dataType match {
        case t @ (ByteType | ShortType | IntegerType | LongType) =>
          val (tmin, tmax) = t match {
            case ByteType => (Byte.MinValue.toDouble, Byte.MaxValue.toDouble)
            case ShortType => (Short.MinValue.toDouble, Short.MaxValue.toDouble)
            case IntegerType => (Int.MinValue.toDouble, Int.MaxValue.toDouble)
            case _ => (Long.MinValue.toDouble, Long.MaxValue.toDouble)
          }
          val l = math.ceil(lo)
          val h = math.floor(hi)
          if (l > h || l > tmax || h < tmin) acc.filter(lit(false))
          else {
            val lc = math.max(l, tmin).toLong
            val hc = math.min(h, tmax).toLong
            acc.filter(col(c) >= lit(lc).cast(t) && col(c) <= lit(hc).cast(t))
          }
        case DoubleType =>
          acc.filter(col(c) >= lo && col(c) <= hi)
        case _ =>
          acc.filter(col(c).cast("double") >= lo && col(c).cast("double") <= hi)
      }
    }
  }
}
