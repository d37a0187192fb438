package graft.tools

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** X3f evidence in the RIGHT currency (r16 verdict finding #3): PQ's
  * whole point is scan IO — the probed-cell scan reads m code bytes
  * + one norm instead of dim·4 vector bytes — but the r16 artifacts
  * measured WALL on a page-cached local corpus, where that lever is
  * invisible (and flat-indexed wins). This tool asserts the IO cut in
  * BYTES.
  *
  * Measurement: exact column-chunk accounting from the parquet
  * footers of the probed-cell files — for each arm, the sum of the
  * compressed on-disk sizes of exactly the columns its scan reads
  * (flat: neighbor_id + cv; PQ: neighbor_id + code + norm), over
  * exactly the files partition pruning admits. This is what a
  * column-pruned scan transfers at 100 TB, measured rather than
  * derived. (Task-metrics `inputMetrics.bytesRead` was tried first —
  * the q_join_bloom listener precedent — and is UNUSABLE for this on
  * a local filesystem: the vectorized parquet reader's data-page IO
  * bypasses the FS statistics the counter samples, so a 16 MB
  * full-column materialization and a count() both report the same
  * ~1.7 KB/file footer traffic. Verified by materializing every
  * column through a noop sink; both raw counter values are still
  * recorded in the artifact for transparency.)
  *
  * Honesty row: the LOCAL full PQ path re-reads the probed cells'
  * exact-vector chunks in phase 2 (the re-rank is a broadcast hash
  * join, which pushes no parquet filter on neighbor_id), so its total
  * local bytes are codes + vectors — MORE than the flat arm. That is
  * recorded, not hidden: PQ's lever is the phase-1 scan, and at
  * 100 TB the re-rank side is a bounded candidate fetch
  * (candMult·k·|Q| rows) against a point-lookup store, not a rescan.
  *
  * Contracts (hard-asserted at factor ≥ 30):
  *  - the phase-1 scan-bytes ratio ≥ 6× (measured headroom under the
  *    arithmetic 16×: ids and norms are shared overhead and parquet
  *    already dictionary/RLE-compresses the small int codes);
  *  - the at-rest pqcodes/ dir is ≥ 6× smaller than cells/.
  *
  * Output: one JSON line to SPARK_GRAFT_SCALE_OUT (default
  * SCALE_OUT_PQBYTES.json).
  *
  * Usage: runMain graft.tools.PqBytesScale [baseDir] [factor]
  */
object PqBytesScale {
  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(30)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = sys.env.getOrElse(
      "SPARK_GRAFT_SCALE_OUT", "SCALE_OUT_PQBYTES.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir =
      if (factor <= 1) baseDir
      else graft.ScaleBench.scaledDir(spark, baseDir, factor)
    val emb = Tables.table(spark, dir, "embeddings")
    val n = emb.count()
    val baseMax = Tables.table(spark, baseDir, "embeddings")
      .agg(max(col("vec_id"))).head.getLong(0)
    val q = emb.filter(col("vec_id") % 20 === 0 && col("vec_id") <= baseMax)

    // the AnnScale index caches (built outside any measurement)
    val srcMtime = Files.getLastModifiedTime(
      Paths.get(s"$dir/embeddings.parquet")).toMillis
    val flatIdx = s"${System.getProperty("java.io.tmpdir")}/graft-ivfidx-" +
      s"${Paths.get(dir).getFileName.toString}-$srcMtime"
    val pqIdx = s"${System.getProperty("java.io.tmpdir")}/graft-ivfpq-" +
      s"${Paths.get(dir).getFileName.toString}-$srcMtime"
    if (!Files.exists(Paths.get(s"$flatIdx/stats/_SUCCESS")))
      Similarity.buildIvfIndex(emb, "vec_id", "embedding", flatIdx,
        iters = 2, nHint = n)
    if (!Files.exists(Paths.get(s"$pqIdx/stats/_SUCCESS")))
      Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", pqIdx,
        iters = 2, m = 8, ks = 256, nHint = n)

    // the probed cells of this query batch at the serving probe —
    // identical for both arms (same coarse codebook)
    val cents = broadcast(spark.read.parquet(s"$flatIdx/centroids"))
    val nl = cents.count().toInt
    val np = Similarity.servingConfigFor(nl, 0.9)
    val probed = Similarity.assignCells(q, "vec_id", "embedding",
        cents, "query_id", "qv", keep = np)
      .select(col("cell")).distinct().collect()
      .map(_.get(0).toString).toSet
    System.err.println(s"[pqbytes] nlist=$nl nProbe=$np probed=${probed.size}")

    /** Compressed bytes of `cols`' column chunks across the probed
      * cell=... files under `root`, from the parquet footers — the
      * exact transfer of a column-pruned, partition-pruned scan.
      */
    def scanBytes(root: String, cols: Set[String]): Long = {
      val conf = spark.sparkContext.hadoopConfiguration
      val dirs = Option(new java.io.File(root).listFiles())
        .getOrElse(Array.empty[java.io.File])
        .filter(d => d.isDirectory && d.getName.startsWith("cell=") &&
          probed.contains(d.getName.stripPrefix("cell=")))
      dirs.flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
        .map { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f.getPath), conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try {
            r.getFooter.getBlocks.toArray.map {
              case b: org.apache.parquet.hadoop.metadata.BlockMetaData =>
                b.getColumns.toArray.map {
                  case c: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData
                      if cols.contains(c.getPath.toDotString.split("\\.")(0)) =>
                    c.getTotalSize
                  case _ => 0L
                }.sum
            }.sum
          } finally r.close()
        }.sum
    }
    val flatScan = scanBytes(s"$flatIdx/cells", Set("neighbor_id", "cv"))
    val pqScan = scanBytes(s"$pqIdx/pqcodes",
      Set("neighbor_id", "code", "norm"))
    val ratio = flatScan.toDouble / math.max(1L, pqScan)
    System.err.println(
      f"[pqbytes] probed scan: flat $flatScan%d B vs pq $pqScan%d B " +
        f"($ratio%.2fx)")

    // the honesty row: the local full PQ path's phase-2 broadcast
    // join re-reads the probed cv chunks — total = codes + vectors
    val pqFullLocal = pqScan + scanBytes(s"$pqIdx/cells",
      Set("neighbor_id", "cv"))
    System.err.println(
      s"[pqbytes] local full-path bytes: flat $flatScan vs pq $pqFullLocal")

    // the broken-counter transparency row (see scaladoc)
    def listenerBytes(body: => Unit): Long = {
      val acc = new java.util.concurrent.atomic.AtomicLong(0L)
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null)
            acc.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
      }
      spark.sparkContext.addSparkListener(l)
      try {
        body
        var prev = -1L; var settle = 0; var waited = 0L
        while (settle < 2 && waited < 30000L) {
          Thread.sleep(250L); waited += 250L
          val cur = acc.get()
          if (cur == prev) settle += 1 else { settle = 0; prev = cur }
        }
      } finally spark.sparkContext.removeSparkListener(l)
      acc.get()
    }
    val probedSeq = probed.toSeq.map(_.toInt)
    val lFlat = listenerBytes {
      spark.read.parquet(s"$flatIdx/cells")
        .where(col("cell").isin(probedSeq: _*))
        .select("neighbor_id", "cv")
        .write.format("noop").mode("overwrite").save()
    }
    val lPq = listenerBytes {
      spark.read.parquet(s"$pqIdx/pqcodes")
        .where(col("cell").isin(probedSeq: _*))
        .select("neighbor_id", "code", "norm")
        .write.format("noop").mode("overwrite").save()
    }
    System.err.println(
      s"[pqbytes] listener counters (footer traffic only on local " +
        s"fs): flat $lFlat pq $lPq")

    // static at-rest sizes
    def dirBytes(p: String): Long = {
      val root = Paths.get(p)
      if (!Files.exists(root)) 0L
      else Files.walk(root).filter(Files.isRegularFile(_))
        .mapToLong(Files.size(_)).sum()
    }
    val codesDisk = dirBytes(s"$pqIdx/pqcodes")
    val cellsDisk = dirBytes(s"$flatIdx/cells")
    val atRest = cellsDisk.toDouble / math.max(1L, codesDisk)
    System.err.println(
      f"[pqbytes] at rest: cells $cellsDisk%d B vs pqcodes $codesDisk%d B " +
        f"($atRest%.2fx)")

    val floor = sys.env.getOrElse("SPARK_GRAFT_PQ_BYTES_FLOOR", "6.0").toDouble
    if (factor >= 30) {
      if (ratio < floor) throw new AssertionError(
        f"PQ scan-bytes cut below floor at ${factor}x: $ratio%.2f < $floor%.1f")
      if (atRest < floor) throw new AssertionError(
        f"PQ at-rest cut below floor at ${factor}x: $atRest%.2f < $floor%.1f")
    }

    val line = s"""{"metric":"pq_scan_bytes","factor":$factor,""" +
      s""""n_corpus":$n,"n_queries":${q.count()},"n_probe":$np,""" +
      s""""flat_scan_bytes":$flatScan,"pq_scan_bytes":$pqScan,""" +
      s""""scan_ratio":${math.round(ratio * 100) / 100.0},""" +
      s""""pq_full_local_bytes":$pqFullLocal,""" +
      s""""cells_disk_bytes":$cellsDisk,"pqcodes_disk_bytes":$codesDisk,""" +
      s""""at_rest_ratio":${math.round(atRest * 100) / 100.0},""" +
      s""""listener_flat_bytes":$lFlat,"listener_pq_bytes":$lPq}"""
    println(line)
    System.err.println(line)
    Files.writeString(Paths.get(outPath), line + "\n")
    spark.stop()
  }
}
