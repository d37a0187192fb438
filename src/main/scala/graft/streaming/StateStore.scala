package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import java.nio.file.{Files, Paths, StandardCopyOption}

/** The ONE write-then-pointer store protocol every streaming store in
  * this package follows (r19 ADVICE: the ~70-line skeleton had grown
  * to 16 near-identical copies). A store is a directory of immutable
  * `<prefix><version>/` parquet snapshots under an atomically-moved
  * `_CURRENT` pointer holding "<version> <lastAppliedBatchId>":
  *
  *  - COMMIT = write the next version's snapshot(s), THEN move the
  *    pointer. A crash between the two leaves an orphan directory the
  *    replayed batch overwrites (Overwrite mode) — readers never see
  *    it because they resolve through the pointer.
  *  - REPLAY GUARD = a batchId at or below the pointer's is a no-op;
  *    foreachBatch redelivery therefore cannot double-fold.
  *  - CLEANUP = retain version and version−1 (a concurrent reader may
  *    still hold the predecessor), then walk DOWNWARD from version−2
  *    deleting while the directory exists: amortized O(1) per commit
  *    (each version dies exactly once) and self-healing when a crash
  *    between the pointer move and the delete orphaned versions (the
  *    r18→r19 downward-walk rule). The walk stream is closed
  *    (try/finally — the leak the 16 copies shared).
  *
  * Stores supply ONLY their state algebra (partial/merge/read faces);
  * multi-directory stores (e.g. an index snapshot next to the state
  * snapshot) pass their extra prefixes to the same cleanup.
  */
object StateStore {

  private def pointerPath(stateDir: String) = Paths.get(stateDir, "_CURRENT")

  /** (version, lastAppliedBatchId); (0, -1) before the first commit. */
  def readPointer(stateDir: String): (Long, Long) = {
    val p = pointerPath(stateDir)
    if (!Files.exists(p)) (0L, -1L)
    else {
      val parts = Files.readString(p).trim.split(" ")
      (parts(0).toLong, parts(1).toLong)
    }
  }

  /** Atomic pointer move — the commit point. */
  def writePointer(stateDir: String, version: Long, batchId: Long): Unit = {
    val tmp = Paths.get(stateDir, "_CURRENT.tmp")
    Files.writeString(tmp, s"$version $batchId")
    Files.move(tmp, pointerPath(stateDir),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Recursive delete of one snapshot directory, walk stream closed —
    * also used directly by the stores whose layouts extend the plain
    * protocol (multi-directory snapshots, payload-carrying pointers).
    */
  def deleteTree(dir: java.nio.file.Path): Unit = {
    val walk = Files.walk(dir)
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(f => Files.deleteIfExists(f))
    finally walk.close()
  }

  /** Downward-walking retention: delete `<prefix><v>` for v = next−2,
    * next−3, … while the directory exists, for every prefix.
    */
  def cleanupBelow(stateDir: String, next: Long,
      prefixes: Seq[String] = Seq("state-")): Unit =
    prefixes.foreach { prefix =>
      var old = next - 2L
      while (old >= 1L &&
          Files.isDirectory(Paths.get(stateDir, s"$prefix$old"))) {
        deleteTree(Paths.get(stateDir, s"$prefix$old"))
        old -= 1L
      }
    }

  /** The commit skeleton shared by every store's applyBatch: replay
    * guard → caller writes snapshot(s) under the handed version →
    * pointer move → downward cleanup. Returns false on a replayed
    * (skipped) batch. `write` receives (currentVersion, nextVersion)
    * and must only create `<prefix><nextVersion>` directories in
    * Overwrite mode.
    */
  def commit(stateDir: String, batchId: Long,
      prefixes: Seq[String] = Seq("state-"))(
      write: (Long, Long) => Unit): Boolean = {
    Files.createDirectories(Paths.get(stateDir))
    val (curVer, lastBatch) = readPointer(stateDir)
    if (batchId <= lastBatch) return false
    val next = curVer + 1
    write(curVer, next)
    writePointer(stateDir, next, batchId)
    cleanupBelow(stateDir, next, prefixes)
    true
  }

  /** The committed snapshot under `prefix` (empty-safe via template —
    * the schema-only frame every read face passes before the first
    * commit).
    */
  def readVersioned(spark: SparkSession, stateDir: String,
      template: DataFrame, prefix: String = "state-"): DataFrame = {
    val (v, _) = readPointer(stateDir)
    if (v == 0L) spark.createDataFrame(
      java.util.Collections.emptyList[Row](), template.schema)
    else spark.read.parquet(s"$stateDir/$prefix$v")
  }
}
