package graft.operators

import org.apache.spark.sql.DataFrame

/** Width-restoring repartition for HEAVY-MAP stages fed by narrow
  * scans (r21, guide §2.5 / §6): a parquet scan can never be wider
  * than its splittable file count — the fixture tables are one
  * single-row-group file each, so every explode/hash/regex/JSON map
  * stage they feed runs in ONE task regardless of cluster width
  * (JobProfile: 0.4–2 s single-task stages behind q_ngram_jaccard,
  * q_decontam_bloom, q_cdc_*, the LM quality scorers).
  *
  * `ensure` repartitions to `defaultParallelism` ONLY when the
  * frame's actual scan parallelism is below it — on a real many-file
  * corpus (100 TB = thousands of splits) the branch is a no-op and NO
  * exchange is added, so this is scale-adaptive, not a local[32]
  * constant: the exchange exists exactly when it is cheap (few-file
  * input) and needed (serial map work).
  *
  * Use ONLY in front of expensive per-row work (shingling + md5,
  * 64-column vote sums, envelope to_json/from_json, gram bitmap
  * probes): for cheap scan→filter→agg queries the extra exchange
  * costs more than the serial map does.
  *
  * Determinism: round-robin repartition sorts its input within
  * partitions first (spark.sql.execution.sortBeforeRepartition, on
  * by default) so retries reproduce the same placement; every
  * downstream operator in this library is order-free (DECIMAL sums,
  * explicit tie-breaks), so results are partitioning-independent.
  */
object ScanWidth {

  def ensure(df: DataFrame): DataFrame = {
    val width = df.sparkSession.sparkContext.defaultParallelism
    // getNumPartitions only triggers physical planning (file listing
    // + split packing), never a job
    if (df.rdd.getNumPartitions < width) df.repartition(width) else df
  }
}
