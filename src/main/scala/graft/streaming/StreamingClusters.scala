package graft.streaming

import graft.operators.{Dedup, GraphOps}
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}
import org.apache.spark.sql.types.StructType

/** Streaming face of the X2 CLUSTER step: assign every document of a
  * stream to a near-dup cluster incrementally — the batch operator
  * ([[graft.operators.GraphOps.connectedComponents]]) re-clusters a
  * corpus from scratch; a crawler-fed pipeline instead needs "which
  * existing cluster does this new document join?" answered per
  * micro-batch without re-scanning the corpus.
  *
  * Per micro-batch (same SimHash 8×8 Hamming LSH as the tier-3 dedup
  * store, and the same (band, bpfx)-partitioned O(batch)-probe
  * layout):
  *
  *  1. batch signatures probe the label store → for each batch doc
  *     the MINIMUM label among its near-dup matches (one pruned
  *     partition-filtered join);
  *  2. batch-INTERNAL near-dup pairs cluster with the exact batch
  *     operator (pointer-jumping CC — new docs may form new clusters
  *     entirely inside one batch);
  *  3. each batch component takes `least(component min id, min
  *     matched store label)`; unmatched singletons label themselves.
  *
  * == Eventual exactness: merge edges + offline compaction ==
  *
  * Incremental assignment is deliberately APPEND-ONLY: when one batch
  * component bridges TWO existing store clusters (labels L1 < L2),
  * the batch docs take L1 but L2's rows are NOT rewritten in place —
  * rewriting the store inside the hot path would turn each micro-batch
  * into a corpus-sized job, exactly the O(corpus) trap the dedup
  * stores avoid. Instead the bridge is durably recorded as a MERGE
  * EDGE (L1, L2) under `<storeDir>/merges`, so the store's labels form
  * a pointer forest whose exact closure is always recoverable:
  *  - [[resolveLabels]] returns the exact (id, label) view by running
  *    the batch CC over the stored (id → label) edges ∪ merge edges —
  *    no rewrite, read-time exactness;
  *  - [[compactLabels]] makes it durable: rewrites every store row to
  *    its resolved label, clears the merge log, and collapses
  *    per-batch appends (same tmp+atomic-rename contract as the dedup
  *    store compaction). After compaction, labels are exact with an
  *    empty merge log until the next bridge event.
  *
  * Store sizing: 8 band rows per doc × (id, label, bsig, s1, s2) —
  * same order as the tier-3 signature store; merge edges are O(number
  * of cluster-bridge events), typically tiny.
  */
object StreamingClusters {

  val LabelStoreSchema: StructType = StructType.fromDDL(
    "id bigint, label bigint, bsig string, s1 bigint, s2 bigint, band int, bpfx string")

  private def labelPath(storeDir: String): String =
    StreamingDedup.v2Path(storeDir)
  private def mergePath(storeDir: String): String = s"$storeDir/merges"

  /** One micro-batch of incremental clustering against `store` rows
    * (band, bsig, s1, s2, label). Returns one row per batch doc:
    * (id, label, simhash, s1, s2). Ids must be LongType (labels live
    * in the same id domain, like the batch operator's cluster_id).
    */
  def clusterBatch(
      batch: DataFrame, store: DataFrame, idCol: String, textCol: String,
      maxHamming: Int): DataFrame =
    clusterSigned(batch, StreamingDedup.signatures(batch, idCol, textCol),
      store, idCol, textCol, maxHamming)

  private def clusterSigned(
      batch: DataFrame, sig: DataFrame, store: DataFrame, idCol: String,
      textCol: String, maxHamming: Int): DataFrame = {
    val bandArr = array((0 until 8).map(b =>
      substring(col("simhash"), b * 8 + 1, 8)): _*)
    val bands = sig.select(col(idCol), col("s1"), col("s2"),
      posexplode(bandArr).as(Seq("band", "bsig")))
    val ham = bit_count(col("s1").bitwiseXOR(col("st_s1"))) +
      bit_count(col("s2").bitwiseXOR(col("st_s2")))
    // per batch doc: the min matched store label (drives adoption) AND
    // the full set of matched labels — the set is what makes bridges
    // recoverable when ONE doc matches several store clusters (min
    // alone would silently drop every label but the smallest, losing
    // the merge edge). Set size is bounded by the handful of near-dup
    // clusters a single doc can collide with, not the corpus.
    val matches = bands
      .join(store.select(col("band").as("st_band"), col("bsig").as("st_bsig"),
        col("s1").as("st_s1"), col("s2").as("st_s2"), col("label").as("st_label")),
        col("band") === col("st_band") && col("bsig") === col("st_bsig"))
      .filter(ham <= maxHamming)
      .groupBy(col(idCol)).agg(min(col("st_label")).as("store_label"),
        collect_set(col("st_label")).as("store_labels"))
    // batch-internal components; docs in no pair are their own comp
    val comp = GraphOps.connectedComponents(
      Dedup.simhashNearDup(batch, idCol, col(textCol), maxHamming),
      "id_a", "id_b")
      .withColumnRenamed("node", idCol)
    val labeled = sig.join(comp, Seq(idCol), "left")
      .withColumn("comp", coalesce(col("comp"), col(idCol)))
      .join(matches, Seq(idCol), "left")
    val compLabel = labeled.groupBy(col("comp"))
      .agg(min(col("store_label")).as("sl"))
      .select(col("comp"),
        least(col("comp"), coalesce(col("sl"), col("comp"))).as("label"))
    labeled.select(col(idCol), col("simhash"), col("s1"), col("s2"),
        col("comp"), col("store_label"), col("store_labels"))
      .join(compLabel, "comp")
      .select(col(idCol).as("id"), col("label"), col("simhash"),
        col("s1"), col("s2"), col("store_label"), col("store_labels"))
  }

  /** Streaming sink: per batch, cluster against the pruned label
    * store, append (id, label) assignments to `outDir`, the batch's
    * banded signature+label rows to the store, and any cluster-bridge
    * (label, merged_label) pairs to the merge log. Out-before-store:
    * same at-least-once contract as the dedup stores.
    */
  def assignAgainstStore(
      docs: DataFrame, idCol: String, textCol: String, maxHamming: Int,
      storeDir: String, outDir: String, checkpoint: String): DataStreamWriter[Row] =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val b = batch.persist()
        try {
          val sig = StreamingDedup.signatures(b, idCol, textCol).persist()
          val bandKeys = sig
            .select(posexplode(array((0 until 8).map(i =>
              substring(col("simhash"), i * 8 + 1, 4)): _*)).as(Seq("band", "bpfx")))
            .distinct().collect().map(r => (r.getInt(0), r.getString(1))).toSeq
          val store = prunedLabelStore(spark, storeDir, bandKeys)
          val out = clusterSigned(b, sig, store, idCol, textCol, maxHamming).persist()
          try {
            out.select(col("id"), col("label"))
              .write.mode(SaveMode.Append).parquet(outDir)
            // bridge events: the component adopted `label` but some doc
            // in it ALSO matched other store clusters — one edge per
            // distinct matched label, so even a single doc bridging two
            // store clusters (min-matched one adopted, the other not)
            // leaves the closure recoverable
            out.select(col("label"),
                explode(col("store_labels")).as("merged_label"))
              .where(col("merged_label") =!= col("label"))
              .distinct()
              .write.mode(SaveMode.Append).parquet(mergePath(storeDir))
            val bandArr = array((0 until 8).map(bn =>
              substring(col("simhash"), bn * 8 + 1, 8)): _*)
            out.select(col("id"), col("label"), col("s1"), col("s2"),
                posexplode(bandArr).as(Seq("band", "bsig")))
              .select(col("id"), col("label"), col("bsig"), col("s1"), col("s2"),
                col("band"), substring(col("bsig"), 1, 4).as("bpfx"))
              .write.partitionBy("band", "bpfx")
              .mode(SaveMode.Append).parquet(labelPath(storeDir))
          } finally {
            out.unpersist(blocking = false)
            sig.unpersist(blocking = false)
          }
        } finally b.unpersist(blocking = false)
      }

  /** The label store pruned to the batch's (band, bpfx) keys — pure
    * partition filter, same O(batch)-files contract as the dedup
    * stores. Empty-safe before first append.
    */
  def prunedLabelStore(
      spark: SparkSession, storeDir: String,
      bandKeys: Seq[(Int, String)]): DataFrame = {
    val p = labelPath(storeDir)
    if (StreamingDedup.pathExists(spark, p) && bandKeys.nonEmpty) {
      val pred = bandKeys.map { case (bn, pf) =>
        col("band") === lit(bn) && col("bpfx") === lit(pf)
      }.reduce(_ || _)
      spark.read.schema(LabelStoreSchema).parquet(p)
        .where(pred).select("id", "label", "bsig", "s1", "s2", "band")
    } else StreamingDedup.emptyDf(spark,
      "id bigint, label bigint, bsig string, s1 bigint, s2 bigint, band int")
  }

  /** Exact (id, label) view: batch CC over the stored id→label edges
    * plus the merge log — read-time resolution of the pointer forest,
    * no store rewrite. Offline/audit path: scans the whole store.
    */
  def resolveLabels(spark: SparkSession, storeDir: String): DataFrame = {
    val p = labelPath(storeDir)
    if (!StreamingDedup.pathExists(spark, p))
      return StreamingDedup.emptyDf(spark, "id bigint, label bigint")
    val idEdges = spark.read.schema(LabelStoreSchema).parquet(p)
      .select(col("id").as("a"), col("label").as("b")).distinct()
    val mergeEdges =
      if (StreamingDedup.pathExists(spark, mergePath(storeDir)))
        spark.read.parquet(mergePath(storeDir))
          .select(col("label").as("a"), col("merged_label").as("b"))
      else StreamingDedup.emptyDf(spark, "a bigint, b bigint")
    val comp = GraphOps.connectedComponents(
      idEdges.unionByName(mergeEdges), "a", "b")
    idEdges.select(col("a").as("id")).distinct()
      .join(comp.withColumnRenamed("node", "id"), Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("label"))
  }

  /** Durable exactness: rewrite every store row to its resolved
    * label, collapse per-batch appends (tmp + atomic rename, like the
    * dedup store compaction), and clear the merge log.
    *
    * Crash contract (single offline writer, like the dedup store
    * compactions): the swap is delete-then-rename, so a crash leaves
    * one of three states — (1) live store + stale tmp (died during or
    * after the tmp write): reads never look at the tmp sibling and the
    * next compaction overwrites it; (2) no store + COMPLETE tmp (died
    * between delete and rename): recovered below by finishing the
    * rename before compacting; (3) the normal before/after states.
    * No state exposes a half-written store to readers.
    */
  def compactLabels(spark: SparkSession, storeDir: String): Unit = {
    val p = labelPath(storeDir)
    locally { // finish a crashed swap: tmp holds the full compacted store
      val conf = spark.sessionState.newHadoopConf()
      val path = new org.apache.hadoop.fs.Path(p)
      val t = new org.apache.hadoop.fs.Path(s"$p.compact")
      val fs = path.getFileSystem(conf)
      if (!fs.exists(path) && fs.exists(t)) {
        if (!fs.rename(t, path)) throw new java.io.IOException(
          s"label store crash recovery failed: $t -> $p")
      }
    }
    if (!StreamingDedup.pathExists(spark, p)) return
    val resolved = resolveLabels(spark, storeDir)
      .withColumnRenamed("label", "new_label")
    val tmp = s"$p.compact"
    spark.read.schema(LabelStoreSchema).parquet(p)
      .join(resolved, Seq("id"), "left")
      .select(col("id"), coalesce(col("new_label"), col("label")).as("label"),
        col("bsig"), col("s1"), col("s2"), col("band"), col("bpfx"))
      .distinct()
      .repartition(col("band"), col("bpfx"))
      .write.partitionBy("band", "bpfx").mode(SaveMode.Overwrite).parquet(tmp)
    val conf = spark.sessionState.newHadoopConf()
    val path = new org.apache.hadoop.fs.Path(p)
    val t = new org.apache.hadoop.fs.Path(tmp)
    val fs = path.getFileSystem(conf)
    fs.delete(path, true)
    if (!fs.rename(t, path))
      throw new java.io.IOException(s"label store compaction swap failed: $tmp -> $p")
    fs.delete(new org.apache.hadoop.fs.Path(mergePath(storeDir)), true)
    ()
  }
}
