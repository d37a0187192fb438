package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, Row, SaveMode}
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}

/** X3 serving face: approximate top-k similarity answers for a STREAM
  * of query vectors against a static corpus — the online half of the
  * batch ANN family (`Similarity.lshTopK`), the shape a training-data
  * pipeline uses for retrieval/dedup lookups while the corpus is
  * rebuilt offline.
  *
  * Execution model: the corpus is read once and CACHED; each
  * micro-batch of queries runs the identical batch operator
  * (`lshTopK`: corpus-side bucket explode, broadcast query side,
  * map-side cosine, scalar-only dedup + per-query top-k window) and
  * appends its answers. Batch/streaming unification is the point —
  * the serving path cannot drift from the oracled batch semantics
  * because it IS the batch operator.
  *
  * Scale notes: queries-per-batch is small by construction (a
  * micro-batch), so the query side always broadcasts; the corpus
  * explode is the standing cost and is paid from cache after the
  * first batch. At corpus sizes beyond executor memory, persist the
  * exploded (t, blk)-keyed corpus to a partitioned table instead and
  * probe with partition filters (the [[StreamingDedup]] tier-4 store
  * is exactly that layout).
  */
object StreamingAnn {

  /** Answers for each micro-batch append to `outDir` as
    * (query_id, neighbor_id, cosine, rank) — at-least-once (a
    * replayed batch re-appends its answers; answers are deterministic,
    * so downstream dedup on (query_id, neighbor_id) is trivial).
    */
  def serveTopK(
      queries: DataFrame, corpus: DataFrame, id: String, vec: String,
      k: Int, planes: Int, dim: Int, tables: Int,
      outDir: String, checkpoint: String): DataStreamWriter[Row] = {
    val cached = corpus.cache()
    queries.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Similarity.lshTopK(cached, batch, id, vec, k, planes, dim, tables)
          .write.mode(SaveMode.Append).parquet(outDir)
      }
  }
}
