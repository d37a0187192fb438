package graft.operators

import java.util.concurrent.atomic.AtomicBoolean
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Cache lifecycle for operator-scoped intermediate tables (dedup
  * signature tables, the resample aggregate, any cached subtree an
  * operator reuses across plan branches): unpersist `cached` right
  * after the action CONSUMING `result` completes — the listener
  * matches the finished QueryExecution's analyzed plan against
  * `result`'s plan (subtree `sameResult`), so concurrent or
  * interleaved unrelated actions on the session (streaming batches,
  * other drivers) never evict the caches mid-flight. Safety valve: if
  * the caller never executes `result`, the listener (and caches)
  * would linger — after 64 non-matching completions it releases
  * anyway, turning a leak into at worst a recompute (never a
  * correctness change: unpersisted plans simply re-evaluate).
  * One-shot and self-unregistering.
  */
object CacheLifecycle {

  def releaseAfterAction(result: DataFrame, cached: DataFrame*): DataFrame = {
    val spark = result.sparkSession
    val target = result.queryExecution.analyzed
    val listener = new QueryExecutionListener {
      private val done = new AtomicBoolean(false)
      private val misses = new java.util.concurrent.atomic.AtomicInteger(0)
      private def consumesResult(qe: QueryExecution): Boolean =
        (try qe.analyzed.exists(_.sameResult(target))
        catch {
          // a broken plan comparison must not leak the caches, but
          // fatal throwables (VM errors, interrupts) propagate — a
          // listener callback must never swallow those
          case scala.util.control.NonFatal(_) => true
        }) || misses.incrementAndGet() >= 64
      private def release(): Unit = if (done.compareAndSet(false, true)) {
        cached.foreach(_.unpersist(blocking = false))
        spark.listenerManager.unregister(this)
      }
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        if (consumesResult(qe)) release()
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
        if (consumesResult(qe)) release()
    }
    spark.listenerManager.register(listener)
    result
  }
}
