package graft.operators

import java.util.concurrent.Executors
import org.apache.spark.sql.DataFrame
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Overlap INDEPENDENT Spark jobs from driver threads (optimization
  * guide §2.6): Spark's scheduler happily runs several jobs at once
  * inside one application — actions are only sequential because the
  * driver calls them sequentially. When a query must materialize N
  * independent intermediates (the q_fdr_adjust six-test panel, any
  * fan-in of separately-checkpointed feeds), submitting them
  * concurrently lets the next job's tasks back-fill executors freed
  * by the current job's straggler tail instead of idling the cluster
  * once per feed.
  *
  * Semantics: `localCheckpoint()` materializes the SAME frame
  * whichever thread runs it, and the returned Seq preserves input
  * order — results are bit-identical to the sequential loop; only
  * wall-clock overlap changes. FIFO scheduling (the default) gives
  * earlier feeds priority, which is exactly the back-fill behaviour
  * wanted. A bounded pool (default 4 in flight) keeps concurrent
  * jobs from fighting for executors; errors propagate from Await.
  */
object ConcurrentJobs {

  def materialize(frames: Seq[DataFrame], maxInFlight: Int = 4): Seq[DataFrame] = {
    if (frames.size <= 1) return frames.map(_.localCheckpoint())
    val pool = Executors.newFixedThreadPool(math.min(maxInFlight, frames.size))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = frames.map(f => Future(f.localCheckpoint()))
      futures.map(Await.result(_, Duration.Inf))
    } finally pool.shutdown()
  }
}
