package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Shared per-job wall-time listener for the measurement mains (QueryJobs,
  * TrainingProbe): prints one line per finished job. Null-safe on a missed
  * start event (listener-bus backpressure can drop events) — the job is
  * skipped instead of MatchError-ing the listener thread.
  */
final class JobTimingListener(tag: String) extends SparkListener {
  private val t0 = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
  override def onJobStart(j: SparkListenerJobStart): Unit =
    t0.put(j.jobId, (System.nanoTime(),
      Option(j.properties.getProperty("spark.job.description")).getOrElse("")))
  override def onJobEnd(j: SparkListenerJobEnd): Unit =
    Option(t0.get(j.jobId)).foreach { case (s, d) =>
      println(f"$tag job ${j.jobId}%4d ${(System.nanoTime() - s) / 1e9}%6.2f s  $d")
    }
}
