package org.apache.spark.sql.graftshim

/** Bridge into `private[spark]` listener-bus internals: the SQL
  * table-stream route publishes stream cursors from a
  * QueryExecutionListener (commit-on-success), and those listeners fire
  * on the ASYNC listener bus — a statement issued immediately after a
  * successful consume must first drain the bus so the publication is
  * visible (the same discipline Spark's own tests use via
  * `waitUntilEmpty`). */
object ListenerShim {

  /** Drain the shared listener bus, bounded. A timeout is returned as
    * false, never thrown — cursor publication is monotone, so a missed
    * flush only re-serves a window (at-least-once), it cannot corrupt. */
  def flush(sc: org.apache.spark.SparkContext,
            timeoutMillis: Long = 30000L): Boolean =
    try {
      sc.listenerBus.waitUntilEmpty(timeoutMillis)
      true
    } catch {
      case _: java.util.concurrent.TimeoutException => false
    }
}
