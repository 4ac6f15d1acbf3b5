package org.apache.spark

/** Test-only bridge into `private[spark]` listener plumbing: specs that
  * assert on EVERY plan a multi-action operator executes register a
  * QueryExecutionListener, whose events are delivered asynchronously —
  * the spec must drain the bus before reading its capture buffer. */
object GraftTestShims {
  def flushListeners(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
