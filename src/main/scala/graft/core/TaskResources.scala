package graft.core

import scala.collection.mutable

/** Per-task resource tracking: a buffer whose contents are closed by a
  * task-completion listener, so an early-terminating consumer (limit/take)
  * cannot leak task-opened sockets that a drain-to-exhaustion close never
  * reaches. Outside a running task (unit code driving iterators directly)
  * there is no listener — callers keep their eager close-on-exhaustion for
  * that path, and double-close is safe (socket close is idempotent, and the
  * listener wraps each close in Try).
  */
object TaskResources {
  def closeOnTaskCompletion[C <: AutoCloseable](): mutable.ArrayBuffer[C] = {
    val opened = mutable.ArrayBuffer.empty[C]
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit] { _ =>
        opened.foreach(c => scala.util.Try(c.close()))
      })
    opened
  }
}
