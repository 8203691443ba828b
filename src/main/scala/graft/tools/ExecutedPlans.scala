package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Shared executed-plan capture for the audit tools: runs an action under
  * a [[QueryExecutionListener]] and returns every action's post-AQE
  * executed-plan string. Listener events arrive asynchronously on the
  * listener bus — the drain waits up to `firstWaitMs` for the FIRST
  * event (a loaded host can delay delivery well past a naive fixed
  * sleep), then loops until the captured set is stable.
  */
object ExecutedPlans {
  def capture(spark: SparkSession, firstWaitMs: Int = 10000)
      (action: => Unit): List[String] =
    captureQE(spark, firstWaitMs)(action).map(_.executedPlan.toString)

  /** Like [[capture]] but returns the [[QueryExecution]]s themselves, for
    * audits that need the logical side too (e.g. the plan-regression gate
    * inspecting join HINTS, which only exist pre-physical-planning).
    */
  def captureQE(spark: SparkSession, firstWaitMs: Int = 10000)
      (action: => Unit): List[QueryExecution] = {
    val captured = new scala.collection.mutable.ArrayBuffer[QueryExecution]
    val listener = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, ns: Long): Unit =
        captured.synchronized { captured += qe }
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      action
      var waited = 0
      while (captured.synchronized(captured.isEmpty) && waited < firstWaitMs) {
        Thread.sleep(100); waited += 100
      }
      var last = -1
      var spins = 0
      while (captured.synchronized(captured.size) != last && spins < 50) {
        last = captured.synchronized(captured.size)
        Thread.sleep(100)
        spins += 1
      }
      captured.synchronized(captured.toList)
    } finally spark.listenerManager.unregister(listener)
  }
}
