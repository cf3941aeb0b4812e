package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made these conversions
  * `private[sql]` (columnNodeSupport.scala); third-party expression
  * libraries reach them via a shim in a sql subpackage — the same
  * technique Spark connector repos use publicly. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The session's broadcast budget in bytes (-1 = disabled), read from
    * the session handed in — not the thread-local `SQLConf.get`, which
    * silently falls back to a default conf on threads where no session
    * is active (a foreachBatch/stream thread would then route on the
    * wrong budget). `sessionState` is `private[sql]`, hence here. */
  def autoBroadcastThreshold(s: org.apache.spark.sql.SparkSession): Long =
    s.sessionState.conf.autoBroadcastJoinThreshold
}
