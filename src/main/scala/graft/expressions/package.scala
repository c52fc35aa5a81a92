package graft

/** Public forwarder for the Catalyst extension expressions, which live in
  * the org.apache.spark.sql namespace for private[sql] bridge access. */
package object expressions {
  val VectorExpressions: org.apache.spark.sql.graft.VectorExpressions.type =
    org.apache.spark.sql.graft.VectorExpressions
}
