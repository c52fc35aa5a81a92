package org.apache.spark.sql.graft.source

import graft.relations.CommitLog

/** Thread-scoped replay guard for scheduled-operation DML statements
  * (r18 — ADVICE r17: the crash window between an operation statement's
  * commit and its journal record must not double-apply on resume).
  *
  * The Runner wraps each operation statement in [[withTxn]]; every
  * connector commit that runs on the wrapping thread attaches the
  * (app → statement-index) watermark to its atomic manifest CAS — the
  * same txn-action primitive the streaming sink's exactly-once contract
  * rides (reference shape: the Delta paper's txn action). A resumed run
  * replaying the statement finds the watermark in the TARGET TABLE'S OWN
  * manifest (committed atomically with the data it guards, so "mutation
  * applied" and "replay-guard recorded" cannot diverge) and skips.
  *
  * Thread-local, not a session conf: operation nodes run on the DAG
  * executor's task pool CONCURRENTLY with other nodes' materializations —
  * a session-global hint would attach the operation's watermark to an
  * unrelated model's commit and silently skip that model's write on a
  * same-index collision. A PLAIN ThreadLocal, deliberately not
  * inheritable (r18 self-review): a pooled thread created while an
  * operation statement was running would inherit the guard FOREVER and
  * could stale-skip an unrelated later commit that happened to execute
  * on it — the one failure direction this mechanism must never have.
  * Batch V2 command commits execute on the thread that runs the
  * statement (OperationResumeSpec proves the guard fires end to end);
  * if a future Spark version moved command commits off-thread the guard
  * degrades to ABSENT (pre-r18 crash-window behavior) and that spec
  * fails loudly — never a wrong skip. */
object GraftOpTxn {
  private val holder = new ThreadLocal[Map[String, Long]] {
    override def initialValue(): Map[String, Long] = Map.empty
  }

  def withTxn[A](app: String, batch: Long)(body: => A): A = {
    holder.set(Map(app -> batch))
    try body finally holder.set(Map.empty)
  }

  /** The watermark to ride the current commit (empty outside an
    * operation statement). */
  def current: Map[String, Long] = holder.get()

  /** Fast path for a replayed statement: its watermark already sits in
    * the table's manifest, so skip the write (publish + commit) outright.
    * The authoritative gate stays inside the commit CAS — a race between
    * this check and the commit resolves there (StaleTxnException). */
  def alreadyCommitted(log: CommitLog): Boolean = {
    val txn = holder.get()
    txn.nonEmpty && {
      val committed = log.currentVersion.map(log.read).map(_.txn).getOrElse(Map.empty)
      txn.exists { case (app, b) => committed.get(app).exists(_ >= b) }
    }
  }
}
