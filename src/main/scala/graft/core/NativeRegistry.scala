package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Named native-model functions — the project-file half of the engine's
  * Python-model replacement (SURVEY §2.5; reference:
  * core/dbt/context/providers.py:1566 submit_python_job). A project
  * declares a native model in `models/<name>.native.conf` with a
  * `fn: <registered-name>` line; [[Project.load]] resolves the name here
  * at parse time (fail-fast: a typo'd fn is a parse error, not a silent
  * empty model). The function receives the session and its resolved
  * dependency DataFrames keyed by dependency MODEL NAME — exactly the
  * [[NativeCode]] contract the Runner dispatches.
  *
  * Registration is code (the functions ARE Scala), so library natives
  * install in [[graft.Main]] / test setup via e.g.
  * [[graft.ops.CurationRecipe.installNatives]]; projects can register
  * their own before load. Same shape as the generic-test TestRegistry. */
object NativeRegistry {
  private val fns =
    new java.util.concurrent.ConcurrentHashMap[
      String, (SparkSession, Map[String, DataFrame]) => DataFrame]()

  /** Register (or replace — re-registration is idempotent installs). */
  def register(name: String)(
      fn: (SparkSession, Map[String, DataFrame]) => DataFrame): Unit =
    fns.put(name, fn)

  def apply(name: String): (SparkSession, Map[String, DataFrame]) => DataFrame =
    Option(fns.get(name)).getOrElse(throw new NoSuchElementException(
      s"no native model function registered as '$name' — known: " +
        names.sorted.mkString(", ")))

  def names: Seq[String] = {
    import scala.jdk.CollectionConverters._
    fns.keySet().asScala.toSeq
  }
}
