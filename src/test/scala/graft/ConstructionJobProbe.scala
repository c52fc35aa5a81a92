package graft

import org.apache.spark.sql.SparkSession

/** Assert a query-construction block fires ZERO Spark jobs (the
  * DsirModelSpec lazy-validation discipline): from-index / from-sketch
  * query functions must not run eager probe or validation jobs at plan
  * construction — geometry checks belong IN the plan as per-row
  * when/raise_error guards. Counted under a dedicated job group so
  * concurrent suites on the shared session can never false-fail this.
  * (Shared by StoreCompactionSpec and CurationOpsSpec — r16.) */
object ConstructionJobProbe {
  def assertNoConstructionJobs[A](spark: SparkSession, what: String)
                                 (build: => A): A = {
    val group = s"$what-plan-construction-${System.nanoTime()}"
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        if (js.properties != null &&
            group == js.properties.getProperty("spark.jobGroup.id"))
          jobs.incrementAndGet()
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.sparkContext.setJobGroup(group, s"$what construction probe")
      val built = build
      Thread.sleep(500) // listener bus is async; a submitted job would land
      assert(jobs.get() == 0,
        s"$what construction must fire no Spark job, saw ${jobs.get()}")
      built
    } finally {
      spark.sparkContext.clearJobGroup()
      spark.sparkContext.removeSparkListener(listener)
    }
  }
}
