package graft

import java.nio.file.{Files, Paths}

/** Plan-capture main for the optimization rounds: writes
  * `explain("formatted")` output for each registry query matching a
  * name regex to `<outDir>/<name>.txt` — the before/after plan
  * evidence committed under `plans/rNN/`.
  *
  * Args: sfDir outDir [nameRegex].
  *
  * Note: building a DataFrame can itself trigger eager work (memoized
  * index builds, commit chains) — identical to what Bench pays before
  * its timed action, so captured plans are the shipped plans.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = Paths.get(args(1))
    val nameFilter = args.lift(2).map(_.r)
    Files.createDirectories(outDir)
    val spark = GraftSession.local("graft-plandump")
    val selected = SparkEntry.all
      .filter { case (name, _) => nameFilter.forall(_.findFirstIn(name).isDefined) }
    selected.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(outDir.resolve(s"$name.txt"), txt.getBytes("UTF-8"))
        println(s"[plandump] wrote $name (${txt.length} chars)")
      } catch {
        case e: Throwable =>
          println(s"[plandump] FAILED $name: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
