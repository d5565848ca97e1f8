package graft

/** Isolated-JVM timing channel for one registry query: a fresh session
  * in a fresh process, so the measurement carries none of a long-lived
  * harness's session state (memoized checkpoint blocks, listener
  * backlog, old-gen pressure). ScaleBench spawns this as a subprocess
  * for the ×64 skew-cap adjudication — the contaminated in-harness ×64
  * winnow read measured 27-36 s where this channel reads ~15 s, and the
  * number that adjudicates the ENGINE's slope is the clean one.
  *
  * Args: sfDir queryName [reps=2]. Prints ONE JSON line with the
  * min-of-reps seconds (cache drop + GC between reps, noop sink — the
  * ScaleBench discipline).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = GraftSession.local("graft-probe")
    spark.range(1000000).selectExpr("sum(id)").collect() // JIT warm
    var best = Double.MaxValue
    for (_ <- 1 to reps) {
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.mode("overwrite").format("noop").save()
      best = math.min(best, (System.nanoTime() - t0) / 1e9)
    }
    println(f"""{"query":"$name","sec":$best%.3f}""")
    spark.stop()
  }
}
