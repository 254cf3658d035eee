package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query `[wall, cpu]` seconds and
  * totals at the scale factor in SPARK_GRAFT_SF_DIR. A warmup pass at
  * sf0.001 first JIT-compiles the generated code paths so the timings
  * measure the engine, not the JVM's first-run compilation; each query
  * then reports the faster of two interleaved full passes (steady-state),
  * with its process-CPU burn so host co-tenancy distortion is visible in
  * the emitted JSON itself (busy ratio — see below).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.ensureConf(spark)

    // optional arg: regex over query names (local iteration only — the
    // driver always runs with no args)
    val nameFilter = args.lift(0).map(_.r)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => nameFilter.forall(_.findFirstIn(n).isDefined))

    // Queries cache() intermediate relations for their own multi-pass
    // plans; CacheManager matches by canonicalized plan, so WITHOUT a
    // sweep those entries pile up across 84 queries × 3 runs (warmup +
    // best-of-2), evicting under memory pressure and GC-taxing every
    // later query — r4's phantom q_decontaminate "regression" was exactly
    // this cross-query residue. Sweep after every run: each timing then
    // measures the query INCLUDING its own cache build, from a clean
    // block manager.
    def sweep(): Unit = spark.sharedState.cacheManager.clearCache()

    // warmup at the smallest sf (JIT + parquet footer caches)
    names.foreach { name =>
      try SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
      finally sweep()
    }

    // Process-CPU seconds alongside wall seconds: this machine has shown
    // 5-60× wall-clock distortion from host co-tenancy (r5's driver bench),
    // and cpu/wall is the self-diagnosing signal — a query that burns
    // ~constant CPU across rounds but balloons in wall time was descheduled
    // by the host, not regressed. Read: busy_ratio = cpu / (wall × cores);
    // a healthy local[32] run of a shuffle-heavy query sits well above
    // ~0.2, while a co-tenant-starved run collapses toward 0.
    // Pattern-matched, not cast — and the match itself guarded against
    // LinkageError: the instanceof needs the com.sun class to LOAD, and a
    // JVM that doesn't ship the package throws NoClassDefFoundError
    // instead of falling to `case _`. Either way the bench degrades to
    // wall-only (cpu −1) instead of dying on a metrics nicety.
    val osBean: Option[com.sun.management.OperatingSystemMXBean] =
      try java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case b: com.sun.management.OperatingSystemMXBean => Some(b)
        case _ => None
      } catch { case _: LinkageError => None }
    def cpuNanos(): Long = osBean.map(_.getProcessCpuTime).getOrElse(-1L)

    /** (wall, cpu) seconds for one run, (-1, -1) on failure; cpu is -1
      * when process-CPU time is unavailable. */
    def time(name: String): (Double, Double) = {
      val c0 = cpuNanos()
      val t0 = System.nanoTime()
      val ok =
        try { SparkEntry.queries(name)(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
      val dt = (System.nanoTime() - t0) / 1e9
      val dc = if (c0 < 0) -1.0 else (cpuNanos() - c0) / 1e9
      sweep() // outside the timed window — blocks drop is bookkeeping
      if (ok) (dt, dc) else (-1.0, -1.0)
    }

    // Two FULL PASSES (not two consecutive runs): the first ~60-90s after
    // an 80-query warmup carry a decaying JVM transient (C2 compile
    // backlog + GC/cleaner debris) that inflates whichever queries run
    // first by 3-10× — measured by reversing the timed order, which moved
    // the inflation to the other end of the alphabet. Interleaving whole
    // passes puts every query's second run in steady state, so
    // min(passA, passB) is transient-free for all of them.
    val passA = names.map(name => name -> time(name)).toMap
    // keep the (wall, cpu) PAIR of the faster pass — mixing passes would
    // pair a wall time with another run's CPU burn
    val results = names.map { name =>
      val a = passA(name)
      val b = time(name)
      name -> (if (a._1 < 0 || b._1 < 0) (-1.0, -1.0)
               else if (a._1 <= b._1) a else b)
    }
    // Full-precision per-query detail on its own (non-final) line for the log.
    val fullQs = results.map { case (k, (w, c)) => "\"" + k + "\":[" + w + "," + c + "]" }
      .mkString("{", ",", "}")
    println(s"""BENCH_DETAIL {"queries":$fullQs,"sf":"$sfDir"}""")

    // The driver captures only the last ~2000 chars of output and parses the
    // final JSON line from it. Keep that line comfortably under the window:
    // 3-decimal values, and if the map still doesn't fit, keep the slowest
    // queries that do (the full map is on the BENCH_DETAIL line above).
    def r3(v: Double): String =
      if (v < 0) "-1" else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val total = results.map(_._2._1).filter(_ >= 0).sum
    val cpuTotal = results.map(_._2._2).filter(_ >= 0).sum
    val cores = Runtime.getRuntime.availableProcessors()
    val loadAvg = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    def render(qs: Seq[(String, (Double, Double))]): String = {
      // per-query rows are [wall, cpu] pairs — see the busy-ratio note above
      val m = qs.map { case (k, (w, c)) => "\"" + k + "\":[" + r3(w) + "," + r3(c) + "]" }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","cpu_total":${r3(cpuTotal)},"cores":$cores,"load_avg":${r3(loadAvg)},"n_queries":${results.size},"queries":$m,"sf":"$sfDir"}"""
    }
    val budget = 1400
    var line = render(results)
    if (line.length > budget) {
      val bySlowest = results.sortBy(-_._2._1)
      var keep = bySlowest.size
      while (keep > 1 && render(bySlowest.take(keep).sortBy(_._1)).length > budget) keep -= 1
      line = render(bySlowest.take(keep).sortBy(_._1))
    }
    println(line)
    spark.stop()
  }
}
