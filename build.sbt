ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "seliumspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The bench/verify driver parses the LAST line of sbt output as JSON.
// Default sbt wraps forked-process stdout in "[info] " and appends a
// "[success] Total time" line — both defeat that parse (every
// BENCH_r*.json so far carries "parsed": null). StdoutOutput passes the
// forked JVM's stdout through verbatim, and showSuccess drops the
// trailing [success] line, so the bench's final JSON line IS the final
// line of output. (Bench.scala also writes bench_queries.json as a
// file-based fallback.)
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// Shuffle/scratch I/O substrate (optimization guide §2.1: shuffle files
// ride local disk; on slow disks that — not network or compute — is the
// bound). Every shuffle map task opens+writes a data and an index file,
// reducers mmap them back, and streaming checkpoints fsync their
// offset/commit WALs; on this sandbox's ext4 root those syscalls
// dominated task CPU (jstack-sampled: map0/unmap0/open0 ≈ half the
// executor samples; measured −32% process-cpu on a 4-query subset after
// the switch). Point spark.local.dir and java.io.tmpdir at the fastest
// writable scratch: SPARK_GRAFT_SCRATCH if set, else /dev/shm when
// present (Linux), else leave the JVM defaults. On a production cluster
// the same dial is NVMe instance storage — set SPARK_GRAFT_SCRATCH.
// The tmpfs fallback is SIZE-GATED (r18 verdict finding #1): shuffle files
// and state-store deltas exist precisely because data can exceed memory, so
// a RAM-backed scratch must never be the silent default when it is small
// (Docker's default /dev/shm is 64 MB — ENOSPC mid-shuffle) or mostly full.
// 32 GiB usable ≈ 8× the bench's peak scratch footprint; below that the JVM
// defaults (disk /tmp) stay, which spill instead of dying. 100 TB contract:
// shuffle volume approaches host RAM, so ALWAYS set SPARK_GRAFT_SCRATCH to
// NVMe instance storage on a real cluster — the env var is honored as-is,
// the tmpfs default is a sandbox convenience only.
val scratchDir: Option[String] =
  sys.env.get("SPARK_GRAFT_SCRATCH").orElse {
    val shm = new java.io.File("/dev/shm")
    val usable =
      try java.nio.file.Files.getFileStore(shm.toPath).getUsableSpace
      catch { case _: Exception => 0L }
    val minUsable = 32L * 1024 * 1024 * 1024
    if (shm.isDirectory && shm.canWrite && usable >= minUsable)
      Some("/dev/shm")
    else None
  }
javaOptions ++= jdk17AddOpens ++ scratchDir.toSeq.flatMap(d =>
  Seq(s"-Dspark.local.dir=$d", s"-Djava.io.tmpdir=$d")) ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // A 181-query session generates thousands of whole-stage-codegen
  // classes; the JDK default 240 MB code cache forces the sweeper to
  // churn hot compiled methods late in the run (cpu inflation with flat
  // gc). Headroom keeps JIT output resident for the whole session.
  "-XX:ReservedCodeCacheSize=512m",
)
scalacOptions ++= Seq("-deprecation")
