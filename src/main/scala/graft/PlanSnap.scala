package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.ExplainMode

/**
 * Optimization-round plan snapshotter — writes
 * `plans/<round>/<query>_<suffix>.txt` with `explain("formatted")` output
 * for the named queries, at the bench SF and bench session config, so
 * before/after plan claims in OPTIMIZATION_r14.md are checkable files
 * rather than prose. Composite queries that build stores eagerly execute
 * those builds; the captured plan is the DECLARED query's final plan (the
 * one the noop sink times last), which is where the probe-side pruning
 * story lives.
 *
 * Usage: runMain graft.PlanSnap <suffix> <name>[,<name>...] [outDir] [sfDir]
 */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val suffix = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val outDir = args.lift(2).getOrElse("/root/repo/plans/r14")
    val sfDir = args.lift(3).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        ExplainMode.fromString("formatted"))
      val p = Paths.get(outDir, s"${name}_$suffix.txt")
      Files.writeString(p, plan)
      println(s"wrote $p (${plan.linesIterator.size} lines)")
    }
    spark.stop()
  }
}
