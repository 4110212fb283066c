package graft.engine

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession

/**
 * Session construction and engine health — operators A6/A8
 * (reference: src/iceberg_explorer/query/engine.py:60-211).
 *
 * The reference opens one in-memory DuckDB with `SET memory_limit` /
 * `SET threads` and ATTACHes an Iceberg catalog; the Spark equivalent is
 * a local[threads] session with AQE on and a catalog registration hook.
 * On a real cluster the same builder config (minus master) applies —
 * shuffle partitions sized to cores, UTC session timezone for oracle
 * parity, adaptive execution for skew/coalesce at scale.
 */
object GraftEngine {

  def buildSession(config: AppConfig = AppConfig.fromEnv(), appName: String = "graft"): SparkSession = {
    val threads = config.engine.threads
    // observability first, like the reference's setup_opentelemetry on
    // app startup: a no-op unless otel.enabled AND the SDK is present
    // (OtlpBinding scaladoc; reference observability.py:183-186)
    OtlpBinding.bind(config.otel)
    SparkSession.builder()
      .master(s"local[$threads]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", config.engine.memoryLimit)
      // A serving engine compiles codegen stages for every distinct query
      // shape it hosts; the default 100-entry generated-class cache thrashes
      // once the workload exceeds ~30 distinct queries and each re-arrival
      // pays a full Janino recompile (seconds for wide projections).
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .getOrCreate()
  }

  /**
   * Health check — engine liveness (`SELECT 1`) then catalog reachability,
   * rolled up to healthy/degraded like the reference
   * (reference: engine.py:166-211, api/routes/health.py:44-93).
   */
  def healthCheck(spark: SparkSession): Map[String, String] = {
    val engineOk =
      try { spark.sql("SELECT 1").collect().length == 1 }
      catch { case NonFatal(_) => false }
    val catalogOk =
      try { spark.catalog.listDatabases().take(1); true }
      catch { case NonFatal(_) => false }
    Map(
      "engine" -> (if (engineOk) "healthy" else "unhealthy"),
      "catalog" -> (if (catalogOk) "healthy" else "unhealthy"),
      "status" -> ((engineOk, catalogOk) match {
        case (true, true) => "healthy"
        case (true, false) => "degraded"
        case _ => "unhealthy"
      }))
  }
}
