package graft.engine

/**
 * Engine configuration — mirrors the reference's Settings tree
 * (reference: src/iceberg_explorer/config.py:20-149), with env-var
 * overrides under the same ICEBERG_EXPLORER_* names where they apply.
 */
final case class QueryConfig(
    maxRows: Int = 10000,        // reference declares but never enforces; we enforce
    defaultTimeout: Int = 300,   // seconds
    minTimeout: Int = 10,
    maxTimeout: Int = 3600) {
  /** Timeout clamp — operator A3
    * (reference: src/iceberg_explorer/query/executor.py:142-154). */
  def clampTimeout(requested: Option[Int]): Int =
    requested.fold(defaultTimeout)(t => math.max(minTimeout, math.min(t, maxTimeout)))
}

final case class EngineConfig(
    memoryLimit: String = "4g",  // reference DuckDB memory_limit default 4GB
    threads: Int = 4)            // reference DuckDB threads default 4

final case class ExportConfig(maxSizeBytes: Long = 1073741824L) // 1 GiB

final case class CatalogConfig(name: String = "default", warehouse: String = "")

final case class AppConfig(
    query: QueryConfig = QueryConfig(),
    engine: EngineConfig = EngineConfig(),
    export: ExportConfig = ExportConfig(),
    catalog: CatalogConfig = CatalogConfig())

object AppConfig {
  /** Defaults + environment overrides (subset actually used by the engine). */
  def fromEnv(env: Map[String, String] = sys.env): AppConfig = {
    def intEnv(k: String, dflt: Int) = env.get(k).flatMap(_.toIntOption).getOrElse(dflt)
    def longEnv(k: String, dflt: Long) = env.get(k).flatMap(_.toLongOption).getOrElse(dflt)
    AppConfig(
      query = QueryConfig(
        maxRows = intEnv("ICEBERG_EXPLORER_QUERY__MAX_ROWS", 10000),
        defaultTimeout = intEnv("ICEBERG_EXPLORER_QUERY__DEFAULT_TIMEOUT", 300),
        minTimeout = intEnv("ICEBERG_EXPLORER_QUERY__MIN_TIMEOUT", 10),
        maxTimeout = intEnv("ICEBERG_EXPLORER_QUERY__MAX_TIMEOUT", 3600)),
      engine = EngineConfig(
        memoryLimit = env.getOrElse("ICEBERG_EXPLORER_DUCKDB__MEMORY_LIMIT", "4g"),
        threads = intEnv("ICEBERG_EXPLORER_DUCKDB__THREADS", 4)),
      export = ExportConfig(
        maxSizeBytes = longEnv("ICEBERG_EXPLORER_EXPORT__MAX_SIZE_BYTES", 1073741824L)),
      catalog = CatalogConfig(
        name = env.getOrElse("ICEBERG_EXPLORER_CATALOG__NAME", "default"),
        warehouse = env.getOrElse("ICEBERG_EXPLORER_CATALOG__WAREHOUSE", "")))
  }
}
