package graft.catalog

import org.apache.spark.sql.SparkSession

import graft.engine.CatalogConfig

/**
 * Config-gated binding of a REAL Iceberg catalog into the Spark session —
 * the Spark analogue of the reference's two attachment paths
 * (reference: src/iceberg_explorer/query/engine.py:86-110 ATTACHes the
 * DuckDB iceberg extension with TYPE ICEBERG / ENDPOINT uri;
 * catalog/service.py:42-106 loads the PyIceberg REST catalog from the
 * same settings tree).
 *
 * In Spark the equivalent is catalog-plugin configuration:
 * `spark.sql.catalog.<name> = org.apache.iceberg.spark.SparkCatalog`
 * plus `type`/`uri`/credential properties — Spark instantiates the
 * plugin LAZILY on first reference to the catalog name, so the entries
 * can be applied to a live session and take effect on the next
 * `catalogManager.catalog(name)` lookup. The property names are the
 * Iceberg runtime's public Spark integration surface (type, uri,
 * warehouse, credential, token, s3.endpoint, s3.access-key-id,
 * s3.secret-access-key, client.region — mirroring the reference's
 * `_build_catalog_properties`).
 *
 * This sandbox has no `iceberg-spark-runtime` jar and no network, so the
 * binding is GATED on the plugin class being loadable: when it isn't,
 * [[providerFor]] falls back to the DSv2 session catalog (the exact
 * provider the rest of the engine already runs on), and the direct
 * metadata-JSON reader ([[IcebergMetadata]]) continues to serve
 * snapshot/spec inspection jar-free. When the runtime jar IS on the
 * classpath, the same AppConfig tree lights up the live REST catalog
 * with no code change — the SURVEY §7.2 activation path.
 */
object IcebergCatalogBinding {

  /** Iceberg's Spark catalog plugin (public class name, resolved by
    * reflection only — this repo never links against it). */
  val PluginClass = "org.apache.iceberg.spark.SparkCatalog"

  /** Is the Iceberg Spark runtime on the classpath? (`initialize=false` —
    * detection must not run static initializers of a foreign jar.) */
  def runtimePresent(): Boolean =
    try { Class.forName(PluginClass, false, getClass.getClassLoader); true }
    catch { case _: ClassNotFoundException => false }

  /** The `spark.sql.catalog.*` entries for `cfg` — a pure function so the
    * spec can assert the mapping without any Iceberg jar present.
    *
    * Mirrors the reference's property construction: REST carries
    * type/uri (+ optional warehouse/credential/token), LOCAL carries a
    * hadoop-type warehouse; S3 settings map to the FileIO property names.
    * Like the reference (`service.py:99` raises on an empty REST uri),
    * an unusable config fails fast rather than binding a dead catalog. */
  def sparkConfEntries(cfg: CatalogConfig): Map[String, String] = {
    val p = s"spark.sql.catalog.${cfg.name}"
    val typed: Map[String, String] = cfg.catalogType match {
      case "rest" =>
        if (cfg.uri.isEmpty) throw new IllegalArgumentException(
          "REST catalog requires a non-empty 'uri' configuration")
        Map(s"$p.type" -> "rest", s"$p.uri" -> cfg.uri) ++
          (if (cfg.warehouse.nonEmpty) Map(s"$p.warehouse" -> cfg.warehouse)
           else Map.empty)
      case "local" =>
        if (cfg.warehouse.isEmpty) throw new IllegalArgumentException(
          "local catalog requires a non-empty 'warehouse' configuration")
        Map(s"$p.type" -> "hadoop", s"$p.warehouse" -> cfg.warehouse)
      case other => throw new IllegalArgumentException(
        s"Unsupported catalog type: $other")
    }
    Map(p -> PluginClass) ++ typed ++
      cfg.credential.map(v => s"$p.credential" -> v) ++
      cfg.token.map(v => s"$p.token" -> v) ++
      cfg.s3.endpoint.map(v => s"$p.s3.endpoint" -> v) ++
      cfg.s3.accessKeyId.map(v => s"$p.s3.access-key-id" -> v) ++
      cfg.s3.secretAccessKey.map(v => s"$p.s3.secret-access-key" -> v) ++
      cfg.s3.region.map(v => s"$p.client.region" -> v)
  }

  /** Apply the binding to a live session if the runtime jar is present.
    * Returns true iff the catalog entries were set (the plugin itself
    * instantiates lazily on first `catalog(name)` reference). */
  def bind(spark: SparkSession, cfg: CatalogConfig): Boolean =
    runtimePresent() && {
      sparkConfEntries(cfg).foreach { case (k, v) => spark.conf.set(k, v) }
      true
    }

  /** The engine's catalog provider for this config: the bound Iceberg
    * catalog when the runtime jar is present, else the DSv2 session
    * catalog — same [[CatalogProvider]] surface either way, so callers
    * (HTTP facade, health check) never branch on the environment. */
  def providerFor(spark: SparkSession, cfg: CatalogConfig): CatalogProvider =
    if (bind(spark, cfg)) new SparkCatalogProvider(spark, Some(cfg.name))
    else new SparkCatalogProvider(spark)
}
