package graft.catalog

import graft.SparkSuite
import graft.engine.{CatalogConfig, S3Config}

/** Config-gated Iceberg catalog binding (SURVEY §7.2 impl #3; reference:
  * src/iceberg_explorer/query/engine.py:86-110 ATTACH,
  * catalog/service.py:42-106 property construction). The sandbox has no
  * iceberg-spark-runtime jar, so these specs pin (a) the pure
  * config→spark-conf mapping and (b) the clean fallback to the DSv2
  * session catalog when the plugin class is absent. */
class IcebergCatalogBindingSpec extends SparkSuite {

  test("sparkConfEntries: REST carries plugin/type/uri + optional auth/s3") {
    val cfg = CatalogConfig(name = "prod", catalogType = "rest",
      uri = "http://rest:8181", warehouse = "s3://wh",
      credential = Some("cid:secret"), token = Some("tok"),
      s3 = S3Config(endpoint = Some("http://minio:9000"),
        accessKeyId = Some("ak"), secretAccessKey = Some("sk"),
        region = Some("us-east-1")))
    val m = IcebergCatalogBinding.sparkConfEntries(cfg)
    assert(m("spark.sql.catalog.prod") === IcebergCatalogBinding.PluginClass)
    assert(m("spark.sql.catalog.prod.type") === "rest")
    assert(m("spark.sql.catalog.prod.uri") === "http://rest:8181")
    assert(m("spark.sql.catalog.prod.warehouse") === "s3://wh")
    assert(m("spark.sql.catalog.prod.credential") === "cid:secret")
    assert(m("spark.sql.catalog.prod.token") === "tok")
    assert(m("spark.sql.catalog.prod.s3.endpoint") === "http://minio:9000")
    assert(m("spark.sql.catalog.prod.s3.access-key-id") === "ak")
    assert(m("spark.sql.catalog.prod.s3.secret-access-key") === "sk")
    assert(m("spark.sql.catalog.prod.client.region") === "us-east-1")
  }

  test("sparkConfEntries: minimal REST config has no optional entries") {
    val m = IcebergCatalogBinding.sparkConfEntries(CatalogConfig())
    assert(m === Map(
      "spark.sql.catalog.default" -> IcebergCatalogBinding.PluginClass,
      "spark.sql.catalog.default.type" -> "rest",
      "spark.sql.catalog.default.uri" -> "http://localhost:8181"))
  }

  test("sparkConfEntries: local maps to a hadoop-type warehouse catalog") {
    val m = IcebergCatalogBinding.sparkConfEntries(CatalogConfig(
      name = "wh", catalogType = "local", warehouse = "/data/warehouse"))
    assert(m === Map(
      "spark.sql.catalog.wh" -> IcebergCatalogBinding.PluginClass,
      "spark.sql.catalog.wh.type" -> "hadoop",
      "spark.sql.catalog.wh.warehouse" -> "/data/warehouse"))
  }

  test("sparkConfEntries: unusable configs fail fast (reference parity)") {
    // reference: service.py raises on an empty REST uri; unsupported
    // catalog types raise rather than bind a dead catalog
    intercept[IllegalArgumentException](IcebergCatalogBinding
      .sparkConfEntries(CatalogConfig(catalogType = "rest", uri = "")))
    intercept[IllegalArgumentException](IcebergCatalogBinding
      .sparkConfEntries(CatalogConfig(catalogType = "local", warehouse = "")))
    intercept[IllegalArgumentException](IcebergCatalogBinding
      .sparkConfEntries(CatalogConfig(catalogType = "hive")))
  }

  test("jar-less sandbox: no runtime, bind declines, provider falls back") {
    assert(!IcebergCatalogBinding.runtimePresent())
    assert(!IcebergCatalogBinding.bind(spark, CatalogConfig()))
    // fallback provider is the session-catalog DSv2 provider and works
    val p = IcebergCatalogBinding.providerFor(spark, CatalogConfig())
    assert(p.isInstanceOf[SparkCatalogProvider])
    assert(p.listNamespaces().nonEmpty)
    // and the declined bind left no spark.sql.catalog.default entry behind
    assert(spark.conf.getOption("spark.sql.catalog.default").isEmpty)
  }
}
