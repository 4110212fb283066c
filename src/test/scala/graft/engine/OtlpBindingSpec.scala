package graft.engine

import org.scalatest.funsuite.AnyFunSuite

/** Config-gated OTLP exporter binding (VERDICT r5 task 7; reference:
  * src/iceberg_explorer/observability.py:165-211 setup_opentelemetry,
  * config.py:117-131 OTelConfig). The sandbox has no OTel SDK jars, so
  * these specs pin (a) the pure config→SDK-property mapping, (b) the
  * ICEBERG_EXPLORER_OTEL__* env tree, and (c) the clean no-op fallback —
  * disabled config or absent SDK leaves the in-process Metrics registry
  * as the only recorder, exactly like the reference's
  * `if not settings.otel.enabled: return`. */
class OtlpBindingSpec extends AnyFunSuite {

  test("otelProperties: endpoint/service/protocol/insecure/interval mapping") {
    val m = OtlpBinding.otelProperties(OtelConfig(enabled = true,
      endpoint = "http://collector:4317", serviceName = "svc",
      insecure = false))
    assert(m === Map(
      "otel.service.name" -> "svc",
      "otel.exporter.otlp.endpoint" -> "http://collector:4317",
      "otel.exporter.otlp.protocol" -> "grpc",
      "otel.exporter.otlp.insecure" -> "false",
      "otel.metric.export.interval" -> "10000"))
  }

  test("otelProperties: defaults mirror the reference's OTelConfig") {
    val m = OtlpBinding.otelProperties(OtelConfig())
    assert(m("otel.exporter.otlp.endpoint") === "http://localhost:4317")
    assert(m("otel.service.name") === "iceberg-explorer")
    assert(m("otel.exporter.otlp.insecure") === "true")
  }

  test("otelProperties: blank endpoint fails fast") {
    intercept[IllegalArgumentException](
      OtlpBinding.otelProperties(OtelConfig(endpoint = "  ")))
  }

  test("fromEnv reads the ICEBERG_EXPLORER_OTEL__* tree") {
    val cfg = AppConfig.fromEnv(Map(
      "ICEBERG_EXPLORER_OTEL__ENABLED" -> "Yes",
      "ICEBERG_EXPLORER_OTEL__ENDPOINT" -> "http://otel:4317",
      "ICEBERG_EXPLORER_OTEL__SERVICE_NAME" -> "graft-prod",
      "ICEBERG_EXPLORER_OTEL__INSECURE" -> "0")).otel
    assert(cfg === OtelConfig(enabled = true, endpoint = "http://otel:4317",
      serviceName = "graft-prod", insecure = false))
  }

  test("fromEnv: defaults off; malformed bool falls back to default") {
    assert(AppConfig.fromEnv(Map.empty).otel === OtelConfig())
    assert(!AppConfig.fromEnv(
      Map("ICEBERG_EXPLORER_OTEL__ENABLED" -> "maybe")).otel.enabled)
  }

  test("bind is a no-op without the SDK or when disabled") {
    Metrics.reset()
    // disabled: short-circuits before any classpath probe
    assert(!OtlpBinding.bind(OtelConfig(enabled = false)))
    assert(!Metrics.spanSinkInstalled)
    // enabled but the SDK isn't on this classpath: still a clean no-op
    assert(!OtlpBinding.runtimePresent(),
      "sandbox unexpectedly has an OTel SDK — spec assumptions changed")
    assert(!OtlpBinding.bind(OtelConfig(enabled = true)))
    assert(!Metrics.spanSinkInstalled)
    // recording spans with no sink stays purely in-process
    Metrics.recordSpan(QuerySpan("spark.query", "q1", 300, "completed",
      Some(0.5), Some(10L), "OK", None))
    assert(Metrics.recentSpans.map(_.queryId) === Seq("q1"))
    Metrics.reset()
  }

  test("a bound sink receives every recorded span; failures are swallowed") {
    Metrics.reset()
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    Metrics.setSpanSink(Some(s => {
      seen += s.queryId
      if (s.queryId == "boom") sys.error("exporter down")
    }))
    assert(Metrics.spanSinkInstalled)
    Metrics.recordSpan(QuerySpan("spark.query", "a", 300, "completed",
      None, None, "OK", None))
    Metrics.recordSpan(QuerySpan("spark.query", "boom", 300, "failed",
      None, None, "ERROR", Some("x")))
    Metrics.recordSpan(QuerySpan("spark.query", "b", 300, "completed",
      None, None, "OK", None))
    assert(seen.toSeq === Seq("a", "boom", "b"))
    // the ring kept all three even though the sink threw on one
    assert(Metrics.recentSpans.map(_.queryId) === Seq("a", "boom", "b"))
    Metrics.reset()
    assert(!Metrics.spanSinkInstalled, "reset must clear the sink")
  }
}
