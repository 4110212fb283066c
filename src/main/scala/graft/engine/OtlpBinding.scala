package graft.engine

/**
 * Config-gated OTLP exporter binding — the Spark-side analogue of the
 * reference's OpenTelemetry setup (reference:
 * src/iceberg_explorer/observability.py:165-211 `setup_opentelemetry`
 * builds a TracerProvider + MeterProvider over OTLP gRPC exporters
 * pointed at `settings.otel.endpoint`, 10 s periodic metric export, and
 * returns early — a no-op — when `settings.otel.enabled` is false).
 *
 * Like [[graft.catalog.IcebergCatalogBinding]], the binding is GATED on
 * the exporter SDK being loadable: this repo never links against
 * `opentelemetry-sdk` (the sandbox resolves nothing beyond build.sbt),
 * so the SDK is reached by reflection only. Without the jars — or with
 * `otel.enabled = false`, the reference's default — [[bind]] is a no-op
 * returning false and the engine keeps its in-process [[Metrics]]
 * registry, which already records the same instruments under the same
 * names. With the SDK on the classpath and the config enabled, the same
 * AppConfig tree lights up a live span pipeline: the autoconfigured SDK
 * reads [[otelProperties]], and every [[QuerySpan]] recorded by the
 * engine forwards through [[Metrics.setSpanSink]] to a real OTel span
 * carrying the reference's attribute names verbatim
 * (executor.py:181-222: `db.system`, `query.id`,
 * `query.timeout_seconds`, `query.status`, `query.duration_seconds`,
 * `query.rows_returned`).
 */
object OtlpBinding {

  /** The OTel SDK's public autoconfigure entry point (resolved by
    * reflection only — never linked). */
  val SdkClass = "io.opentelemetry.sdk.autoconfigure.AutoConfiguredOpenTelemetrySdk"

  /** Is an OTel SDK with autoconfigure on the classpath?
    * (`initialize=false`: detection must not run a foreign jar's static
    * initializers.) */
  def runtimePresent(): Boolean =
    try { Class.forName(SdkClass, false, getClass.getClassLoader); true }
    catch { case _: ClassNotFoundException => false }

  /** The SDK-autoconfigure property map for `cfg` — a pure function so
    * the spec can assert the mapping with no SDK present.
    *
    * Mirrors the reference's exporter construction: OTLP over gRPC
    * (observability.py's `OTLPSpanExporter`/`OTLPMetricExporter`
    * defaults), the configured endpoint and service name, and the
    * reference's 10 s metric export period
    * (`PeriodicExportingMetricReader(..., export_interval_millis=10000)`).
    * `insecure` maps to the spec-standard OTLP knob the gRPC exporters
    * read (`otel.exporter.otlp.insecure` ↔ the reference's
    * `insecure=True` constructor flag — plaintext transport for an
    * `http://` collector endpoint). An enabled config with a blank
    * endpoint fails fast rather than binding a dead exporter (the
    * IcebergCatalogBinding convention; the reference would instead hang
    * exports on a default that can't resolve). */
  def otelProperties(cfg: OtelConfig): Map[String, String] = {
    if (cfg.endpoint.trim.isEmpty) throw new IllegalArgumentException(
      "OTLP exporter requires a non-empty 'endpoint' configuration")
    Map(
      "otel.service.name" -> cfg.serviceName,
      "otel.exporter.otlp.endpoint" -> cfg.endpoint,
      "otel.exporter.otlp.protocol" -> "grpc",
      "otel.exporter.otlp.insecure" -> cfg.insecure.toString,
      "otel.metric.export.interval" -> "10000")
  }

  /** Bind a live OTLP span pipeline if the config enables it and the
    * SDK is present. Returns true iff a sink was installed. The
    * reflective chain is the SDK's public API:
    * `AutoConfiguredOpenTelemetrySdk.builder()
    *    .addPropertiesSupplier(() -> otelProperties(cfg))
    *    .build().getOpenTelemetrySdk().getTracer("iceberg_explorer")`,
    * then one span per recorded [[QuerySpan]] with the reference's
    * attribute set. */
  def bind(cfg: OtelConfig): Boolean =
    cfg.enabled && runtimePresent() && {
      try {
        val props = otelProperties(cfg)
        val builderCls = Class.forName(SdkClass)
        val builder = builderCls.getMethod("builder").invoke(null)
        val supplier: java.util.function.Supplier[java.util.Map[String, String]] =
          () => {
            val m = new java.util.HashMap[String, String]()
            props.foreach { case (k, v) => m.put(k, v) }
            m
          }
        builder.getClass
          .getMethod("addPropertiesSupplier", classOf[java.util.function.Supplier[_]])
          .invoke(builder, supplier)
        val auto = builder.getClass.getMethod("build").invoke(builder)
        val sdk = auto.getClass.getMethod("getOpenTelemetrySdk").invoke(auto)
        val tracer = sdk.getClass
          .getMethod("getTracer", classOf[String])
          .invoke(sdk, "iceberg_explorer")
        Metrics.setSpanSink(Some(exportSpan(tracer, _)))
        true
      } catch { case _: ReflectiveOperationException =>
        // half-present SDK (e.g. API jar without autoconfigure): stay
        // in-process rather than failing engine startup
        false
      }
    }

  /** Emit one finished [[QuerySpan]] through a reflective
    * `io.opentelemetry.api.trace.Tracer` — attribute names verbatim from
    * the reference (executor.py:181-222). Only runs when [[bind]]
    * succeeded, i.e. with a real SDK on the classpath. */
  private def exportSpan(tracer: AnyRef, qs: QuerySpan): Unit = {
    val sb = tracer.getClass
      .getMethod("spanBuilder", classOf[String]).invoke(tracer, qs.name)
    val span = sb.getClass.getMethod("startSpan").invoke(sb)
    // Span.setAttribute overloads take primitives — look up by TYPE
    def setStr(k: String, v: String): Unit = span.getClass
      .getMethod("setAttribute", classOf[String], classOf[String])
      .invoke(span, k, v)
    def setLong(k: String, v: Long): Unit = span.getClass
      .getMethod("setAttribute", classOf[String], java.lang.Long.TYPE)
      .invoke(span, k, java.lang.Long.valueOf(v))
    def setDouble(k: String, v: Double): Unit = span.getClass
      .getMethod("setAttribute", classOf[String], java.lang.Double.TYPE)
      .invoke(span, k, java.lang.Double.valueOf(v))
    setStr("db.system", "spark")
    setStr("query.id", qs.queryId)
    setLong("query.timeout_seconds", qs.timeoutSeconds.toLong)
    setStr("query.status", qs.status)
    qs.durationSeconds.foreach(setDouble("query.duration_seconds", _))
    qs.rowsReturned.foreach(setLong("query.rows_returned", _))
    span.getClass.getMethod("end").invoke(span)
  }
}
