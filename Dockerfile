# syntax=docker/dockerfile:1.4
# Deploy parity with the reference's two-stage image
# (/root/reference/Dockerfile): build the assembly, run it thin.
# The runtime image is a spark-submit-ready driver container; on a
# cluster you'd spark-submit the same jar instead of java -jar.

# Stage 1: build the library + CLI jar with sbt
FROM eclipse-temurin:17-jdk AS builder

WORKDIR /app

# sbt launcher (no sbt in base image)
RUN apt-get update && apt-get install -y --no-install-recommends curl \
 && curl -fsSL https://github.com/sbt/sbt/releases/download/v1.10.0/sbt-1.10.0.tgz \
    | tar -xz -C /usr/local \
 && ln -s /usr/local/sbt/bin/sbt /usr/local/bin/sbt \
 && rm -rf /var/lib/apt/lists/*

COPY build.sbt ./
COPY project ./project
RUN sbt update

COPY src ./src
RUN sbt package

# Stage 2: runtime — Spark on JRE, driver-mode ingestor
FROM eclipse-temurin:17-jre

WORKDIR /app

# Spark runtime jars are expected mounted or baked at /opt/spark/jars
# (the same unmanaged-classpath layout the build uses)
COPY --from=builder /app/target/scala-2.13/*.jar ./graft.jar

# /metrics scrape surface (reference: internal/metrics/metrics.go:40-57)
EXPOSE 8080

# Same env-var surface as the reference CLI (cmd/root.go:62-97):
# MODE, EVENT_RATE, INGESTION_DURATION, REDPANDA_BROKERS, TOPIC,
# GROUP_ID, CLICKHOUSE_HOST/DB/TABLE/USER/PASSWORD, METRICS_PORT,
# OTEL_EXPORTER_OTLP_ENDPOINT
ENTRYPOINT ["java", "-cp", "graft.jar:/opt/spark/jars/*", "graft.IngestorCli"]
