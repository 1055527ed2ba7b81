"""External-system connectors — surface declared, availability-gated.

Kafka and lakehouse formats (Delta/Iceberg/Hudi) need connector jars that
are not in this environment (and must not be downloaded at runtime). The
builders below declare the production read surface and fail fast with an
actionable error when the classpath lacks the connector, so the engine's
API is complete while local tests assert the gating behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class ConnectorUnavailable(RuntimeError):
    pass


def _jar_present(spark: SparkSession, class_name: str) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(class_name)
        return True
    except Exception:
        return False


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Kafka topic as a streaming DataFrame (key/value binary + metadata).

    Production entry point for unbounded ingestion; requires
    spark-sql-kafka on the classpath.
    """
    if not _jar_present(
        spark, "org.apache.spark.sql.kafka010.KafkaSourceProvider"
    ):
        raise ConnectorUnavailable(
            "Kafka connector (spark-sql-kafka-0-10) is not on the classpath; "
            "submit with --packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>"
        )
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    if not _jar_present(spark, "org.apache.spark.sql.delta.DeltaLog"):
        raise ConnectorUnavailable(
            "Delta Lake is not on the classpath; submit with "
            "--packages io.delta:delta-spark_2.13:<ver>"
        )
    return spark.read.format("delta").load(path)


def read_iceberg(spark: SparkSession, table: str) -> DataFrame:
    if not _jar_present(spark, "org.apache.iceberg.spark.SparkCatalog"):
        raise ConnectorUnavailable(
            "Iceberg is not on the classpath; submit with "
            "--packages org.apache.iceberg:iceberg-spark-runtime-<ver>"
        )
    return spark.read.table(table)
