"""The reference's non-daily export datasets (SURVEY.md §1.3,
FIXTURES.md A3-A6): stop-event history, operator productivity, yarn
forecast, collection-event log — each a typed reader over the same
month-partitioned lake layout plus its natural analytic.

Only `daily/` feeds the fact table in the reference
(/root/reference/src/main_02.py:801-821); these kinds are part of the
declared data surface (`machine/`, `operator/`, `stop_history/`,
`forecast.csv`, /root/reference/src/main_02.py:392-440) and the
engine models them as first-class sources.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

STOP_HISTORY_SCHEMA = T.StructType(
    [
        T.StructField("ts_inicio", T.TimestampType()),
        T.StructField("ts_fim", T.TimestampType()),
        T.StructField("tear", T.StringType()),
        T.StructField("motivo", T.StringType()),
        T.StructField("duracao_min", T.DoubleType()),
    ]
)

OPERATOR_SCHEMA = T.StructType(
    [
        T.StructField("data", T.DateType()),
        T.StructField("operador", T.StringType()),
        T.StructField("tear", T.StringType()),
        T.StructField("turno", T.StringType()),
        T.StructField("eficiencia", T.DoubleType()),
        T.StructField("metros", T.DoubleType()),
        T.StructField("paradas", T.DoubleType()),
    ]
)

FORECAST_SCHEMA = T.StructType(
    [
        T.StructField("artigo", T.StringType()),
        T.StructField("fio", T.StringType()),
        T.StructField("estoque_kg", T.DoubleType()),
        T.StructField("previsao_kg", T.DoubleType()),
        T.StructField("mes", T.StringType()),  # TMS YYYY.MM format
    ]
)


def read_stop_history(spark: SparkSession, root: str) -> DataFrame:
    """stop_history/*.csv under each month partition
    (/root/reference/src/main_02.py:426-431)."""
    return spark.read.schema(STOP_HISTORY_SCHEMA).csv(
        f"{root}/*/stop_history/", header=True
    )


def read_operator(spark: SparkSession, root: str) -> DataFrame:
    return spark.read.schema(OPERATOR_SCHEMA).csv(
        f"{root}/*/operator/", header=True
    )


def read_forecast(spark: SparkSession, root: str) -> DataFrame:
    """forecast.csv — single file at the lake root
    (/root/reference/src/main_02.py:435-437)."""
    return spark.read.schema(FORECAST_SCHEMA).csv(
        f"{root}/forecast.csv", header=True
    )


def stop_sessions(stops: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """T5 over the stop log: merge bursty stop events into sessions
    per loom (session_window on the start time), with total stopped
    minutes — the "stoppage episode" view of the raw event log."""
    return stops.groupBy(F.session_window("ts_inicio", gap), "tear").agg(
        F.count("*").alias("n_stops"),
        F.sum(F.col("duracao_min").cast("decimal(18,4)"))
        .cast("double")
        .alias("min_total"),
    )


def operator_productivity(op: DataFrame) -> DataFrame:
    """Operator ranking: weighted efficiency and meters per operator,
    rank within shift."""
    from pyspark.sql import Window

    agg = op.groupBy("operador", "turno").agg(
        F.try_divide(
            F.sum((F.col("eficiencia") * F.col("metros")).cast("decimal(28,8)")).cast(
                "double"
            ),
            F.sum(F.col("metros").cast("decimal(18,4)")).cast("double"),
        ).alias("ef_ponderada"),
        F.sum(F.col("metros").cast("decimal(18,4)")).cast("double").alias("metros"),
    )
    w = Window.partitionBy("turno").orderBy(F.desc("metros"), "operador")
    return agg.withColumn("rank_no_turno", F.row_number().over(w))


def forecast_coverage(forecast: DataFrame) -> DataFrame:
    """Yarn coverage: stock vs forecast demand per article/month,
    months normalized from the TMS YYYY.MM format (F5/F11)."""
    return forecast.select(
        "artigo",
        "fio",
        F.translate("mes", ".", "-").alias("month"),
        "estoque_kg",
        "previsao_kg",
        F.try_divide(F.col("estoque_kg"), F.col("previsao_kg")).alias("cobertura"),
        (F.col("estoque_kg") < F.col("previsao_kg")).alias("compra_necessaria"),
    )
