"""Domain analytics over the imported fact table (SURVEY.md §7 step 3)
— the reports a user of the reference would actually run, as
DataFrame helpers (and SQL via ``create_views``).

All inputs are the typed fact frame produced by
``tms.pipeline.import_daily`` (month-partitioned parquet).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tms_etl_spark.tms.quality import is_tear_desligado
from tms_etl_spark.tms.schema import _STOP_REASONS


def efficiency_by_loom_month(fact: DataFrame) -> DataFrame:
    """Average efficiency + production per loom per month, weighted
    by minutes running (U5's weighted-efficiency definition)."""
    num = F.sum(
        (F.col("Eficiencia") * F.col("Funcionando")).cast("decimal(28,8)")
    ).cast("double")
    den = F.sum(F.col("Funcionando").cast("decimal(18,4)")).cast("double")
    return fact.groupBy("Tear", "month").agg(
        # try_divide: a fully-stopped loom has zero running minutes
        # (ANSI mode would throw on the bare division)
        F.try_divide(num, den).alias("eficiencia_ponderada"),
        F.sum(F.col("Metros").cast("decimal(18,4)")).cast("double").alias("metros"),
        F.count("*").alias("n_turnos"),
    )


def powered_off_report(fact: DataFrame) -> DataFrame:
    """Shifts flagged powered-off (P3), with per-loom totals."""
    return (
        fact.where(is_tear_desligado())
        .groupBy("Tear")
        .agg(
            F.count("*").alias("n_turnos_desligado"),
            F.min("data").alias("primeiro"),
            F.max("data").alias("ultimo"),
        )
    )


def stop_reason_pareto(fact: DataFrame) -> DataFrame:
    """Stop-reason Pareto (U6): unpivot the 10 Qtd*/Min* pairs to
    long form with `stack`, aggregate minutes & counts per reason,
    rank by total minutes."""
    pairs = ", ".join(
        f"'{r}', Qtd{r}, Min{r}" for r in _STOP_REASONS
    )
    long = fact.selectExpr(
        f"stack({len(_STOP_REASONS)}, {pairs}) AS (motivo, qtd, minutos)"
    )
    agg = long.groupBy("motivo").agg(
        F.sum(F.col("qtd").cast("decimal(18,4)")).cast("double").alias("qtd_total"),
        F.sum(F.col("minutos").cast("decimal(18,4)"))
        .cast("double")
        .alias("min_total"),
    )
    w = Window.orderBy(F.desc("min_total"), F.asc("motivo"))
    total = Window.partitionBy()
    return agg.select(
        "*",
        F.row_number().over(w).alias("rank"),
        F.try_divide(F.col("min_total"), F.sum("min_total").over(total)).alias(
            "share"
        ),
    )


def shift_over_shift_delta(fact: DataFrame) -> DataFrame:
    """W3: efficiency delta vs the previous shift per loom."""
    w = Window.partitionBy("Tear").orderBy("data", "turno")
    prev = F.lag("Eficiencia").over(w)
    return fact.select(
        "Tear",
        "DataTurno",
        "Eficiencia",
        prev.alias("eficiencia_anterior"),
        (F.col("Eficiencia") - prev).alias("delta"),
    )


def create_views(fact: DataFrame) -> None:
    """Expose the fact table + reports to the SQL surface."""
    spark = fact.sparkSession
    fact.createOrReplaceTempView("dados_teares")
    efficiency_by_loom_month(fact).createOrReplaceTempView("eficiencia_mensal")
    powered_off_report(fact).createOrReplaceTempView("teares_desligados")
    stop_reason_pareto(fact).createOrReplaceTempView("pareto_paradas")
