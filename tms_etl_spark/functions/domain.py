"""Domain functions exposed to the SQL surface (SURVEY.md §2.10 U1,
U4; §2.8 F11).

Registered as SQL-callable names so `spark.sql` users get the same
semantics as the DataFrame helpers. All are thin wrappers over
Column expressions — `CREATE FUNCTION`-style registration of pure
expressions, no Python on the executor path (registration uses the
builtin-backed ``spark.sql(...)`` SQL function DDL).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def register_domain_functions(spark: SparkSession) -> None:
    """Register the TMS domain vocabulary as SQL functions:

    - ``is_desligado(data_turno, funcionando, parado)`` — P3
      (/root/reference/src/main_01.py:439-458);
    - ``shift_of_hour(h)`` — U4: hour → A/B/C shift code
      (~440-minute shifts, /root/reference/src/main_01.py:443-452);
    - ``month_dot(d)`` / ``month_dash(d)`` — the TMS month formats
      (YYYY.MM / YYYY-MM, /root/reference/src/main_02.py:399);
    - ``prev_month_start(d)`` — year-rollover-aware previous month
      (/root/reference/src/tms_exporter.py:18-29).
    """
    # SQL temporary functions via expression DDL (Spark SQL UDFs)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION is_desligado(data_turno STRING, "
        "funcionando DOUBLE, parado DOUBLE) RETURNS BOOLEAN RETURN "
        "endswith(data_turno, '.C') AND funcionando = 0.0 AND parado >= 400.0"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION shift_of_hour(h INT) RETURNS STRING "
        "RETURN CASE WHEN h < 8 THEN 'A' WHEN h < 16 THEN 'B' ELSE 'C' END"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION month_dot(d DATE) RETURNS STRING "
        "RETURN date_format(d, 'yyyy.MM')"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION month_dash(d DATE) RETURNS STRING "
        "RETURN date_format(d, 'yyyy-MM')"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION prev_month_start(d DATE) RETURNS DATE "
        "RETURN add_months(trunc(d, 'month'), -1)"
    )
