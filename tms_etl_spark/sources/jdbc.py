"""JDBC upsert sink (SURVEY.md S8 — the reference's literal target
was MariaDB `tblDadosTeares` via per-row probe+write,
/root/reference/src/main_01.py:235-305).

The engine's primary MERGE strategy is the join-based one in
``operators.merge`` (parquet lake). This module completes the S8
surface for deployments whose serving store is a SQL database:
distributed batched writes into a staging table, then ONE server-side
upsert statement — never a per-row round-trip from the driver.

Connectivity is deployment-provided (JDBC driver jar on the
classpath); SQL generation is pure and unit-tested offline.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def upsert_sql(
    table: str, staging: str, columns: Sequence[str], keys: Sequence[str],
    dialect: str = "mysql",
) -> str:
    """Server-side MERGE statement applying staging → target.

    mysql/mariadb: INSERT ... ON DUPLICATE KEY UPDATE (the reference's
    store); postgres: INSERT ... ON CONFLICT DO UPDATE; ansi: MERGE.
    """
    cols = ", ".join(columns)
    if dialect in ("mysql", "mariadb"):
        updates = ", ".join(
            f"{c} = VALUES({c})" for c in columns if c not in keys
        )
        return (
            f"INSERT INTO {table} ({cols}) SELECT {cols} FROM {staging} "
            f"ON DUPLICATE KEY UPDATE {updates}"
        )
    if dialect == "postgres":
        conflict = ", ".join(keys)
        updates = ", ".join(
            f"{c} = EXCLUDED.{c}" for c in columns if c not in keys
        )
        return (
            f"INSERT INTO {table} ({cols}) SELECT {cols} FROM {staging} "
            f"ON CONFLICT ({conflict}) DO UPDATE SET {updates}"
        )
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    updates = ", ".join(f"t.{c} = s.{c}" for c in columns if c not in keys)
    inserts = ", ".join(f"s.{c}" for c in columns)
    return (
        f"MERGE INTO {table} t USING {staging} s ON {on} "
        f"WHEN MATCHED THEN UPDATE SET {updates} "
        f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({inserts})"
    )


def write_jdbc_upsert(
    df: DataFrame,
    url: str,
    table: str,
    keys: Sequence[str],
    properties: dict | None = None,
    dialect: str = "mysql",
    batchsize: int = 10_000,
) -> str:
    """Distributed upsert into a JDBC store: executors append into
    ``<table>__staging`` in parallel (batched inserts), then the
    driver issues one server-side upsert + cleanup. Returns the
    upsert SQL it executed (or would execute), for auditability.

    Raises whatever the JDBC layer raises if no driver jar is
    present — connectivity is a deployment concern, the plan shape is
    the engine's.
    """
    staging = f"{table}__staging"
    sql = upsert_sql(staging=staging, table=table, columns=df.columns, keys=keys,
                     dialect=dialect)
    (
        df.write.mode("overwrite")
        .option("batchsize", batchsize)
        .option("truncate", "true")
        .jdbc(url, staging, properties=properties or {})
    )
    # one statement server-side; java.sql via the driver's JVM
    jvm = df.sparkSession._sc._jvm
    props = jvm.java.util.Properties()
    for k, v in (properties or {}).items():
        props.setProperty(k, v)
    conn = jvm.java.sql.DriverManager.getConnection(url, props)
    try:
        st = conn.createStatement()
        st.execute(sql)
        st.execute(f"DROP TABLE {staging}")
    finally:
        conn.close()
    return sql
