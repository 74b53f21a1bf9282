"""Data-quality predicates (SURVEY.md §2.2) as pure Column
expressions — Catalyst-visible, no UDFs (§2.10 U1/U2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def is_tear_desligado(
    data_turno: str = "DataTurno",
    funcionando: str = "Funcionando",
    parado: str = "Parado",
) -> Column:
    """P3: loom powered off for the whole last shift —
    ``DataTurno`` ends '.C' ∧ Funcionando = 0 ∧ Parado ≥ 400
    (/root/reference/src/main_01.py:439-458; shift ≈ 440 min).

    Expects typed columns (empty→0 coercion already applied); the
    borderline cases (Parado=399, Funcionando=0.1) are NOT flagged,
    matching the reference's strict comparisons.
    """
    return (
        F.col(data_turno).endswith(".C")
        & (F.col(funcionando) == 0.0)
        & (F.col(parado) >= 400.0)
    )


def is_tear_desligado_sql(qualifier: str = "source") -> str:
    """The P3 predicate as a SQL string for contexts that take
    expression TEXT (the versioned layer's
    ``merge_version(when_matched_condition=)``) — same truth as
    `is_tear_desligado`, qualified for the MERGE's source/target
    aliases. ``.`` is literal in SQL LIKE, so ``'%.C'`` is the
    endswith('.C') of the Column form."""
    q = f"{qualifier}." if qualifier else ""
    return (
        f"{q}DataTurno LIKE '%.C' AND {q}Funcionando = 0.0 "
        f"AND {q}Parado >= 400.0"
    )


SHIFT_MINUTES = 440.0  # ~440-minute shifts, /root/reference/src/main_01.py:452


def shift_minutes_violations(
    df, funcionando: str = "Funcionando", parado: str = "Parado",
    tolerance: float = 40.0,
):
    """Rows violating the shift-length invariant
    ``Funcionando + Parado ≈ 440`` (SURVEY.md §1.2): the data-quality
    screen a production import would quarantine on. Returns the
    offending rows with the computed total."""
    total = F.col(funcionando) + F.col(parado)
    return df.withColumn("__shift_total", total).where(
        (total < SHIFT_MINUTES - tolerance) | (total > SHIFT_MINUTES + tolerance)
    )
