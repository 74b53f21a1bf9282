"""UDF/UDAF/stateful surface (SURVEY.md §2.10, §2.9 T6).

Policy: built-in Column expressions first (U1-U3, U6 need no UDFs at
all — see quality.py / schema.py / the stack call in tms_domain).
Below are the genuinely custom pieces, each in its preferred form:

- ``weighted_avg_expr``: U5's weighted average as a pure expression —
  the production form (codegen'd, partial-aggregated).
- ``weighted_avg_udaf``: the same metric as a GROUPED_AGG pandas UDF,
  certifying the engine's custom-aggregate surface; used when the
  aggregation genuinely can't be expressed (e.g. calls a numeric
  library). Arrow-batched; whole group per call.
- ``ewma_by_key``: applyInPandasWithState custom stateful streaming
  operator (exponentially weighted running mean per key) — state is
  one float per key, bounded; works on batch via applyInPandas too.

All worker functions are closure-self-contained (own imports, no
module globals) — executors don't have the package on sys.path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def weighted_avg_expr(value: str, weight: str) -> Column:
    """U5 production form: Σ(v·w)/Σ(w), decimal-exact."""
    num = F.sum((F.col(value) * F.col(weight)).cast("decimal(28,8)")).cast("double")
    den = F.sum(F.col(weight).cast("decimal(18,4)")).cast("double")
    return num / den


def make_weighted_avg_udaf():
    """U5 UDAF form: GROUPED_AGG pandas UDF (whole group in, scalar
    out). Returns the udf object (created lazily so importing this
    module never needs pyarrow at import time)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def weighted_avg(v: pd.Series, w: pd.Series) -> float:
        den = w.sum()
        return float((v * w).sum() / den) if den else float("nan")

    weighted_avg.__annotations__ = {"v": pd.Series, "w": pd.Series, "return": float}
    return pandas_udf(weighted_avg, "double")


def ewma_by_key(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    alpha: float = 0.3,
) -> DataFrame:
    """Custom stateful operator: per-key EWMA over event order.

    Batch path: applyInPandas per key (sorts the group by ``ts``).
    The streaming path with explicit state lives in
    ``ewma_stream_by_key``. Output: key, ts, value, ewma.
    """
    schema = f"{key} long, {ts} timestamp, {value} double, ewma double"
    a = float(alpha)
    kc, tc, vc = key, ts, value

    def run(pdf):
        import pandas as _pd

        pdf = pdf.sort_values(tc)
        ew, out = None, []
        for v in pdf[vc]:
            ew = v if ew is None else a * v + (1 - a) * ew
            out.append(ew)
        return _pd.DataFrame(
            {kc: pdf[kc], tc: pdf[tc], vc: pdf[vc], "ewma": out}
        )

    return df.select(key, ts, value).groupBy(key).applyInPandas(run, schema)


def ewma_stream_by_key(
    stream: DataFrame,
    key: str,
    ts: str,
    value: str,
    alpha: float = 0.3,
):
    """T6 custom stateful streaming form: applyInPandasWithState —
    one float of state per key, carried across micro-batches. Emits
    (key, n_seen, ewma) per batch update."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{key} long, n_seen long, ewma double"
    state_schema = "n long, ewma double"
    a = float(alpha)
    kc, tc, vc = key, ts, value

    def update(key_tuple, pdfs, state: GroupState):
        import pandas as _pd

        if state.exists:
            n, ew = state.get
        else:
            n, ew = 0, None
        for pdf in pdfs:
            pdf = pdf.sort_values(tc)
            for v in pdf[vc]:
                ew = v if ew is None else a * v + (1 - a) * ew
                n += 1
        state.update((n, float(ew) if ew is not None else 0.0))
        yield _pd.DataFrame({kc: [key_tuple[0]], "n_seen": [n], "ewma": [ew]})

    return (
        stream.select(key, ts, value)
        .groupBy(key)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_stats_stream(
    stream: DataFrame,
    key: str,
    value: str,
):
    """Per-key running (count, total, max) across micro-batches via
    transformWithState — Spark 4's successor to the GroupState API
    (``ewma_stream_by_key`` keeps the legacy form for comparison).
    ValueState holds one fixed-width row per key, so state size is
    O(keys) regardless of history; emits one updated row per key per
    micro-batch in Update mode.

    Requires the RocksDB state-store provider
    (``spark.sql.streaming.stateStore.providerClass`` =
    ``...state.RocksDBStateStoreProvider``) — transformWithState is
    not supported on the default HDFS-backed provider. At scale
    RocksDB is what you want anyway: state spills off-heap and
    snapshots incrementally into the checkpoint. Runtime also needs
    ``google.protobuf`` (the state server's wire format); in
    environments without it the plan still builds (pinned by
    ``test_running_stats_stream_compiles``) but execution is gated.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    kc, vc = key, value

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "stats", "n long, total double, vmax double"
            )

        def handleInputRows(self, key_tuple, rows, timer_values):
            import pandas as _pd

            if self._state.exists():
                n, total, vmax = self._state.get()
            else:
                n, total, vmax = 0, 0.0, None
            for pdf in rows:
                vals = pdf[vc].dropna()
                if len(vals):
                    n += int(len(vals))
                    total += float(vals.sum())
                    m = float(vals.max())
                    vmax = m if vmax is None else max(vmax, m)
            self._state.update((n, total, vmax))
            yield _pd.DataFrame(
                {
                    kc: [key_tuple[0]],
                    "n_seen": [n],
                    "total": [total],
                    "vmax": [vmax],
                }
            )

        def close(self) -> None:
            pass

    return (
        stream.select(kc, vc)
        .groupBy(kc)
        .transformWithStateInPandas(
            statefulProcessor=RunningStats(),
            outputStructType=f"{kc} long, n_seen long, total double, "
            "vmax double",
            outputMode="Update",
            timeMode="None",
        )
    )


def make_status_line_udtf():
    """Python UDTF (Spark 4 table-function surface, completing the
    UDF trifecta next to the expression UDAF and the pandas
    GROUPED_AGG): one collection-log BLOB in, one row per parsed
    ``<loom> ---> <status>`` line out — so log parsing runs
    row-parallel on executors and composes in SQL via LATERAL:

        spark.udtf.register("parse_status", make_status_line_udtf())
        spark.sql("SELECT l.batch_id, s.loom, s.status "
                  "FROM logs l, LATERAL parse_status(l.log_text) s")

    Same status-marker contract as `sources/adapters.py` (reference
    tms_colector.py:209-219); unknown lines are skipped, not errors.
    """
    import re

    from pyspark.sql.functions import udtf

    pattern = re.compile(r"^(?P<loom>.+?)\s*--->\s*(?P<status>.+)$")

    @udtf(returnType="loom string, status string")
    class ParseStatusLines:
        def eval(self, log_text: str):
            for line in (log_text or "").splitlines():
                m = pattern.match(line.strip())
                if m:
                    yield m.group("loom").strip(), m.group("status").strip()

    return ParseStatusLines


def anomaly_stream_by_key(
    stream: DataFrame,
    key: str,
    ts: str,
    value: str,
    z_threshold: float = 3.0,
    min_obs: int = 10,
):
    """T6 on the MODERN state API (Spark 4 `transformWithStateInPandas`
    / StatefulProcessor, the successor to `applyInPandasWithState`):
    streaming per-key anomaly detection with Welford running moments.

    Each key carries (n, mean, M2) in a typed ValueState — O(1) state
    per key, no window buffer — and every event is z-scored against
    the statistics accumulated BEFORE it arrived (so an outlier can't
    mask itself); the state then folds the event in. Emits only the
    flagged rows (alert stream), which keeps the sink's volume
    independent of the input rate. The per-key state lives in the
    state store (RocksDB at scale) keyed by the shuffle key, so
    parallelism and fault tolerance follow the usual exactly-once
    micro-batch contract. Welford's update is used instead of naive
    sum/sumsq precisely because a long-lived stream would lose the
    variance to cancellation.

    Scale: one shuffle per micro-batch on the key (same as any
    stateful op); state size = keys x 3 doubles. `min_obs` suppresses
    alerts until the baseline has enough mass."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    kc, tc, vc = key, ts, value
    zt, mo = float(z_threshold), int(min_obs)

    class _AnomalyProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._stats = handle.getValueState(
                "stats", "n long, mean double, m2 double"
            )

        def handleInputRows(self, key_tuple, rows, timerValues):
            import math as _math

            import pandas as _pd

            if self._stats.exists():
                n, mean, m2 = self._stats.get()
            else:
                n, mean, m2 = 0, 0.0, 0.0
            out_ts, out_v, out_z = [], [], []
            for pdf in rows:
                pdf = pdf.sort_values(tc)
                for t, v in zip(pdf[tc], pdf[vc]):
                    if v is None or v != v:
                        continue
                    v = float(v)
                    if n >= mo:
                        sd = _math.sqrt(m2 / n)
                        if sd > 0.0 and abs(v - mean) / sd > zt:
                            out_ts.append(t)
                            out_v.append(v)
                            out_z.append((v - mean) / sd)
                    # Welford fold AFTER scoring
                    n += 1
                    d = v - mean
                    mean += d / n
                    m2 += d * (v - mean)
            self._stats.update((n, mean, m2))
            if out_ts:
                yield _pd.DataFrame(
                    {
                        kc: [key_tuple[0]] * len(out_ts),
                        tc: out_ts,
                        vc: out_v,
                        "zscore": out_z,
                    }
                )

        def close(self) -> None:
            pass

    out_schema = f"{kc} long, {tc} timestamp, {vc} double, zscore double"
    return (
        stream.select(kc, tc, vc)
        .groupBy(kc)
        .transformWithStateInPandas(
            _AnomalyProcessor(),
            outputStructType=out_schema,
            outputMode="append",
            timeMode="none",
        )
    )
