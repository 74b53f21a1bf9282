"""SQL-text DML front door for the versioned layer (r13 — VERDICT r12
"What's missing" #4): a minimal, strict parser for the three DML
statements a Delta/lakehouse notebook user reaches for —

    MERGE INTO <target> [AS t] USING <source> [AS s] ON t.k = s.k [AND …]
        WHEN MATCHED [AND <cond>] THEN UPDATE SET * | THEN DELETE
        [WHEN NOT MATCHED [AND <cond>] THEN INSERT *]
        [WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN DELETE
                                                | THEN UPDATE SET c = e, …]
    UPDATE <target> SET c = e[, …] WHERE <pred>
    DELETE FROM <target> WHERE <pred> [KEY (k[, …])]

— lowered onto the existing verbs (`merge_version`, `update_where`,
`delete_where`), so every execution path (copy-on-write, zonemap
pruning, CDF sidecars, optimistic concurrency) is the one the verbs
already pin. Table references are versioned-table DIRECTORIES (the
target must be one); a MERGE source may also be a plain parquet path.
The parser REFUSES anything outside the grammar with a pointed error
— a silent misparse of DML would corrupt data, so strictness is the
contract (Delta's own SQL surface is the public analog; the reference
app drives its UPDATE/INSERT branches imperatively,
/root/reference/src/main_01.py:255-305).

Alias handling learned from the r12 review: alias rewriting
(``t.`` → ``target.``) must skip quoted segments, or a string literal
containing ``t.`` would be mangled — `_rewrite_aliases` splits on
single-quote/backtick spans and touches only the code parts.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"
# a table reference: 'quoted path', `quoted path`, or a bare token
# (path-ish characters allowed so /tmp/t works unquoted)
_REF = r"(?:'[^']+'|`[^`]+`|[^\s]+)"


def _unquote(ref: str) -> str:
    ref = ref.strip()
    if len(ref) >= 2 and ref[0] == ref[-1] and ref[0] in ("'", "`"):
        return ref[1:-1]
    return ref


def _split_quoted(s: str) -> list[tuple[bool, str]]:
    """Split into (is_code, segment) parts where quoted spans
    (single-quote SQL strings with '' escapes, and backtick idents)
    are NOT code — the seam every rewrite/scan below goes through so
    literals are never touched."""
    out: list[tuple[bool, str]] = []
    i, n, start = 0, len(s), 0
    while i < n:
        c = s[i]
        if c == "'" or c == "`":
            if i > start:
                out.append((True, s[start:i]))
            j = i + 1
            while j < n:
                if s[j] == c:
                    if c == "'" and j + 1 < n and s[j + 1] == "'":
                        j += 2  # '' escape inside a string literal
                        continue
                    break
                j += 1
            if j >= n:
                raise ValueError(f"unterminated {c} quote in {s!r}")
            out.append((False, s[i : j + 1]))
            start = j + 1
            i = j + 1
        else:
            i += 1
    if start < n:
        out.append((True, s[start:]))
    return out


def _rewrite_aliases(expr: str, t_alias: str, s_alias: str | None) -> str:
    """``<t_alias>.`` → ``target.`` and ``<s_alias>.`` → ``source.``
    in the CODE segments only (quoted literals pass through)."""
    parts = []
    for is_code, seg in _split_quoted(expr):
        if is_code:
            seg = re.sub(
                rf"\b{re.escape(t_alias)}\s*\.", "target.", seg,
                flags=re.IGNORECASE,
            )
            if s_alias:
                seg = re.sub(
                    rf"\b{re.escape(s_alias)}\s*\.", "source.", seg,
                    flags=re.IGNORECASE,
                )
        parts.append(seg)
    return "".join(parts)


def _find_kw(s: str, kw: str, start: int = 0) -> int:
    """Index of the first CODE-segment occurrence of the (multi-word)
    keyword, -1 if absent. Case-insensitive, word-bounded."""
    pat = re.compile(
        r"\b" + r"\s+".join(re.escape(w) for w in kw.split()) + r"\b",
        re.IGNORECASE,
    )
    pos = 0
    for is_code, seg in _split_quoted(s):
        if is_code and pos + len(seg) > start:
            m = pat.search(seg, max(0, start - pos))
            if m:
                return pos + m.start()
        pos += len(seg)
    return -1


def _split_top(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` at paren depth 0, outside quotes."""
    out, buf, depth = [], [], 0
    for is_code, seg in _split_quoted(s):
        if not is_code:
            buf.append(seg)
            continue
        for ch in seg:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch == sep and depth == 0:
                out.append("".join(buf))
                buf = []
            else:
                buf.append(ch)
    out.append("".join(buf))
    return [p.strip() for p in out if p.strip()]


def _parse_assignments(s: str) -> dict[str, str]:
    """``c1 = e1, c2 = e2`` → {c1: e1} — the first depth-0 ``=`` of
    each comma part splits column from expression."""
    out: dict[str, str] = {}
    for part in _split_top(s, ","):
        # first depth-0 '=' outside quotes, not part of <=, >=, !=, ==
        idx, depth, pos = -1, 0, 0
        for is_code, seg in _split_quoted(part):
            if is_code:
                for k, ch in enumerate(seg):
                    if ch == "(":
                        depth += 1
                    elif ch == ")":
                        depth -= 1
                    elif ch == "=" and depth == 0:
                        prev = seg[k - 1] if k else ""
                        nxt = seg[k + 1] if k + 1 < len(seg) else ""
                        if prev in "<>!=" or nxt == "=":
                            continue
                        idx = pos + k
                        break
            if idx >= 0:
                break
            pos += len(seg)
        if idx < 0:
            raise ValueError(f"bad SET assignment {part!r} (want col = expr)")
        col, expr = part[:idx].strip(), part[idx + 1 :].strip()
        if not re.fullmatch(_IDENT, _unquote(col)):
            raise ValueError(f"bad SET column {col!r}")
        if not expr:
            raise ValueError(f"empty SET expression for {col!r}")
        out[_unquote(col)] = expr
    if not out:
        raise ValueError("SET needs at least one assignment")
    return out


_KW_SCAN = re.compile(r"\b(CASE|END|WHEN|THEN)\b", re.IGNORECASE)


def _top_keyword_positions(s: str) -> list[tuple[int, str]]:
    """(position, WORD) for every WHEN/THEN OUTSIDE any CASE … END
    span (and outside quotes) — the clause-boundary scanner. A CASE
    expression inside a condition or SET expression must not split
    the MERGE's WHEN clauses (r13 review finding)."""
    out: list[tuple[int, str]] = []
    depth = 0
    pos = 0
    for is_code, seg in _split_quoted(s):
        if is_code:
            for m in _KW_SCAN.finditer(seg):
                w = m.group(1).upper()
                if w == "CASE":
                    depth += 1
                elif w == "END":
                    depth = max(0, depth - 1)
                elif depth == 0:
                    out.append((pos + m.start(), w))
        pos += len(seg)
    return out


def _is_versioned_dir(path: str) -> bool:
    return os.path.isdir(os.path.join(path, "_manifests"))


def _load_source(spark: SparkSession, ref: str) -> DataFrame:
    """A MERGE source: versioned table dir (snapshot read) or plain
    parquet path."""
    from tms_etl_spark.operators.versioned import read_version

    path = _unquote(ref)
    if _is_versioned_dir(path):
        return read_version(spark, path)
    if os.path.exists(path):
        return spark.read.parquet(path)
    raise ValueError(
        f"MERGE source {path!r} is neither a versioned table dir nor "
        "an existing parquet path"
    )


def _target_dir(ref: str) -> str:
    path = _unquote(ref)
    if not _is_versioned_dir(path):
        raise ValueError(
            f"DML target {path!r} is not a versioned table dir (no "
            "_manifests/) — only versioned tables take SQL DML"
        )
    return path


def _parse_on_keys(on: str, t_alias: str, s_alias: str) -> list[str]:
    """ON must be a conjunction of same-named equi-joins
    (``t.c = s.c``) — that is what `merge_version` keys mean. Any
    other shape refuses."""
    keys: list[str] = []
    for conj in re.split(r"\bAND\b", on, flags=re.IGNORECASE):
        m = re.fullmatch(
            rf"\s*({_IDENT})\s*\.\s*({_IDENT})\s*=\s*"
            rf"({_IDENT})\s*\.\s*({_IDENT})\s*",
            conj,
        )
        if not m:
            raise ValueError(
                f"unsupported ON conjunct {conj.strip()!r} — want "
                f"{t_alias}.col = {s_alias}.col"
            )
        a1, c1, a2, c2 = m.groups()
        pair = {a1.lower(): c1, a2.lower(): c2}
        if set(pair) != {t_alias.lower(), s_alias.lower()} or (
            pair[t_alias.lower()] != pair[s_alias.lower()]
        ):
            raise ValueError(
                f"unsupported ON conjunct {conj.strip()!r} — MERGE "
                "keys must be same-named columns equated across the "
                "two aliases"
            )
        keys.append(pair[t_alias.lower()])
    return keys


def sql_dml(
    spark: SparkSession,
    sql: str,
    key: str | list[str] | None = None,
    txn_id: str | None = None,
    commit_retries: int = 0,
) -> int:
    """Execute ONE DML statement (grammar in the module docstring)
    against a versioned table and return the committed version.
    ``key`` backs DELETE's vector key when the statement has no
    ``KEY (…)`` suffix; MERGE/UPDATE ignore it."""
    from tms_etl_spark.operators.versioned import (
        delete_where,
        merge_version,
        update_where,
    )

    stmt = sql.strip().rstrip(";").strip()
    head = stmt.split(None, 1)[0].upper() if stmt else ""

    if head == "UPDATE":
        m = re.match(rf"UPDATE\s+(?P<t>{_REF})\s+SET\s+", stmt, re.IGNORECASE)
        if not m:
            raise ValueError("want: UPDATE <table_dir> SET c = e[, …] WHERE <pred>")
        rest = stmt[m.end() :]
        wi = _find_kw(rest, "WHERE")
        if wi < 0:
            raise ValueError(
                "UPDATE requires a WHERE clause (a full-table update "
                "should say WHERE true explicitly)"
            )
        assign = _parse_assignments(rest[:wi])
        pred = rest[wi + len("WHERE") :].strip()
        if not pred:
            raise ValueError("empty WHERE predicate")
        return update_where(
            spark,
            _target_dir(m.group("t")),
            pred,
            assign,
            txn_id=txn_id,
            commit_retries=commit_retries,
        )

    if head == "DELETE":
        m = re.match(
            rf"DELETE\s+FROM\s+(?P<t>{_REF})\s+WHERE\s+(?P<rest>.*)",
            stmt,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError(
                "want: DELETE FROM <table_dir> WHERE <pred> [KEY (k[, …])]"
            )
        rest = m.group("rest")
        # the KEY (…) suffix must anchor at the END of the statement:
        # a predicate may legitimately reference a column named "key"
        # (r13 review finding), so only a trailing, fully-formed
        # KEY (cols) span is the suffix — anything else stays in the
        # predicate
        dkey = key
        ki = _find_kw(rest, "KEY")
        while ki >= 0:
            km = re.fullmatch(
                r"KEY\s*\(\s*(?P<cols>[^)]+)\)\s*",
                rest[ki:],
                re.IGNORECASE,
            )
            if km:
                dkey = [c.strip() for c in km.group("cols").split(",")]
                rest = rest[:ki]
                break
            ki = _find_kw(rest, "KEY", ki + 1)
        pred = rest.strip()
        if not pred:
            raise ValueError("empty WHERE predicate")
        if not dkey:
            raise ValueError(
                "DELETE lowers onto a key-level deletion vector — name "
                "the key: a KEY (col[, …]) suffix or the key= argument"
            )
        return delete_where(
            spark,
            _target_dir(m.group("t")),
            pred,
            dkey if isinstance(dkey, list) and len(dkey) > 1 else (
                dkey[0] if isinstance(dkey, list) else dkey
            ),
            txn_id=txn_id,
            commit_retries=commit_retries,
        )

    if head == "MERGE":
        m = re.match(
            rf"MERGE\s+INTO\s+(?P<t>{_REF})(?:\s+AS)?\s+(?P<ta>{_IDENT})\s+"
            rf"USING\s+(?P<s>{_REF})(?:\s+AS)?\s+(?P<sa>{_IDENT})\s+"
            rf"ON\s+",
            stmt,
            re.IGNORECASE,
        )
        if not m:
            raise ValueError(
                "want: MERGE INTO <table_dir> [AS] t USING <source> "
                "[AS] s ON t.k = s.k [AND …] WHEN …"
            )
        ta, sa = m.group("ta"), m.group("sa")
        if ta.upper() in ("USING", "ON") or sa.upper() == "ON":
            raise ValueError("MERGE target and source need aliases")
        if ta.lower() == sa.lower():
            raise ValueError(
                f"MERGE target and source share the alias {ta!r} — "
                "every qualified reference would be ambiguous; use "
                "distinct aliases"
            )
        rest = stmt[m.end() :]
        # clause boundaries via the CASE-aware scanner: a CASE WHEN …
        # THEN … END inside a condition or SET expression must not
        # split the MERGE's clauses (r13 review finding)
        tops = _top_keyword_positions(rest)
        when_ps = [p for p, w in tops if w == "WHEN"]
        if not when_ps:
            raise ValueError("MERGE needs at least one WHEN clause")
        keys = _parse_on_keys(rest[: when_ps[0]], ta, sa)
        spans = list(zip(when_ps, when_ps[1:] + [len(rest)]))
        matched_action = None  # ("update"|"delete", cond)
        insert_clause = None  # cond (or "" for unconditional)
        nmbs_action = None  # ("delete"|"update", cond, set)
        for a, b in spans:
            cl = rest[a:b].strip()
            km = re.match(
                r"WHEN\s+(?P<kind>MATCHED|NOT\s+MATCHED"
                r"(?:\s+BY\s+SOURCE)?)\s*",
                cl,
                re.IGNORECASE,
            )
            if not km:
                raise ValueError(f"unsupported WHEN clause {cl!r}")
            then_ps = [
                p for p, w in tops if w == "THEN" and a <= p < b
            ]
            if not then_ps:
                raise ValueError(f"WHEN clause without THEN: {cl!r}")
            tp = then_ps[0] - a  # clause-relative
            kind = re.sub(r"\s+", " ", km.group("kind").upper())
            between = cl[km.end() : tp].strip()
            cond = None
            if between:
                am = re.match(r"AND\b", between, re.IGNORECASE)
                if not am:
                    raise ValueError(
                        f"unsupported WHEN clause {cl!r} (want WHEN "
                        f"{kind} [AND <cond>] THEN …)"
                    )
                cond = between[am.end() :].strip()
                if not cond:
                    raise ValueError(f"empty AND condition in {cl!r}")
            action = cl[tp + len("THEN") :].strip()
            if kind == "MATCHED":
                if matched_action is not None:
                    raise ValueError("multiple WHEN MATCHED clauses")
                if re.fullmatch(
                    r"UPDATE\s+SET\s+\*", action, re.IGNORECASE
                ):
                    matched_action = ("update", cond)
                elif re.fullmatch(r"DELETE", action, re.IGNORECASE):
                    matched_action = ("delete", cond)
                else:
                    raise ValueError(
                        f"unsupported MATCHED action {action!r} (want "
                        "UPDATE SET * or DELETE — merge_version "
                        "replaces the whole row)"
                    )
            elif kind == "NOT MATCHED":
                if insert_clause is not None:
                    raise ValueError("multiple WHEN NOT MATCHED clauses")
                if not re.fullmatch(r"INSERT\s+\*", action, re.IGNORECASE):
                    raise ValueError(
                        f"unsupported NOT MATCHED action {action!r} "
                        "(want INSERT *)"
                    )
                insert_clause = cond or ""
            else:  # NOT MATCHED BY SOURCE
                if nmbs_action is not None:
                    raise ValueError(
                        "multiple WHEN NOT MATCHED BY SOURCE clauses"
                    )
                if re.fullmatch(r"DELETE", action, re.IGNORECASE):
                    nmbs_action = ("delete", cond, None)
                else:
                    um = re.fullmatch(
                        r"UPDATE\s+SET\s+(?P<sets>.+)",
                        action,
                        re.IGNORECASE | re.DOTALL,
                    )
                    if not um:
                        raise ValueError(
                            "unsupported NOT MATCHED BY SOURCE action "
                            f"{action!r} (want DELETE or UPDATE SET "
                            "c = e, …)"
                        )
                    nmbs_action = (
                        "update",
                        cond,
                        {
                            c: _rewrite_aliases(e, ta, sa)
                            for c, e in _parse_assignments(
                                um.group("sets")
                            ).items()
                        },
                    )
        if matched_action is None and insert_clause is None:
            raise ValueError(
                "MERGE needs WHEN MATCHED and/or WHEN NOT MATCHED"
            )
        when_matched = (
            matched_action[0] if matched_action else "update"
        )
        if when_matched == "delete" and insert_clause is not None:
            raise ValueError(
                "WHEN MATCHED THEN DELETE cannot combine with WHEN "
                "NOT MATCHED THEN INSERT (split into two statements)"
            )
        wm_cond = None
        if matched_action and matched_action[1]:
            wm_cond = _rewrite_aliases(matched_action[1], ta, sa)
        elif matched_action is None:
            # INSERT-only merge: matched rows keep the target row
            wm_cond = "false"
        wnm_cond = None
        if insert_clause:
            wnm_cond = _rewrite_aliases(insert_clause, ta, sa)
        elif insert_clause is None and when_matched == "update":
            # no NOT MATCHED clause: unmatched source rows do NOT
            # insert (Delta semantics; merge_version inserts by
            # default, so suppress)
            wnm_cond = "false"
        return merge_version(
            spark,
            _target_dir(m.group("t")),
            _load_source(spark, m.group("s")),
            keys if len(keys) > 1 else keys[0],
            when_matched=when_matched,
            txn_id=txn_id,
            when_matched_condition=wm_cond,
            when_not_matched_condition=wnm_cond,
            when_not_matched_by_source=(
                nmbs_action[0] if nmbs_action else None
            ),
            when_not_matched_by_source_condition=(
                _rewrite_aliases(nmbs_action[1], ta, sa)
                if nmbs_action and nmbs_action[1]
                else None
            ),
            when_not_matched_by_source_set=(
                nmbs_action[2] if nmbs_action else None
            ),
            commit_retries=commit_retries,
        )

    raise ValueError(
        f"unsupported DML statement {head or sql!r} — sql_dml takes "
        "MERGE INTO / UPDATE / DELETE FROM"
    )
