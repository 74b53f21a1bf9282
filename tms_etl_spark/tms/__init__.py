"""TMS domain layer: the reference pipeline's data model re-expressed
Spark-first (SURVEY.md §1, §3.2).

- ``schema``: the 71-column positional daily/shift record.
- ``source``: partitioned CSV-lake readers (S1-S4).
- ``quality``: the data-quality predicates (P2/P3/P7).
- ``pipeline``: the canonical first query — incremental import with
  join-based MERGE and first-write-wins for powered-off shifts.
"""
