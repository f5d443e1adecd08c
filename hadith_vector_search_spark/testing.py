"""Shared oracle-comparison helpers used by tests and scripts/check_correctness.

Mirrors the driver's t2 gate *exactly enough that local green implies driver
green* (the round-1 failure mode was a laxer local canon):

- both sides go through a pandas round-trip (``toPandas()`` / ``rel.df()``),
  like the driver;
- floats are canonicalized at FULL precision (``repr``), so a DuckDB
  HUGEINT-sum that arrives as float64 (``149174.0``) no longer matches a
  Spark bigint (``149174``) — the driver hashes full-precision values;
- list/array/dict cells raise immediately: the driver's pandas
  ``sort_values`` canonicalizer crashes on unhashable cells and aborts the
  whole run, so any raw ``array<...>`` result column must be caught here.
"""

from __future__ import annotations

import datetime as _dt
import math
import os

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


class UnhashableCellError(TypeError):
    """A result cell the driver's pandas canonicalizer cannot sort/hash."""


def canon_cell(v) -> str:
    """Full-precision canonical string for one result cell.

    Ints and floats canonicalize DIFFERENTLY on purpose (``149174`` vs
    ``149174.0``) — that distinction is exactly what the driver's
    full-precision hash sees and what round 1's ``%.9g`` canon missed.
    """
    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, (list, tuple, set, dict, np.ndarray)):
        raise UnhashableCellError(
            f"result cell of type {type(v).__name__} — the driver's pandas "
            "canonicalizer crashes on list-typed columns; explode arrays to "
            "(id, dim, value) rows or to_json them")
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        if f == 0.0:
            f = 0.0  # normalize -0.0
        return repr(f)
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return _dt.datetime(v.year, v.month, v.day).isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def canon_frame(pdf) -> list[str]:
    """Canonical sorted row-strings for a pandas DataFrame: columns sorted by
    name (the driver sorts columns before hashing), then rows sorted by their
    canonical string."""
    import pandas as pd

    cols = sorted(pdf.columns)
    rows = []
    for tup in pdf[cols].itertuples(index=False, name=None):
        rows.append("|".join(
            canon_cell(None if _is_na_scalar(c) else c) for c in tup))
    return sorted(rows)


def _is_na_scalar(v) -> bool:
    import pandas as pd

    try:
        return v is None or (not isinstance(v, (list, tuple, set, dict))
                             and pd.isna(v))
    except (TypeError, ValueError):  # arrays: let canon_cell raise
        return False


def duckdb_connect_views(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def compare_query(spark, con, fn, sql, sf_dir: str) -> list[str]:
    """Run a Spark query fn and a DuckDB oracle; return a list of problems
    (empty = match). Both results take the driver's pandas round-trip."""
    s_pdf = fn(spark, sf_dir).toPandas()
    d_pdf = con.sql(sql).df()
    problems: list[str] = []
    if sorted(s_pdf.columns) != sorted(d_pdf.columns):
        problems.append(
            f"schema: spark={sorted(s_pdf.columns)} duckdb={sorted(d_pdf.columns)}")
    if len(s_pdf) != len(d_pdf):
        problems.append(f"rowcount: spark={len(s_pdf)} duckdb={len(d_pdf)}")
    if not problems:
        cs, cd = canon_frame(s_pdf), canon_frame(d_pdf)
        if cs != cd:
            diff = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
            problems.append(f"values differ, first diffs: {diff}")
    return problems


# Backwards-compatible aliases used by older tests.
def canon_value(v) -> str:
    return canon_cell(v)


def canon_rows(cols, rows) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon_cell(r[i]) for i in order) for r in rows)
