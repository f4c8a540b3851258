"""SQL queries over component time-series.

The reference embeds DataFusion (libs/db/src/arrow/mod.rs) — unavailable
here, so this module exposes every component as a pyarrow table named by
``sanitize_sql_table_name`` and evaluates a practical SQL subset against
pandas: SELECT projections (with aliases), WHERE with comparison/boolean
operators, ORDER BY, LIMIT, and simple aggregate functions.  Enough for the
telemetry queries the tooling issues; swap in a full engine behind
``run_sql`` if one is available.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa


def sanitize_sql_table_name(name: str) -> str:
    """(libs/db/src/arrow/mod.rs:35-46)."""
    return "".join(c if (c.isalnum() or c == "_") else "_" for c in name)


def component_table(store) -> pa.Table:
    """time + value columns, flattened per element when shaped."""
    n = store.len
    cols: dict[str, pa.Array] = {
        "time": pa.array(
            store.timestamps[:n], type=pa.timestamp("us")
        )
    }
    values = store.values[:n]
    base = sanitize_sql_table_name(store.name or f"c_{store.component_id:x}")
    if store.elem_count == 1:
        cols[base] = pa.array(values[:, 0])
    else:
        labels = (store.metadata.get("element_names") or "").split(",")
        for i in range(store.elem_count):
            label = (
                labels[i]
                if i < len(labels) and labels[i]
                else str(i)
            )
            cols[f"{base}_{sanitize_sql_table_name(label)}"] = pa.array(values[:, i])
    return pa.table(cols)


_SQL_RE = re.compile(
    r"^\s*select\s+(?P<cols>.+?)\s+from\s+(?P<table>[A-Za-z0-9_\.]+)"
    r"(?:\s+where\s+(?P<where>.+?))?"
    r"(?:\s+order\s+by\s+(?P<order>[A-Za-z0-9_,\s]+?)(?:\s+(?P<dir>asc|desc))?)?"
    r"(?:\s+limit\s+(?P<limit>\d+))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def run_sql(db, query: str) -> pa.Table:
    m = _SQL_RE.match(query)
    if not m:
        raise ValueError(f"unsupported SQL (subset engine): {query!r}")
    table_name = m.group("table").lower()
    store = None
    for s in db.components.values():
        if sanitize_sql_table_name(s.name or "").lower() == table_name:
            store = s
            break
    if store is None:
        raise ValueError(f"table {table_name!r} not found")
    table = component_table(store)
    df = table.to_pandas()

    where = m.group("where")
    if where:
        expr = _to_pandas_expr(where)
        df = df[eval(expr, {"np": np}, {"df": df, **{c: df[c] for c in df.columns}})]

    order = m.group("order")
    if order:
        cols = [c.strip() for c in order.split(",")]
        df = df.sort_values(cols, ascending=(m.group("dir") or "asc").lower() != "desc")

    limit = m.group("limit")
    if limit:
        df = df.head(int(limit))

    cols_spec = m.group("cols").strip()
    if cols_spec != "*":
        out = {}
        for part in cols_spec.split(","):
            part = part.strip()
            alias = None
            am = re.match(r"(.+?)\s+as\s+([A-Za-z0-9_]+)$", part, re.IGNORECASE)
            if am:
                part, alias = am.group(1).strip(), am.group(2)
            fm = re.match(r"(avg|min|max|sum|count)\((.+)\)$", part, re.IGNORECASE)
            if fm:
                fn, arg = fm.group(1).lower(), fm.group(2).strip()
                series = df[arg] if arg != "*" else df.iloc[:, 0]
                value = {
                    "avg": series.mean,
                    "min": series.min,
                    "max": series.max,
                    "sum": series.sum,
                    "count": series.count,
                }[fn]()
                out[alias or f"{fn}_{arg}"] = [value]
            else:
                out[alias or part] = df[part]
        import pandas as pd

        df = pd.DataFrame(out)
    return pa.Table.from_pandas(df, preserve_index=False)


def _to_pandas_expr(where: str) -> str:
    expr = where
    expr = re.sub(r"\bAND\b", "&", expr, flags=re.IGNORECASE)
    expr = re.sub(r"\bOR\b", "|", expr, flags=re.IGNORECASE)
    expr = re.sub(r"(?<![<>!=])=(?!=)", "==", expr)
    # parenthesize comparisons joined by &/| for pandas semantics
    parts = re.split(r"([&|])", expr)
    parts = [
        f"({p.strip()})" if p not in "&|" and p.strip() else p for p in parts
    ]
    return " ".join(parts)
