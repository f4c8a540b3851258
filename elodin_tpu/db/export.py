"""Archive export: per-component files in arrow/parquet/csv
(parity: libs/db save_archive + export CLI, src/export.rs)."""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa


def _arrow_table(store) -> pa.Table:
    n = store.len
    time = pa.array(store.timestamps[:n], type=pa.timestamp("us"))
    values = store.values[:n]
    name = store.name or f"{store.component_id:016x}"
    if store.elem_count == 1:
        data = pa.array(values[:, 0])
    else:
        data = pa.FixedSizeListArray.from_arrays(
            pa.array(values.reshape(-1)), store.elem_count
        )
    return pa.table({"time": time, name: data})


def _is_private(store) -> bool:
    """Components flagged `metadata={"private": "true"}` are skipped on
    export unless explicitly included (src/export.rs:752-855)."""
    return str(store.metadata.get("private", "")).lower() == "true"


def save_archive(db, path: str, fmt: str = "arrow_ipc",
                 include_private: bool = False, pattern: str | None = None,
                 flatten: bool = True, mono_ns: bool = False,
                 fast_floats: bool = False) -> None:
    """Export every component series (src/export.rs options: name glob
    pattern, per-element flatten, ns vs us timestamps, fast float
    formatting — the knobs behind the reference csv-export goldens)."""
    import fnmatch

    out = Path(path)
    out.mkdir(parents=True, exist_ok=True)
    _seen: set[str] = set()
    for store in db.components.values():
        if store.len == 0:
            continue
        if _is_private(store) and not include_private:
            continue
        if pattern and not fnmatch.fnmatch(
            store.name or f"{store.component_id:016x}", pattern
        ):
            continue
        name = store.name or f"{store.component_id:016x}"
        # duplicate display names (distinct ids) must not silently
        # overwrite each other's output files
        if name in _seen:
            name = f"{name}.{store.component_id:016x}"
        _seen.add(name)
        table = _arrow_table(store)
        if fmt in ("arrow", "arrow_ipc"):
            import pyarrow.ipc as ipc

            with ipc.new_file(str(out / f"{name}.arrow"), table.schema) as w:
                w.write_table(table)
        elif fmt in ("parquet", "pq"):
            import pyarrow.parquet as pq

            pq.write_table(table, str(out / f"{name}.parquet"))
        elif fmt == "csv":
            n = store.len
            ts = store.timestamps[:n]
            tcol = "time_ns" if mono_ns else "time_us"
            cols = {tcol: ts * 1000 if mono_ns else ts}
            if store.elem_count == 1:
                cols[name] = store.values[:n, 0]
            elif flatten:
                labels = (store.metadata.get("element_names") or "").split(",")
                for i in range(store.elem_count):
                    label = labels[i] if i < len(labels) and labels[i] else str(i)
                    cols[f"{name}.{label}"] = store.values[:n, i]
            else:
                # one column holding the whole element vector per row
                cols[name] = [
                    "[" + ", ".join(repr(float(v)) for v in row) + "]"
                    for row in store.values[:n]
                ]
            import csv as _csv

            def fmt_val(v):
                if fast_floats and isinstance(v, float):
                    return f"{v:.9g}"
                return v

            with open(out / f"{name}.csv", "w", newline="") as f:
                w = _csv.writer(f)
                w.writerow(cols.keys())
                for row in zip(*cols.values()):
                    w.writerow([fmt_val(v) for v in row])
        else:
            raise ValueError(f"unknown archive format {fmt!r}")


def export_mcap(db, path: str) -> int:
    """Whole-DB single-file MCAP export (libs/db/src/export_mcap.rs);
    see elodin_tpu.db.export_mcap for the writer."""
    from .export_mcap import export_mcap as _impl

    return _impl(db, path)


def export_csv_joined(db, out_path: str,
                      include_private: bool = False) -> None:
    """Single wide CSV joined on time (export.rs --join mode)."""
    import pandas as pd

    frames = []
    seen_names: dict[str, int] = {}
    for store in db.components.values():
        if store.len == 0:
            continue
        if _is_private(store) and not include_private:
            continue
        n = store.len
        name = store.name or f"{store.component_id:016x}"
        # two stores sharing a display name (distinct ids) would make the
        # pandas join raise on overlapping columns — disambiguate by id
        if name in seen_names:
            name = f"{name}.{store.component_id:016x}"
        seen_names[name] = store.component_id
        data = {"time": store.timestamps[:n]}
        if store.elem_count == 1:
            data[name] = store.values[:n, 0]
        else:
            for i in range(store.elem_count):
                data[f"{name}[{i}]"] = store.values[:n, i]
        frames.append(pd.DataFrame(data).set_index("time"))
    if not frames:
        return
    df = frames[0].join(frames[1:], how="outer")
    df.to_csv(out_path)
