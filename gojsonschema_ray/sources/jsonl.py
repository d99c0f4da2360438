"""JSON document sources — the reference's loader family re-expressed for
Ray Data (SURVEY.md §2.1: jsonReferenceLoader / jsonStringLoader /
jsonGoLoader, jsonLoader.go:97-313).

Schemas stay DRIVER-side (small, loaded once, compiled once); this module is
about DATA: newline-delimited JSON corpora validated at table scale.

Two paths:
- ``read_jsonl``: `ray.data.read_json` — Arrow-native when documents are
  tabular (columns become typed Arrow columns → the vectorized
  TableValidator path applies).
- ``validate_jsonl_column``: documents that are too heterogeneous for a
  fixed Arrow schema ride as raw strings and are checked per batch by the
  GENERIC engine (exact big-Rat-parity numerics via Fraction parsing) —
  the per-document semantics of the reference, distributed by map_batches.
"""

from __future__ import annotations

import pyarrow as pa


def read_jsonl(path: str, **kwargs):
    """Newline-delimited JSON → typed Dataset (Arrow JSON reader)."""
    import ray.data as rd

    return rd.read_json(path, **kwargs)


class JsonColumnValidator:
    """map_batches payload: parse a string column as JSON per row and
    validate with a compiled tree (generic engine — used when documents
    cannot be a fixed Arrow schema). Emits the standard violations table.

    The compiled tree ships once in the closure; parsing uses
    ``parse_json`` (Fraction numerics) so `multipleOf`/`enum` semantics
    match the reference's math/big.Rat model exactly."""

    def __init__(self, tree, column: str, key_column: str | None = None):
        self.tree = tree
        self.column = column
        self.key_column = key_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..schema import parse_json
        from ..stages.validate import VIOLATION_SCHEMA

        docs = batch[self.column].to_pylist()
        keys = (batch[self.key_column].to_pylist()
                if self.key_column and self.key_column in batch.column_names
                else list(range(len(docs))))
        rows: list[tuple] = []
        for key, s in zip(keys, docs):
            if s is None:
                rows.append((str(key), "required", "(root)",
                             f"document in {self.column}", ""))
                continue
            try:
                doc = parse_json(s)
            except Exception as e:  # noqa: BLE001 — malformed JSON is a violation
                rows.append((str(key), "invalid_json", "(root)",
                             "parseable JSON", type(e).__name__))
                continue
            res = self.tree.validate(doc)
            for err in res.errors:
                rows.append((str(key), err.type, err.context,
                             err.describe(), str(err.value)[:128]))
        if not rows:
            return VIOLATION_SCHEMA.empty_table()
        cols = list(zip(*rows))
        return pa.table([pa.array(list(c), pa.string()) for c in cols],
                        schema=VIOLATION_SCHEMA)


def validate_jsonl_column(ds, tree, column: str, key_column: str | None = None):
    """Violations Dataset for a string column of JSON documents."""
    return ds.map_batches(JsonColumnValidator(tree, column, key_column),
                          batch_format="pyarrow")


class JsonStructValidator:
    """FAST path for homogeneous JSON columns: decode the whole batch to one
    Arrow struct column (polars ``str.json_decode`` — vectorized Rust), then
    run the VECTORIZED evaluator on the struct. ~50-100x the per-row generic
    path.

    Semantics caveat vs the generic path (documented, deliberate): numbers
    decode to int64/float64, so `multipleOf`/`enum` use float equality, not
    exact rationals; rows that fail to decode (malformed JSON) are emitted
    as `invalid_json` violations and skipped. Use JsonColumnValidator when
    exact big.Rat parity or heterogeneous rows matter."""

    def __init__(self, tree, column: str, key_column: str | None = None):
        self.tree = tree
        self.column = column
        self.key_column = key_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        import polars as pl
        import pyarrow.compute as pc

        from ..stages.validate import (
            VIOLATION_SCHEMA, TableValidator, VectorEvaluator, _Emit,
            _mask_to_np,
        )

        try:
            decoded = pl.from_arrow(batch[self.column]).str.json_decode()
        except Exception:  # noqa: BLE001 — malformed rows somewhere in batch
            # exact per-row fallback (emits invalid_json for the bad rows)
            return JsonColumnValidator(self.tree, self.column,
                                       self.key_column)(batch)
        arr = decoded.to_arrow()
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        n = batch.num_rows
        ev = VectorEvaluator(emit_violations=True)
        res = ev.eval_column(self.tree, arr, "(root)")
        emits = list(res.emits)
        # null input strings = missing document (generic-path parity)
        null_doc = _mask_to_np(pc.is_null(batch[self.column]), n)
        if null_doc.any():
            emits.append(_Emit(np.nonzero(null_doc)[0], "required", "(root)",
                               f"document in {self.column}", None))
        if not emits:
            return VIOLATION_SCHEMA.empty_table()
        from ..stages.validate import violations_table

        return violations_table(batch, emits, self.key_column)


def validate_jsonl_column_fast(ds, tree, column: str,
                               key_column: str | None = None):
    """Vectorized struct-decode validation of a JSON string column."""
    return ds.map_batches(JsonStructValidator(tree, column, key_column),
                          batch_format="pyarrow")
