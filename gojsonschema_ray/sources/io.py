"""Table I/O seam — Lance-first with a Parquet fallback.

BASELINE.json's north star targets Lance-backed clip+transcript tables;
`pylance` is not installed in this container, so every read goes through this
one seam: `ray.data.read_lance` when the path is a Lance dataset AND the lib
is importable, else `ray.data.read_parquet`. All engine code should read
tables through here so the storage format is a deployment detail.

Fragment listing feeds the resumable manifest (state/manifest.py): a
"fragment" is a Lance fragment id or a parquet file path — the unit a
partition commits.
"""

from __future__ import annotations

import os

try:  # pragma: no cover - exercised only where pylance is installed
    import lance  # type: ignore

    HAVE_LANCE = True
except ImportError:
    lance = None
    HAVE_LANCE = False


def is_lance_path(path: str) -> bool:
    return path.endswith(".lance") or os.path.isdir(os.path.join(path, "_versions"))


def read_table(path: str, columns: list[str] | None = None, **kwargs):
    """ray.data Dataset over a Lance dataset or parquet file(s)/dir.

    Column pruning is pushed to the reader in both paths (only requested
    columns leave storage)."""
    import ray.data as rd

    if HAVE_LANCE and isinstance(path, str) and is_lance_path(path):
        return rd.read_lance(path, columns=columns, **kwargs)
    return rd.read_parquet(path, columns=columns, **kwargs)


def list_fragments(path: str) -> list[str]:
    """Resume/lineage units: Lance fragment ids or parquet file paths."""
    if HAVE_LANCE and isinstance(path, str) and is_lance_path(path):
        ds = lance.dataset(path)
        return [f"fragment:{f.fragment_id}" for f in ds.get_fragments()]
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    return [path]


def write_table(ds, path: str, **kwargs) -> None:
    """Partitioned table write (one file per block — resumable layout)."""
    if HAVE_LANCE and isinstance(path, str) and path.endswith(".lance"):
        ds.write_lance(path, **kwargs)
        return
    ds.write_parquet(path, **kwargs)
