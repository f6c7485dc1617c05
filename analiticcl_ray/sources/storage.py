"""Storage shim: Lance-first table IO with Parquet fallback.

The north rule's input is "Lance tables of image+caption pairs"
(BASELINE.json input_hint); this container ships no Lance libraries, so
the shim makes Lance a one-line enable (SURVEY.md §7.0): when
``lance``/``pylance`` is importable, ``read_table``/``write_table``
route through ``ray.data.read_lance`` / ``Dataset.write_lance`` (both
present in ray[data] 2.49); otherwise they fall back to Parquet with
the SAME schema, column pruning, and directory layout. The entry-point
table reads (bench.py, __ray_entry__) route through this shim, and
`dedup_pipeline` takes any Dataset, so a Lance corpus changes no caller
code. The one format-coupled component is the checkpointed runner's
shard enumeration, which walks parquet (file, row_group) fragments; the
Lance analog is `lance.dataset(...).get_fragments()` — same contiguous
fragment-list sharding, different fragment API.

Format resolution:
- explicit ``fmt="lance"|"parquet"`` wins;
- else a ``.lance`` path suffix or an existing Lance dataset dir
  selects Lance;
- else Parquet.
"""

from __future__ import annotations

import os
from typing import Optional

import ray.data

try:  # pragma: no cover - exercised only where pylance is installed
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def _is_lance_path(path: str) -> bool:
    if path.endswith(".lance"):
        return True
    # a materialized Lance dataset dir has a _versions/ manifest subdir
    return os.path.isdir(os.path.join(path, "_versions"))


def resolve_format(path: str, fmt: Optional[str] = None) -> str:
    if fmt in ("lance", "parquet"):
        return fmt
    if fmt is not None:
        raise ValueError(f"unknown storage format {fmt!r}")
    return "lance" if _is_lance_path(path) else "parquet"


def read_table(
    path: str,
    columns: Optional[list[str]] = None,
    fmt: Optional[str] = None,
    **kwargs,
) -> "ray.data.Dataset":
    """Read a table as a streaming Dataset with column pruning pushed
    into the scan (prune-at-the-read; never load 'bytes' for a
    caption-only stage)."""
    fmt = resolve_format(path, fmt)
    if fmt == "lance":
        if not HAVE_LANCE:
            raise ImportError(
                "path resolves to Lance but no lance/pylance module is "
                "installed; pass fmt='parquet' or install pylance"
            )
        return ray.data.read_lance(path, columns=columns, **kwargs)
    if "schema" not in kwargs:
        # strip writer metadata (e.g. the b'pandas' blob pandas-written
        # files carry) at the scan itself: schemas with metadata are
        # unhashable, which defeats Ray's block-schema dedup in every
        # downstream stage ("Failed to hash the schemas" warnings) —
        # overriding the scan schema keeps every block metadata-free
        import pyarrow as pa
        import pyarrow.dataset as pads

        schema = pads.dataset(path, format="parquet").schema.remove_metadata()
        if columns is not None:
            schema = pa.schema([schema.field(c) for c in columns])
        kwargs["schema"] = schema
    return ray.data.read_parquet(path, columns=columns, **kwargs)


def write_table(
    ds: "ray.data.Dataset", path: str, fmt: Optional[str] = None, **kwargs
) -> None:
    """Write a Dataset as a (multi-file, resumable-layout) table."""
    fmt = resolve_format(path, fmt)
    if fmt == "lance":
        if not HAVE_LANCE:
            raise ImportError(
                "Lance output requested but no lance/pylance module is "
                "installed; pass fmt='parquet' or install pylance"
            )
        ds.write_lance(path, **kwargs)
        return
    ds.write_parquet(path, **kwargs)
