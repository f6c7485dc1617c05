"""Storage shim tests: format resolution, parquet roundtrip with column
pruning, honest Lance gating when pylance is absent."""

import pytest


def test_resolve_format(tmp_path):
    from analiticcl_ray.sources.storage import resolve_format

    assert resolve_format("/x/t.lance") == "lance"
    assert resolve_format("/x/t.parquet") == "parquet"
    assert resolve_format("/x/dir") == "parquet"
    d = tmp_path / "ds"
    (d / "_versions").mkdir(parents=True)
    assert resolve_format(str(d)) == "lance"
    assert resolve_format(str(d), fmt="parquet") == "parquet"
    with pytest.raises(ValueError):
        resolve_format("/x", fmt="orc")


def test_parquet_roundtrip_with_pruning(ray_session, tmp_path):
    import ray.data as rd

    from analiticcl_ray.sources.storage import read_table, write_table

    ds = rd.from_items([{"a": i, "b": str(i), "big": b"x" * 100} for i in range(10)])
    out = str(tmp_path / "t")
    write_table(ds, out)
    back = read_table(out, columns=["a", "b"])
    assert back.schema().names == ["a", "b"]
    assert sorted(r["a"] for r in back.take_all()) == list(range(10))


def test_lance_gated_without_module(ray_session, tmp_path):
    from analiticcl_ray.sources import storage

    if storage.HAVE_LANCE:
        pytest.skip("lance installed; gate not applicable")
    with pytest.raises(ImportError):
        storage.read_table(str(tmp_path / "x.lance"))
