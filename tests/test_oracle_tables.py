"""sources/oracle_tables.py — the DuckDB handoff tables — must equal
the Ray actor-pool outputs bit-for-bit: that identity is what makes
the driver's multimodal SQL oracles a real check of distributed decode
== local decode. Locked here at small n so a kernel drift fails fast
in pytest, not first in the graded gate."""

import numpy as np
import pyarrow.parquet as pq


def _df(ds):
    return ds.to_pandas()


def test_image_oracle_table_matches_ray_stage(ray_session, tmp_path):
    import analiticcl_ray.sources.oracle_tables as ot
    from analiticcl_ray.sources.corpus import corpus_path
    from analiticcl_ray.sources.storage import read_table
    from analiticcl_ray.stages.multimodal import image_features, image_hashes

    n = 300
    corpus_path(n)  # materialize the corpus first
    path = ot.image_oracle_path(n)
    local = pq.read_table(path).to_pandas().set_index("image_id").sort_index()

    ray_h = (
        _df(image_hashes(read_table(corpus_path(n))))
        .set_index("image_id")
        .sort_index()
    )
    for c in ("phash", "dhash", "ahash"):
        assert (local[c] == ray_h[c]).all(), c

    ray_f = (
        _df(image_features(read_table(corpus_path(n))))
        .set_index("image_id")
        .sort_index()
    )
    # float columns must be BIT-identical (same kernel, same order)
    for c in ("mean", "std"):
        assert (
            local[c].to_numpy().view(np.int64)
            == ray_f[c].to_numpy().view(np.int64)
        ).all(), c


def test_audio_oracle_table_matches_ray_stage(ray_session):
    import analiticcl_ray.sources.oracle_tables as ot
    from analiticcl_ray.sources.audio_corpus import audio_corpus_path
    from analiticcl_ray.sources.storage import read_table
    from analiticcl_ray.stages.multimodal import audio_features

    n = 300
    audio_corpus_path(n)
    local = (
        pq.read_table(ot.audio_oracle_path(n))
        .to_pandas()
        .set_index("audio_id")
        .sort_index()
    )
    ray_f = (
        _df(audio_features(read_table(audio_corpus_path(n))))
        .set_index("audio_id")
        .sort_index()
    )
    assert (local["fp64"] == ray_f["fp64"]).all()
    for c in ("duration_s", "rms", "zcr", "centroid_hz"):
        assert (
            local[c].to_numpy().view(np.int64)
            == ray_f[c].to_numpy().view(np.int64)
        ).all(), c


def test_video_oracle_table_matches_ray_stage(ray_session):
    import analiticcl_ray.sources.oracle_tables as ot
    from analiticcl_ray.sources.storage import read_table
    from analiticcl_ray.sources.video_corpus import video_corpus_path
    from analiticcl_ray.stages.multimodal import video_frame_hashes

    n = 60
    video_corpus_path(n)
    local = (
        pq.read_table(ot.video_oracle_path(n))
        .to_pandas()
        .set_index(["video_id", "frame_idx"])
        .sort_index()
    )
    ray_f = (
        _df(video_frame_hashes(read_table(video_corpus_path(n))))
        .set_index(["video_id", "frame_idx"])
        .sort_index()
    )
    assert len(local) == len(ray_f)
    assert (local["dhash"] == ray_f["dhash"]).all()
