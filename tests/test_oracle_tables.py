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


# ---------------------------------------------------------------------
# sequence/search-tier handoff tables (sources/oracle_text.py)
# ---------------------------------------------------------------------

def _canon(df, cols):
    return (
        df[cols]
        .sort_values(cols, kind="mergesort")
        .reset_index(drop=True)
    )


def test_sequence_oracle_tables_match_ray_queries(ray_session):
    """The locally-recomputed sequence-tier handoff tables must equal
    the distributed queries row-for-row at sf0.001 (the same identity
    the driver's gate checks at sf0.01) — including bit-identical
    float scores."""
    import os

    import __ray_entry__ as entry
    import analiticcl_ray.sources.oracle_text as ot

    sf = "/root/testdata/sf0.001"
    qs = entry.queries()
    pairs = [
        ("find_variants", ot.variants_oracle_path,
         ["input", "rank", "text", "dist_score", "freq_score", "via"]),
        ("search_correct", ot.search_oracle_path,
         ["line_id", "match_text", "begin", "end", "output", "score",
          "tags", "seqnr"]),
        ("search_formatted", ot.search_formatted_oracle_path,
         ["line_id", "match"]),
        ("context_rules", ot.context_rules_oracle_path,
         ["line_id", "match_text", "begin", "end", "output", "score",
          "tags", "seqnr"]),
        ("learn_variants", ot.learn_oracle_path,
         ["reference", "variant", "score", "frequency"]),
    ]
    for name, path_fn, cols in pairs:
        got = _df(qs[name](sf))
        want = pq.read_table(path_fn(sf)).to_pandas()
        g, w = _canon(got, cols), _canon(want, cols)
        assert len(g) == len(w), name
        for c in cols:
            gv, wv = g[c], w[c]
            if gv.dtype.kind == "f":
                # bit-identical floats (same kernels both sides); NaN
                # == NaN under the int64 view
                assert (
                    gv.to_numpy().view(np.int64)
                    == wv.to_numpy().view(np.int64)
                ).all(), (name, c)
            else:
                assert gv.fillna("\0").eq(wv.fillna("\0")).all(), (name, c)


def test_local_top_tokens_matches_ray_top_terms(ray_session):
    """The handoff lexicon builder must reproduce text.top_terms'
    (cnt desc, token asc) ranking exactly — it feeds every sequence
    oracle's inputs."""
    import ray.data as rd

    from analiticcl_ray.pipelines import text
    from analiticcl_ray.sources.oracle_text import _local_top_tokens

    sf = "/root/testdata/sf0.001"
    local = _local_top_tokens(sf, 200)
    ray_tc = (
        text.top_terms(rd.read_parquet(f"{sf}/documents.parquet"), k=200)
        .to_pandas()
    )
    assert list(local["token"]) == list(ray_tc["token"])
    assert list(local["cnt"]) == list(ray_tc["cnt"])


def test_dedup_oracle_tables_match_pipeline(ray_session):
    """The headline handoff tables (independent brute-force oracle)
    must equal the live dedup_pipeline output — the identity the
    driver's corpus_dedup_pairs/clusters hash gates assert at sf0.01,
    pinned here at n=400."""
    from analiticcl_ray.pipelines.dedup import dedup_pipeline
    from analiticcl_ray.sources.corpus import corpus_path
    from analiticcl_ray.sources.oracle_dedup import dedup_oracle_paths
    from analiticcl_ray.sources.storage import read_table

    n = 400
    corpus_path(n)
    pairs_path, clusters_path = dedup_oracle_paths(n)
    want_pairs = set(
        map(tuple, pq.read_table(pairs_path).to_pandas().to_numpy())
    )
    want_clusters = set(
        map(tuple, pq.read_table(clusters_path).to_pandas().to_numpy())
    )
    pairs_ds, clusters_ds, _ = dedup_pipeline(read_table(corpus_path(n)))
    got_pairs = {
        (r["src_id"], r["dst_id"])
        for r in pairs_ds.select_columns(["src_id", "dst_id"]).take_all()
    }
    got_clusters = {
        (r["image_id"], r["cluster_id"]) for r in clusters_ds.take_all()
    }
    assert got_pairs == want_pairs
    assert got_clusters == want_clusters
