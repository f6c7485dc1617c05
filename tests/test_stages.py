"""Unit tests for signature / LSH / substring stage internals (no Ray)."""

import numpy as np
import pyarrow as pa

from analiticcl_ray.config import DedupConfig
from analiticcl_ray.functions.alphabet import Normalizer, simple_alphabet
from analiticcl_ray.stages.lsh import emit_bucket_pairs
from analiticcl_ray.stages.signatures import (
    CaptionSignatures,
    hash_u64,
    phash_band_table,
    splitmix64,
)
from analiticcl_ray.stages.substring import winnow_fingerprints


def _batch(rows):
    return pa.table(
        {
            "image_id": pa.array([r[0] for r in rows], pa.string()),
            "caption": pa.array([r[1] for r in rows], pa.string()),
            "bytes": pa.array([r[2] for r in rows], pa.binary()),
            "phash": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def test_splitmix64_deterministic():
    x = np.arange(5, dtype=np.uint64)
    assert np.array_equal(splitmix64(x), splitmix64(x.copy()))
    assert len(np.unique(splitmix64(x))) == 5


def test_hash_u64():
    assert hash_u64(b"abc") == hash_u64(b"abc")
    assert hash_u64(b"abc") != hash_u64(b"abd")
    assert hash_u64(b"") == hash_u64(b"")


def test_hash_segments_pair_matches_hash_u64():
    """Vectorized column hashing: h1 is bit-identical to the scalar
    hash_u64 across the empty / single-chunk / multi-chunk regimes and
    across sliced + chunked Arrow columns; h2 is deterministic and
    independent (differs across rows where h1 differs)."""
    import numpy as np
    import pyarrow as pa

    from analiticcl_ray.stages.signatures import (
        _column_segments,
        hash_segments_pair,
    )

    rng = np.random.default_rng(3)
    sizes = list(rng.integers(0, 300, 20)) + [0, 1, 65535, 65536, 131071, 131072, 200001]
    vals = [rng.integers(0, 256, size=int(n), dtype=np.uint8).tobytes() for n in sizes]
    col = pa.array(vals, pa.binary())
    h1, h2 = hash_segments_pair(*_column_segments(col), seed=1)
    ref = np.array([hash_u64(v, seed=1) for v in vals], dtype=np.uint64)
    assert (h1 == ref).all()
    r1, r2 = hash_segments_pair(*_column_segments(col), seed=1)
    assert (r1 == h1).all() and (r2 == h2).all()
    # (h1, h2) pairs distinct for distinct inputs at this sample size
    assert len(set(zip(h1.tolist(), h2.tolist()))) == len(set(vals))
    # chunked + sliced columns resolve to the same hashes
    ch = pa.chunked_array([col.slice(0, 5), col.slice(5)])
    c1, _ = hash_segments_pair(*_column_segments(ch), seed=1)
    assert (c1 == ref).all()
    # string columns hash their UTF-8 bytes (== hash_u64 of .encode())
    scol = pa.array(["abc", "", "héllo"], pa.string())
    s1, _ = hash_segments_pair(*_column_segments(scol), seed=0)
    assert s1[0] == np.uint64(hash_u64(b"abc"))
    assert s1[1] == np.uint64(hash_u64(b""))
    assert s1[2] == np.uint64(hash_u64("héllo".encode()))


def test_caption_signatures_identical_rows_share_all_bands():
    sig = CaptionSignatures(DedupConfig())
    b = _batch(
        [
            ("a", "the quick brown fox jumps over the dog", b"x", 1),
            ("b", "the quick brown fox jumps over the dog", b"y", 2),
            ("c", "a completely different caption wording here", b"z", 3),
        ]
    )
    out = sig(b)
    bands = out["bands"].to_pylist()
    assert bands[0] == bands[1]
    shared = len(set(bands[0]) & set(bands[2]))
    assert shared <= 2  # unrelated captions share (almost) no bands


def test_caption_signatures_near_dup_shares_bands():
    sig = CaptionSignatures(DedupConfig())
    cap = "the ancient lantern gleams near the quiet meadow in holland tonight"
    b = _batch([("a", cap, b"x", 1), ("b", cap.replace("gleams", "gleems"), b"y", 2)])
    out = sig(b)
    bands = out["bands"].to_pylist()
    assert len(set(bands[0]) & set(bands[1])) >= 1


def test_content_key_exact_dup():
    sig = CaptionSignatures(DedupConfig())
    b = _batch([("a", "same cap", b"blob", 1), ("b", "same cap", b"blob", 2),
                ("c", "same cap", b"other", 3)])
    out = sig(b)["content_key"].to_pylist()
    assert out[0] == out[1] != out[2]


def test_phash_band_table_pigeonhole():
    # hamming distance 3 with 4 bands -> at least one shared band key
    a = 0b1111000011110000
    bflip = a ^ 0b1  # 1 bit differs
    t = phash_band_table(
        pa.table({"phash": pa.array([a, bflip, ~a], pa.int64())}), 4
    )
    pb = t["phash_bands"].to_pylist()
    assert len(set(pb[0]) & set(pb[1])) >= 3
    assert len(set(pb[0]) & set(pb[2])) == 0


def test_emit_bucket_pairs_small():
    src, dst, capped = emit_bucket_pairs(["b", "a", "c"], cap=10)
    assert not capped
    assert set(zip(src, dst)) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert all(s < d for s, d in zip(src, dst))


def test_emit_bucket_pairs_capped_keeps_connectivity():
    ids = [f"id{i:03d}" for i in range(25)]
    src, dst, capped = emit_bucket_pairs(ids, cap=10)
    assert capped
    # bounded: 3 chunks of <=10 -> <=3*45 + 2 chain links
    assert len(src) <= 3 * 45 + 2
    # connectivity: union-find over emitted pairs joins everything
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            x = parent[x]
        return x

    for a, b in zip(src, dst):
        parent[find(a)] = find(b)
    assert len({find(i) for i in ids}) == 1


def test_emit_bucket_pairs_dedups_input():
    src, dst, _ = emit_bucket_pairs(["a", "a", "b"], cap=10)
    assert list(zip(src, dst)) == [("a", "b")]


def test_winnowing_guarantee():
    """Strings sharing a span >= kgram+window-1 chars share a fingerprint."""
    nm = Normalizer(simple_alphabet())
    span = "thisisaverylongsharedspanofcharacters"  # 37 chars > 16+8-1
    a = nm.normalize("prefixone" + span + "tailone")
    b = nm.normalize("completelyothr" + span + "xyz")
    fa = winnow_fingerprints(a, 16, 8)
    fb = winnow_fingerprints(b, 16, 8)
    assert len(set(fa) & set(fb)) >= 1


def test_winnowing_no_shared_span():
    nm = Normalizer(simple_alphabet())
    fa = winnow_fingerprints(nm.normalize("aaaabbbbccccddddeeeeffff"), 16, 8)
    fb = winnow_fingerprints(nm.normalize("zzzzyyyyxxxxwwwwvvvvuuuu"), 16, 8)
    assert len(set(fa) & set(fb)) == 0


def test_winnowing_short_string():
    nm = Normalizer(simple_alphabet())
    assert len(winnow_fingerprints(nm.normalize("short"), 16, 8)) == 0


def test_popcount_u64_matches_python():
    from analiticcl_ray.stages.lsh import _popcount_u64

    rng = np.random.default_rng(7)
    xs = rng.integers(0, 2**63, size=256, dtype=np.uint64)
    xs = np.concatenate([xs, np.array([0, 1, 2**64 - 1], dtype=np.uint64)])
    got = _popcount_u64(xs)
    want = np.array([bin(int(x)).count("1") for x in xs], dtype=np.uint64)
    assert np.array_equal(got, want)


def test_emit_bucket_pairs_attr_maxham_prunes_far_fingerprints():
    from analiticcl_ray.stages.lsh import emit_bucket_pairs_attr

    ids = np.array([1, 2, 3, 4], dtype=np.int64)
    # 1 and 2 differ by 2 bits; 3 is ~32 bits from both; 4 == 1 exactly
    base = np.int64(0x0F0F0F0F0F0F0F0F)
    attrs = np.array(
        [base, base ^ np.int64(0b11), np.int64(-1) ^ base, base], dtype=np.int64
    )
    src, dst, capped = emit_bucket_pairs_attr(ids, attrs, cap=64, maxham=8)
    assert not capped
    assert set(zip(src.tolist(), dst.tolist())) == {(1, 2), (1, 4), (2, 4)}


def test_emit_bucket_pairs_attr_maxham_keeps_chain_links():
    from analiticcl_ray.stages.lsh import emit_bucket_pairs_attr

    # two cap-chunks whose fingerprints are all mutually far apart:
    # every in-chunk pair is pruned but the salting chain link survives,
    # keeping the bucket connected for CC consumers
    ids = np.arange(8, dtype=np.int64)
    attrs = (np.int64(1) << np.arange(8, dtype=np.int64) * 8) - np.int64(1)
    src, dst, capped = emit_bucket_pairs_attr(ids, attrs, cap=4, maxham=2)
    assert capped
    pairs = set(zip(src.tolist(), dst.tolist()))
    assert (0, 4) in pairs  # the chain link between chunk 0 and chunk 1


def test_block_pair_key_roundtrip():
    """block_pair_key_lut / decode_block_pair_key are inverse and cover
    the triangular key space exactly once (shared by the exact
    all-pairs operators in ann and text)."""
    import numpy as np

    from analiticcl_ray.stages.lsh import (
        block_pair_key_lut,
        decode_block_pair_key,
    )

    for n_parts in (1, 2, 3, 8, 13):
        lut = block_pair_key_lut(n_parts)
        n_keys = n_parts * (n_parts + 1) // 2
        assert lut.min() == 0 and lut.max() == n_keys - 1
        # symmetric: unordered pairs share a key
        assert np.array_equal(lut, lut.T)
        seen = set()
        for a in range(n_parts):
            for b in range(a, n_parts):
                k = int(lut[a, b])
                assert decode_block_pair_key(k, n_parts) == (a, b)
                seen.add(k)
        assert seen == set(range(n_keys))


def test_emit_pairs_grouped_matches_per_bucket_reference():
    """emit_pairs_grouped (size-class vectorized) is bucket-for-bucket
    equivalent to the per-bucket emit_bucket_pairs[_attr] loop it
    replaced in the candidate stage, across dtypes, caps, thresholds,
    and both prefilter modes."""
    import numpy as np

    from analiticcl_ray.stages.lsh import (
        emit_bucket_pairs,
        emit_bucket_pairs_attr,
        emit_pairs_grouped,
    )

    rng = np.random.default_rng(7)
    for trial in range(30):
        n_rows = int(rng.integers(0, 400))
        n_keys = max(1, int(rng.integers(1, 40)))
        cap = int(rng.integers(2, 12))
        drop_threshold = int(rng.integers(3, 30))
        str_ids = bool(rng.integers(0, 2))
        mode = ["none", "ratio", "maxham"][int(rng.integers(0, 3))]
        keys = rng.integers(0, n_keys, size=n_rows).astype(np.int64)
        raw_ids = rng.integers(0, 60, size=n_rows)
        ids = (
            np.array([f"id{int(v):03d}" for v in raw_ids], dtype=object)
            if str_ids else raw_ids.astype(np.int64)
        )
        attrs = rng.integers(1, 1 << 20, size=n_rows).astype(np.int64)
        ratio = 0.5 if mode == "ratio" else None
        maxham = 6 if mode == "maxham" else None
        use_attr = mode != "none"

        # reference: per-bucket loop (the pre-vectorization semantics)
        ref_pairs = set()
        ref_capped = {}
        ref_dropped = []
        order = np.argsort(keys, kind="stable")
        for k in np.unique(keys):
            m = keys == k
            if m.sum() < 2:
                continue
            if m.sum() > drop_threshold:
                ref_dropped.append(int(m.sum()))
                continue
            if use_attr:
                uids, first = np.unique(ids[m], return_index=True)
                s, d, capped = emit_bucket_pairs_attr(
                    uids, attrs[m][first], cap, ratio, maxham
                )
                s, d = list(s), list(d)
            else:
                s, d, capped = emit_bucket_pairs(list(ids[m]), cap)
            for a, b in zip(s, d):
                ref_pairs.add((a, b))
                ref_capped[(a, b)] = ref_capped.get((a, b), False) or capped
        src, dst, capflags, dropped = emit_pairs_grouped(
            keys, ids, attrs if use_attr else None, cap, drop_threshold,
            ratio, maxham,
        )
        got_pairs = set(zip(src.tolist(), dst.tolist()))
        assert got_pairs == ref_pairs, (trial, mode, str_ids)
        assert sorted(dropped) == sorted(ref_dropped), (trial, mode)
        # canonical ordering: src < dst for every non-chain pair set
        got_cap = {}
        for a, b, c in zip(src.tolist(), dst.tolist(), capflags.tolist()):
            got_cap[(a, b)] = got_cap.get((a, b), False) or c
        assert got_cap == ref_capped, (trial, mode, str_ids)


def test_emit_pairs_grouped_return_attrs_parity():
    """return_attrs=True (round 4: hamming rides out of the bucket)
    emits the SAME (src, dst, capped) stream as return_attrs=False and
    every attr value equals the emitter's id -> attr mapping — so
    computing hamming from the returned attrs is identical to the old
    attach + re-verify."""
    import numpy as np

    from analiticcl_ray.stages.lsh import emit_pairs_grouped

    rng = np.random.default_rng(13)
    for trial in range(30):
        n_rows = int(rng.integers(0, 400))
        n_keys = max(1, int(rng.integers(1, 30)))
        cap = int(rng.integers(2, 12))
        drop_threshold = int(rng.integers(3, 30))
        keys = rng.integers(0, n_keys, size=n_rows).astype(np.int64)
        raw_ids = rng.integers(0, 60, size=n_rows)
        ids = np.array([f"id{int(v):03d}" for v in raw_ids], dtype=object)
        # one attr per ID (the emitter dedups (key, id) rows, so the
        # same id must carry one value — exactly the hash-table setup)
        id_attr = {f"id{v:03d}": int(v) * 7 + 1 for v in range(60)}
        attrs = np.array([id_attr[i] for i in ids], dtype=np.int64)
        maxham = 64  # keep-everything prefilter: pure pairing parity

        s0, d0, c0, drop0 = emit_pairs_grouped(
            keys, ids, attrs, cap, drop_threshold, None, maxham
        )
        s1, d1, a_s, a_d, c1, drop1 = emit_pairs_grouped(
            keys, ids, attrs, cap, drop_threshold, None, maxham,
            return_attrs=True,
        )
        assert list(s0) == list(s1) and list(d0) == list(d1)
        assert list(c0) == list(c1) and drop0 == drop1
        assert [id_attr[i] for i in s1] == list(a_s)
        assert [id_attr[i] for i in d1] == list(a_d)


def test_cooccurrence_pairs_multi_equals_separate_passes(ray_session):
    """The single-shuffle multi-source candidate stage (round 4,
    flagship pipeline) is byte-equivalent — pairs, capped flags AND
    sentinel rows — to the two separate cooccurrence_pairs calls it
    replaced, across caps/thresholds/prefilter modes."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from analiticcl_ray.stages.lsh import (
        cooccurrence_pairs,
        cooccurrence_pairs_multi,
    )

    rng = np.random.default_rng(21)
    n = 600
    # source A: caption-band-shaped keys (some hot, some degenerate —
    # the first 60 rows share one boilerplate key, well over source A's
    # drop_threshold of 20, so the sentinel path is exercised)
    keys_a = rng.integers(0, 80, size=n).astype(np.int64)
    keys_a[:60] = 7777
    ids_a = np.array([f"img{int(v):04d}" for v in rng.integers(0, 200, n)])
    # source B: phash-shaped keys with an attr for the maxham prefilter
    keys_b = rng.integers(0, 40, size=n).astype(np.int64)
    ids_b = np.array([f"img{int(v):04d}" for v in rng.integers(0, 200, n)])
    attr_b = rng.integers(-(1 << 62), 1 << 62, size=n).astype(np.int64)

    rows_a = rd.from_arrow(
        pa.table({"band": keys_a, "image_id": pa.array(ids_a, pa.string())})
    )
    rows_b = rd.from_arrow(
        pa.table(
            {
                "band": keys_b,
                "image_id": pa.array(ids_b, pa.string()),
                "phash": attr_b,
            }
        )
    )

    def collect(ds):
        df = ds.to_pandas()
        return sorted(map(tuple, df[["src_id", "dst_id", "capped"]].values.tolist()))

    sep = collect(
        cooccurrence_pairs(
            rows_a, "band", "image_id", cap=6, keep_sentinels=True,
            n_cogroups=64, sentinel_salt=0, drop_threshold=20,
        ).union(
            cooccurrence_pairs(
                rows_b, "band", "image_id", cap=4, keep_sentinels=True,
                n_cogroups=64, sentinel_salt=1, drop_threshold=30,
                attr_col="phash", attr_maxham=20,
            )
        )
    )
    merged = collect(
        cooccurrence_pairs_multi(
            [
                {
                    "rows": rows_a, "key_col": "band", "cap": 6,
                    "sentinel_salt": 0, "drop_threshold": 20,
                },
                {
                    "rows": rows_b, "key_col": "band", "cap": 4,
                    "sentinel_salt": 1, "drop_threshold": 30,
                    "attr_col": "phash", "attr_maxham": 20,
                },
            ],
            "image_id",
            keep_sentinels=True,
            n_cogroups=64,
        )
    )
    assert merged == sep
    # sentinels present (the fixture's hot keys exceed the thresholds)
    assert any(s.startswith("__DROPPED_BUCKET__") for s, _, _ in merged)


def test_banded_hamming_pairs_capped_bucket_connectivity(ray_session):
    """cooccurrence_hamming_pairs under a tiny cap (round 4: hamming
    emitted from the bucket, chain links filtered in-task): output is
    a SUBSET of brute force at the threshold, and an identical-hash
    clique bigger than the cap stays CONNECTED through its salted
    chain links (hamming-0 links survive the filter)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from analiticcl_ray.stages.multimodal import banded_hash_dup_pairs
    from analiticcl_ray.image.codec import hamming64

    rng = np.random.default_rng(5)
    ids = [f"h{i:04d}" for i in range(80)]
    hashes = np.empty(80, dtype=np.int64)
    hashes[:40] = 0x0123456789ABCDE7  # one 40-id identical-hash clique
    hashes[40:] = rng.integers(-(1 << 62), 1 << 62, size=40)
    tab = pa.table(
        {"hid": pa.array(ids, pa.string()), "h": pa.array(hashes, pa.int64())}
    )
    stats: dict = {}
    got = banded_hash_dup_pairs(
        rd.from_arrow(tab), "hid", "h", max_hamming=3, cap=8, stats=stats
    ).to_pandas()
    hmap = dict(zip(ids, hashes))
    # every emitted pair is hamming-verified and correctly valued
    for s, d, hm in got[["src_id", "dst_id", "hamming"]].values.tolist():
        assert hm <= 3
        assert hm == int(
            hamming64(np.array([hmap[s]]), np.array([hmap[d]]))[0]
        )
    # subset of brute force
    iu, ju = np.triu_indices(80, 1)
    bf = {
        (ids[a], ids[b])
        for a, b in zip(iu, ju)
        if int(hamming64(hashes[a : a + 1], hashes[b : b + 1])[0]) <= 3
    }
    assert set(map(tuple, got[["src_id", "dst_id"]].values.tolist())) <= bf
    # the capped identical-hash clique stays one connected component
    parent = {i: i for i in ids[:40]}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in got[["src_id", "dst_id"]].values.tolist():
        if s in parent and d in parent:
            parent[find(s)] = find(d)
    assert len({find(i) for i in ids[:40]}) == 1
