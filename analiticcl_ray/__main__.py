"""CLI entry point: ``python -m analiticcl_ray <verb>``.

Two verb families, both submittable via ``ray job submit -- python -m
analiticcl_ray ...`` on a cluster (each verb owns its own Ray session;
``ray.init`` is guarded so an already-initialized driver session wins):

Reference-parity verbs (src/bin/analiticcl.rs:899-950):
- ``query``      — find_variants for each input line against a lexicon
- ``index``      — print anagram buckets of the lexicon (`analiticcl index`)
- ``testinput``  — per-line has-UNK encodability check
- ``search``     — running-text correction (find_all_matches)
- ``learn``      — iterative variant learning

Dedup-job verbs (the flagship pipeline's durable stages; SURVEY.md
§2.11; stage semantics in pipelines/runner.py):
- ``ingest``     — materialize/validate a corpus parquet directory
- ``signatures`` / ``pairs`` / ``verify`` / ``cluster`` — run the
  checkpointed job up to (and including) that stage
- ``bench``      — delegate to bench.py's headline run

Outputs are written as parquet (``--out``) or printed as TSV head.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_init(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)


def _emit(ds, out: str | None, head: int = 20) -> None:
    if out:
        ds.write_parquet(out)
        print(f"wrote {out}")
        return
    for r in ds.take(head):
        print("\t".join(str(v) for v in r.values()))


def _read_lexicon(path: str):
    import os

    from analiticcl_ray.pipelines.variants import Lexicon

    lex = Lexicon()
    with open(path, "r", encoding="utf-8") as f:
        lex.read_tsv(f.read())
    lex.lexicon_names = [os.path.basename(path)]  # --output-lexmatch names
    return lex


def _lines_ds(path: str | None):
    import ray.data as rd

    if path:
        with open(path, "r", encoding="utf-8") as f:
            rows = [
                {"line_id": i, "text": line.rstrip("\n")}
                for i, line in enumerate(f)
            ]
    else:
        rows = [
            {"line_id": i, "text": line.rstrip("\n")}
            for i, line in enumerate(sys.stdin)
        ]
    return rd.from_items(rows)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="analiticcl_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="verb", required=True)

    for verb in ("query", "search", "learn"):
        sp = sub.add_parser(verb)
        sp.add_argument("--lexicon", required=True)
        sp.add_argument("--input", default=None, help="input file (default stdin)")
        sp.add_argument("--out", default=None)
        sp.add_argument("--score-threshold", type=float, default=0.25)
        if verb == "learn":
            sp.add_argument("--iterations", type=int, default=2)
        if verb == "search":
            sp.add_argument(
                "--lm",
                action="append",
                default=None,
                help="LM lexicon TSV (text[<TAB>freq], text may be a "
                "space-separated n-gram); repeatable — reference "
                "src/bin/analiticcl.rs:1070-1091",
            )
            sp.add_argument(
                "--output-format",
                choices=("plain", "tsv", "json"),
                default="plain",
                help="plain = corrected-form columns; tsv/json = the "
                "reference's structured per-match output "
                "(src/bin/analiticcl.rs:21-187)",
            )
            sp.add_argument("--output-lexmatch", action="store_true")
            sp.add_argument("--freq-weight", type=float, default=0.0)

    sp = sub.add_parser("index")
    sp.add_argument("--lexicon", required=True)
    sp.add_argument("--out", default=None)

    sp = sub.add_parser("testinput")
    sp.add_argument("--input", default=None)
    sp.add_argument("--out", default=None)

    sp = sub.add_parser("ingest")
    sp.add_argument("--rows", type=int, default=1000)
    sp.add_argument("--seed", type=int, default=42)

    for verb in ("signatures", "pairs", "verify", "cluster"):
        sp = sub.add_parser(verb)
        sp.add_argument("--corpus", required=True)
        sp.add_argument("--out-dir", required=True)
        sp.add_argument("--shards", type=int, default=8)
        sp.add_argument("--no-resume", action="store_true")

    sub.add_parser("bench")

    args = p.parse_args(argv)

    if args.verb == "bench":
        import os
        import subprocess

        bench = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "bench.py",
        )
        return subprocess.call([sys.executable, bench])

    _ray_init(args.num_cpus)
    import ray.data as rd

    from analiticcl_ray.config import SearchConfig

    if args.verb == "ingest":
        from analiticcl_ray.sources.corpus import corpus_path

        d = corpus_path(args.rows, args.seed)
        n = rd.read_parquet(d).count()
        print(json.dumps({"corpus": d, "rows": n}))
        return 0

    if args.verb in ("signatures", "pairs", "verify", "cluster"):
        # run the checkpointed job; completed earlier stages resume
        from analiticcl_ray.pipelines.runner import run_dedup_job

        lineage = run_dedup_job(
            args.corpus, args.out_dir, n_shards=args.shards,
            resume=not args.no_resume,
            stop_after=None if args.verb == "cluster" else args.verb,
        )
        print(json.dumps({"stages": lineage["stages"]}, indent=2))
        return 0

    if args.verb == "testinput":
        from analiticcl_ray.pipelines.text import testinput as _ti

        lines = _lines_ds(args.input).map_batches(
            lambda b: {"doc_id": b["line_id"], "text": b["text"]},
            batch_format="pandas",
        )
        _emit(_ti(lines), args.out)
        return 0

    lex = _read_lexicon(args.lexicon)

    if args.verb == "index":
        # anagram buckets of the lexicon (reference `analiticcl index`)
        from analiticcl_ray.pipelines.text import anagram_groups

        docs = rd.from_items(
            [{"doc_id": i, "text": t} for i, t in enumerate(lex.texts)]
        )
        _emit(anagram_groups(docs), args.out)
        return 0

    cfg = SearchConfig(
        score_threshold=args.score_threshold,
        cutoff_threshold=0.0,
        # freq_weight drives ranking/selection (reference
        # searchparams.freq_weight -> rank_results,
        # src/bin/analiticcl.rs:1140, src/lib.rs:1528), not just the
        # displayed score blend
        freq_weight=getattr(args, "freq_weight", 0.0),
    )
    lines = _lines_ds(args.input)

    if args.verb == "query":
        from analiticcl_ray.pipelines.variants import find_variants_ds

        qs = lines.map_batches(
            lambda b: {"input": b["text"]}, batch_format="pandas"
        )
        _emit(find_variants_ds(qs, lex, cfg), args.out)
        return 0

    if args.verb == "search":
        from analiticcl_ray.pipelines.search import (
            BigramLM,
            find_all_matches_ds,
            find_all_matches_formatted_ds,
        )

        lm = (
            BigramLM.from_tsv(args.lm, known_tokens=lex.texts)
            if args.lm
            else None
        )
        if args.output_format != "plain":
            ds = find_all_matches_formatted_ds(
                lines, lex, cfg, fmt=args.output_format, lm=lm,
                freq_weight=args.freq_weight,
                output_lexmatch=args.output_lexmatch,
            )
            if args.out:
                ds.write_parquet(args.out)
                print(f"wrote {args.out}")
            else:
                for r in ds.take(100):
                    print(r["match"])
            return 0
        _emit(find_all_matches_ds(lines, lex, cfg, lm=lm), args.out)
        return 0

    if args.verb == "learn":
        from analiticcl_ray.pipelines.learn import learn_variants_ds

        qs = lines.map_batches(
            lambda b: {"input": b["text"]}, batch_format="pandas"
        )
        _, reverse, _ = learn_variants_ds(qs, lex, cfg, iterations=args.iterations)
        _emit(reverse, args.out)
        return 0

    raise SystemExit(f"unknown verb {args.verb}")


if __name__ == "__main__":
    sys.exit(main())
