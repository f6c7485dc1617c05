"""CLI verb smoke tests (SURVEY §2.11; reference subcommands
src/bin/analiticcl.rs:899-950). Each verb runs as a real subprocess —
the same invocation ``ray job submit`` would make on a cluster."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, stdin=None, timeout=420):
    return subprocess.run(
        [sys.executable, "-m", "analiticcl_ray", "--num-cpus", "4", *args],
        input=stdin, capture_output=True, text=True, cwd=REPO, timeout=timeout,
        env={**os.environ, "PYTHONPATH": REPO},
    )


def test_cli_query_and_testinput(tmp_path):
    lex = tmp_path / "lex.tsv"
    lex.write_text("i\t10\nthink\t8\nright\t5\n")
    r = _run(["query", "--lexicon", str(lex), "--score-threshold", "0.0"],
             stdin="tink\n")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "think" in r.stdout

    r = _run(["testinput"], stdin="hello\nw0rld!\n")
    assert r.returncode == 0, r.stderr[-2000:]
    lines = sorted(r.stdout.strip().splitlines())
    assert lines[0].startswith("0\tFalse\t0")
    assert lines[1].startswith("1\tTrue\t2")


def test_cli_search_with_lm(tmp_path):
    """`search --lm` (reference src/bin/analiticcl.rs:1070-1091): the
    LM file flips the corrected output for an ambiguous variant."""
    lex = tmp_path / "lex.tsv"
    lex.write_text("i\t10\nsaw\t10\nthe\t10\nball\t100\nbell\t2\n")
    lm = tmp_path / "lm.tsv"
    lm.write_text("the bell\t50\nthe ball\t1\nsaw the\t10\ni saw\t10\n")
    r = _run(
        ["search", "--lexicon", str(lex), "--score-threshold", "0.0",
         "--lm", str(lm)],
        stdin="I saw the bcll\n",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "bell" in r.stdout
    r2 = _run(
        ["search", "--lexicon", str(lex), "--score-threshold", "0.0"],
        stdin="I saw the bcll\n",
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "ball" in r2.stdout


def test_cli_search_freq_weight_drives_ranking(tmp_path):
    """--freq-weight must reach SearchConfig.freq_weight so it drives
    rank_results/selection (reference searchparams.freq_weight,
    src/bin/analiticcl.rs:1140 -> src/lib.rs:1528), not just the
    printed score blend."""
    lex = tmp_path / "lex.tsv"
    lex.write_text("tanks\t1\nthank\t1000\n")
    base = ["search", "--lexicon", str(lex), "--score-threshold", "0.0",
            "--output-format", "tsv"]
    r0 = _run(base, stdin="tank\n")
    assert r0.returncode == 0, r0.stderr[-2000:]
    first0 = r0.stdout.strip().splitlines()[-1].split("\t")[2]
    r5 = _run([*base, "--freq-weight", "5"], stdin="tank\n")
    assert r5.returncode == 0, r5.stderr[-2000:]
    first5 = r5.stdout.strip().splitlines()[-1].split("\t")[2]
    assert first0 == "tanks" and first5 == "thank"


def test_cli_dedup_stage_verbs(tmp_path):
    from analiticcl_ray.sources.corpus import corpus_path

    corpus = corpus_path(300, seed=7)
    out = str(tmp_path / "job")
    r = _run(["pairs", "--corpus", corpus, "--out-dir", out, "--shards", "2"])
    assert r.returncode == 0, r.stderr[-2000:]
    payload = json.loads(r.stdout)
    assert [s["stage"] for s in payload["stages"]][:2] == ["signatures", "pairs"]
    assert os.path.exists(os.path.join(out, "pairs", "_manifest.json"))
    # second verb resumes the finished stages and adds the rest
    r = _run(["cluster", "--corpus", corpus, "--out-dir", out, "--shards", "2"])
    assert r.returncode == 0, r.stderr[-2000:]
    payload = json.loads(r.stdout)
    stages = [s["stage"] for s in payload["stages"]]
    assert stages == ["signatures", "pairs", "verified", "clusters"]
    assert payload["stages"][1].get("resumed")


def test_scaling_history_merge(tmp_path):
    """Each --scaling run becomes the top-level record and pushes the
    previous one into history; corrupt/missing files start fresh."""
    import json
    import sys

    sys.path.insert(0, "/root/repo")
    from bench import merge_scaling_history

    p = str(tmp_path / "BENCH_SCALING.json")
    r1 = {"sec_8": 100.0, "sec_32": 30.0, "scaling_efficiency": 0.83}
    out1 = merge_scaling_history(p, dict(r1))
    assert out1["history"] == []
    with open(p, "w") as f:
        json.dump(out1, f)

    r2 = {"sec_4": 200.0, "sec_16": 60.0, "scaling_efficiency": 0.85}
    out2 = merge_scaling_history(p, dict(r2))
    assert out2["scaling_efficiency"] == 0.85
    assert out2["history"] == [r1]
    with open(p, "w") as f:
        json.dump(out2, f)

    r3 = {"sec_8": 90.0, "sec_32": 28.0, "scaling_efficiency": 0.80}
    out3 = merge_scaling_history(p, dict(r3))
    assert [h["scaling_efficiency"] for h in out3["history"]] == [0.83, 0.85]

    with open(p, "w") as f:
        f.write("{corrupt")
    assert merge_scaling_history(p, dict(r1))["history"] == []
