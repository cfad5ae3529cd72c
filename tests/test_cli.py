"""CLI runner (python -m cloudvectordb_spark): the no-Spark paths."""

from __future__ import annotations

import subprocess
import sys


def _run(*args: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-m", "cloudvectordb_spark", *args],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=120,
    )


def test_cli_list_names_every_query():
    from cloudvectordb_spark.registry import all_queries

    out = _run("--list")
    assert out.returncode == 0
    listed = {ln.split()[0] for ln in out.stdout.splitlines() if ln.strip()}
    assert set(all_queries()) <= listed


def test_cli_oracle_prints_sql_without_spark():
    out = _run("pricing_summary", "--oracle")
    assert out.returncode == 0
    assert "SELECT" in out.stdout and "l_returnflag" in out.stdout

    # since round 7 every registered query carries an oracle (the old
    # rows-only example minhash_dedup_pairs now prints its invariant SQL)
    ro = _run("minhash_dedup_pairs", "--oracle")
    assert ro.returncode == 0 and "n_emitted_outside_tau" in ro.stdout


def test_cli_unknown_query_is_loud():
    out = _run("no_such_query")
    assert out.returncode == 2
    assert "unknown query" in out.stderr


def test_bench_compare_flags_only_beyond_noise(tmp_path):
    import json
    import subprocess

    a = tmp_path / "a.json"
    b = tmp_path / "b.json"
    a.write_text(json.dumps({"value": 10.0, "queries": {"q1": 1.0, "q2": 2.0}}))
    b.write_text(json.dumps({"value": 10.5, "queries": {"q1": 1.05, "q2": 2.5}}))
    out = subprocess.run(
        [sys.executable, "/root/repo/tools/bench_compare.py", str(a), str(b),
         "--noise", "0.15"],
        capture_output=True, text=True, timeout=60,
    )
    assert out.returncode == 0
    assert "q2" in out.stdout and "q1" not in out.stdout.replace("q1 -> ", "")


def test_cli_serving_verbs(spark, sf_dir, capsys, monkeypatch):
    """The serving verbs route to the TextIndex facade and print rows;
    a verb missing its required flag exits 2."""
    import sys

    from cloudvectordb_spark.__main__ import main

    monkeypatch.setattr(
        sys, "argv",
        ["cloudvectordb_spark", "search", "--terms", "data", "--sf", sf_dir],
    )
    assert main() == 0
    assert "bm25" in capsys.readouterr().out

    monkeypatch.setattr(
        sys, "argv",
        ["cloudvectordb_spark", "complete", "--prefix", "s", "--sf", sf_dir],
    )
    assert main() == 0
    assert "df" in capsys.readouterr().out

    monkeypatch.setattr(
        sys, "argv", ["cloudvectordb_spark", "search", "--sf", sf_dir]
    )
    assert main() == 2
