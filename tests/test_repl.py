"""Smoke test for the interactive REPL (tools/repl.py) — the Spark
analogue of the reference's demo driver (/root/reference/src/demo.ts:
159-190). COVERAGE.md listed Q17 as manual-only; this drives the real
subprocess over a piped stdin session so the routing (plain search,
boolean atoms, :fuzzy, :role, did-you-mean) is CI-covered end-to-end:
index on disk -> fresh JVM -> readline loop -> printed results."""

import subprocess
import sys
from pathlib import Path

import pytest

from conftest import build_fixture_engine
from fixtures_data import PLANETS

REPO = Path(__file__).resolve().parents[1]


@pytest.fixture(scope="module")
def planets_index(spark, tmp_path_factory):
    idx = tmp_path_factory.mktemp("repl_idx")
    build_fixture_engine(spark, PLANETS, idx)
    return idx


def run_repl(index_dir, lines, extra_args=()):
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "repl.py"), str(index_dir),
         "--k", "5", "--master", "local[2]", *extra_args],
        input="\n".join(lines) + "\n\n",
        capture_output=True, text=True, timeout=600, cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    return proc.stdout


def test_repl_session_routes_and_answers(planets_index):
    out = run_repl(
        planets_index,
        [
            "jupiter",                 # plain reference-parity search:
                                       # both docs mention Jupiter
                                       # (SATURN_TEXT: "after Jupiter")
            "planet* -saturn",         # extended boolean atoms: only the
                                       # Saturn page contains "saturn"
            ":fuzzy jupitter",         # OOV auto-correction path
            ":role user jupiter",      # metadata-filtered path (no role
                                       # prefixes in PLANETS -> 0 hits,
                                       # but the routing must not crash)
            "saturnn",                 # OOV, no hits -> did-you-mean
        ],
    )
    assert "2 documents indexed" in out
    # plain query finds the Jupiter page and prints title + url
    assert "* Jupiter  [https://en.wikipedia.org/wiki/Jupiter]" in out
    # boolean exclusion drops the Saturn page
    assert "(boolean filter)" in out
    assert "-- 1 hits in" in out
    assert "wiki/Saturn]" not in out.split("(boolean filter)")[0].rsplit(
        "search>", 1
    )[-1]
    # every routed command reports its timing/result line
    assert out.count("hits in") >= 5
    assert "(fuzzy)" in out
    assert "(role=user)" in out
    # :fuzzy corrected an out-of-vocabulary term and said so
    assert "showing results for: jupiter" in out
    # a near-miss with zero hits gets a spelling suggestion
    assert "did you mean: saturnn→saturn" in out
