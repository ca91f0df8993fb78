"""bench.py harness hardening (r11).

The r10 driver bench died rc=1 with ZERO recorded numbers because one
group raised an uncaught AnalysisException.  These tests pin the fix:

- a failing group records ``{"error": ...}`` under its key and every
  other group still lands in a JSON-serializable output dict;
- a fatal error in main() prints the exception message FIRST to stdout,
  then still prints a JSON line, then exits nonzero.
"""

import json

import pytest

import bench


def _stub_queries(spark, fail_key=None):
    """A minimal queries() board: every key returns a 5-row range; the
    fail_key raises at plan-build time."""

    def ok(_spark, _sf):
        return spark.range(5)

    def boom(_spark, _sf):
        raise ValueError("injected group failure")

    keys = [
        "adt_count_twins",
        "k_head_a",
        "k_head_b",
        "k_ana_a",
    ]
    qs = {k: ok for k in keys}
    if fail_key:
        qs[fail_key] = boom
    return qs


@pytest.fixture(autouse=True)
def _fast_bench(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SKIP_SF1", "1")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_RUNS", "1")
    monkeypatch.setenv("SPARK_GRAFT_ANALYTICS_RUNS", "1")


def test_failing_group_does_not_lose_the_line(spark):
    qs = _stub_queries(spark, fail_key="k_head_a")
    out = bench.run_benchmarks(
        spark,
        qs,
        headline=["k_head_a", "k_head_b"],
        analytics=["k_ana_a"],
        cdc_fn=lambda: {"events_per_sec": 1.0},
        repl_fn=lambda: {"rows_per_sec": 1.0},
    )
    # the failed group records its error...
    assert "error" in out["queries"]
    assert "injected group failure" in out["queries"]["error"]
    # ...and every other group still landed
    assert "k_ana_a" in out["analytics"]
    assert out["cdc"] == {"events_per_sec": 1.0}
    assert out["replication"] == {"rows_per_sec": 1.0}
    # the line itself is printable
    line = json.dumps(out)
    assert json.loads(line)["metric"] == "headline_total_wall"


def test_failing_cdc_group_is_isolated(spark):
    qs = _stub_queries(spark)

    def cdc_boom():
        raise RuntimeError("broker exploded")

    out = bench.run_benchmarks(
        spark,
        qs,
        headline=["k_head_a"],
        analytics=["k_ana_a"],
        cdc_fn=cdc_boom,
        repl_fn=lambda: {"rows_per_sec": 2.0},
    )
    assert "broker exploded" in out["cdc"]["error"]
    assert out["value"] is not None  # headline measured and summed
    assert out["replication"] == {"rows_per_sec": 2.0}
    json.dumps(out)


def test_main_fatal_prints_message_then_json(monkeypatch, capsys):
    def get_spark_boom(_name):
        raise RuntimeError("cluster on fire")

    monkeypatch.setattr(bench, "get_spark", get_spark_boom)
    with pytest.raises(SystemExit) as ei:
        bench.main()
    assert ei.value.code == 1
    lines = capsys.readouterr().out.strip().splitlines()
    # message FIRST (the r10 artifact captured only a stack tail)
    assert lines[0].startswith("BENCH FATAL: RuntimeError: cluster on fire")
    # a JSON line still closes the output
    parsed = json.loads(lines[-1])
    assert parsed["fatal"].startswith("RuntimeError: cluster on fire")
    assert parsed["metric"] == "headline_total_wall"
