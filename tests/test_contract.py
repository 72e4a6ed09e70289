"""Driver-contract and bench-CLI guards.

The external driver consumes exactly two surfaces: the three functions in
``__spark_entry__.py`` and the ONE JSON line ``bench.py`` prints.  A
breakage in either silently costs the round its CORRECTNESS / BENCH
record, so both are pinned here.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import __spark_entry__ as entry_mod

from ida_ice_energy_simulation_etl_pipeline_spark.plans import QUERIES

REPO = os.path.dirname(os.path.abspath(entry_mod.__file__))


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"r_name", "n_name", "revenue", "n_orders"}


def test_queries_and_oracles_align():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(q) == set(QUERIES)
    # every oracle key must name a query; non-oracle queries are the
    # declared rows-only set
    assert set(o) <= set(q)
    # r8: the rows-only-by-design table_profile_approx left the driver
    # window (judge-prescribed rotation) so EVERY driver slot is
    # hash-verifiable — the driver window must stay 100% oracle-backed.
    rows_only = set(q) - set(o)
    assert rows_only == set()
    assert all(callable(fn) for fn in q.values())
    assert all(isinstance(sql, str) and sql.strip() for sql in o.values())


def test_bench_headline_names_resolve():
    """A registry rename must never silently break the driver's bench
    run: every headline name resolves, and each has an oracle so the
    self-grading DuckDB column stays complete."""
    import bench

    from ida_ice_energy_simulation_etl_pipeline_spark.plans import ALL_QUERIES

    missing = [n for n in bench.HEADLINE if n not in ALL_QUERIES]
    assert not missing, f"headline names not in registry: {missing}"
    no_oracle = [n for n in bench.HEADLINE if ALL_QUERIES[n].oracle is None]
    assert not no_oracle, f"headline queries without oracles: {no_oracle}"


def test_bench_explain_mode(tmp_path):
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--explain", "keyed_lookup"],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
        check=True,
    )
    assert "===== keyed_lookup =====" in out.stdout
    assert "Physical Plan" in out.stdout
    assert "PushedFilters" in out.stdout  # the property the mode exists to show


def test_bench_cli_emits_one_json_line(tmp_path):
    """Run the real bench CLI end-to-end (subprocess: bench stops its own
    SparkSession) on a 3-query subset at the smallest fixture, and check
    the driver-facing JSON contract."""
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
        SPARK_GRAFT_BENCH_REPEATS="1",
        SPARK_GRAFT_BENCH_QUERIES="pricing_summary,time_dim,dedup_exact",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
        check=True,
    )
    # r3's official bench record came back unparseable because extra stdout
    # grew past the driver's capture window — stdout must be EXACTLY one
    # compact JSON line (diagnostics go to bench_detail.json).
    stdout_lines = [ln for ln in out.stdout.strip().splitlines() if ln]
    assert len(stdout_lines) == 1, f"bench stdout must be 1 line, got {stdout_lines}"
    line = stdout_lines[-1]
    assert len(line) < 1900, (
        "headline JSON must fit the driver's 2000-char stdout tail capture "
        "(BENCH_r03 came back parsed:null when the line outgrew it)"
    )
    doc = json.loads(line)
    assert doc["metric"] == "headline_queries_total"
    assert doc["unit"] == "sec"
    assert set(doc["queries"]) == {"pricing_summary", "time_dim", "dedup_exact"}
    assert all(isinstance(v, float) and v >= 0 for v in doc["queries"].values())
    assert doc["value"] >= 0
    # the self-grading DuckDB total ran; the per-query DuckDB column
    # lives in the side file to keep the stdout line inside the capture
    assert isinstance(doc["duckdb_total"], float)
    assert "duckdb_queries" not in doc
    detail = json.load(open(os.path.join(REPO, "bench_detail.json")))
    assert set(detail["duckdb_queries"]) == set(doc["queries"])
    assert all(isinstance(v, float) for v in detail["duckdb_queries"].values())
    assert doc["sf"] == 0.001


def test_session_conf_local_vs_cluster():
    """Uncompressed shuffle + zero locality wait apply ONLY to known-local
    masters; a cluster deploy (master=None, injected by spark-submit)
    keeps Spark's network-appropriate defaults.  extra_conf overrides
    everything."""
    from ida_ice_energy_simulation_etl_pipeline_spark.session import build_conf

    local = build_conf("local[32]")
    assert local["spark.shuffle.compress"] == "false"
    assert local["spark.locality.wait"] == "0ms"

    for cluster_master in (None, "yarn", "spark://host:7077", "k8s://https://h"):
        conf = build_conf(cluster_master)
        assert "spark.shuffle.compress" not in conf, cluster_master
        assert "spark.locality.wait" not in conf, cluster_master
        assert conf["spark.sql.adaptive.enabled"] == "true"

    over = build_conf("local[4]", extra_conf={"spark.shuffle.compress": "true"})
    assert over["spark.shuffle.compress"] == "true"
    assert build_conf(None, shuffle_partitions=2000)[
        "spark.sql.shuffle.partitions"
    ] == "2000"


def test_session_runs_ansi_on_everywhere():
    """ANSI mode must be ON in every session shape — the verification
    driver runs Spark 4's ANSI-on default, and a local ANSI-off pin let a
    LongType overflow wrap silently here while throwing
    ARITHMETIC_OVERFLOW there (CORRECTNESS_r06 dedup_clusters_star).
    Local sessions must match the strictest session the queries meet."""
    from ida_ice_energy_simulation_etl_pipeline_spark.session import build_conf

    for master in ("local[32]", None, "yarn"):
        assert build_conf(master)["spark.sql.ansi.enabled"] == "true", master


def test_live_session_is_ansi_on(spark):
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"


def test_bench_full_headline_fits_capture_window():
    """The FULL headline set must produce a stdout line under the
    driver's 2000-char tail capture even with worst-case float widths."""
    import json as _json

    import bench

    qs = {n: 12.3456 for n in bench.HEADLINE}
    h = {
        "metric": "headline_queries_total",
        "value": 1234.5678,
        "unit": "sec",
        "queries": qs,
        "repeats": 3,
        "max_rel_spread": 1.2345,
        "noisy_queries": {n: 1.2345 for n in list(bench.HEADLINE)[:8]},
        "duckdb_total": 1234.5678,
        "sf": 0.1,
    }
    assert len(_json.dumps(h)) < 1900
