"""CLI + config parity tests (reference bq-nvd.py:20-55,153-163) and the
NvdStore sink-format seam (reference bq_nvd/bq.py:171-202).

The CLI twin must reproduce three reference behaviors:
- config precedence: env vars win only as a COMPLETE set; any missing
  variable loads the whole set from the yaml file (bq-nvd.py:26-47);
- the greenfield check drives bootstrap-vs-incremental (bq-nvd.py:70-104);
- ``python -m bq_nvd_spark.nvd`` is the runnable entry point (the
  reference ships a script a CronJob invokes; library-only is not parity).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest
import yaml
from pyspark.sql import functions as F

from bq_nvd_spark.nvd import NvdStore, ingest_feed
from bq_nvd_spark.nvd.cli import build_config, run_cli
from bq_nvd_spark.nvd.etl import ID_COL

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures", "nvd")
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
YEAR_FEED = os.path.join(FIXTURES, "nvdcve-1.1-2024.json.gz")


def _write_config(tmp_path, **overrides) -> str:
    cfg = {
        "local_path": str(tmp_path / "landing"),
        "store_path": str(tmp_path / "store"),
        "url_base": f"file://{FIXTURES}/",
        "first_feed_year": 2024,
        "last_feed_year": 2024,
        "bootstrap_threshold": 5,
        **overrides,
    }
    path = str(tmp_path / "config.yml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


# --------------------------------------------------------------------------
# config precedence (reference bq-nvd.py:26-47)
def test_env_wins_as_complete_set(tmp_path, monkeypatch):
    """Every required var in the environment → yaml never read (the path
    may not even exist)."""
    monkeypatch.setenv("local_path", "/tmp/landing")
    monkeypatch.setenv("store_path", "/tmp/store")
    monkeypatch.setenv("url_base", "file:///feeds/")
    monkeypatch.setenv("bootstrap_threshold", "7")
    cfg = build_config(str(tmp_path / "does_not_exist.yml"))
    assert cfg["store_path"] == "/tmp/store"
    assert cfg["bootstrap_threshold"] == "7"
    # defaults fill the optional artifact-name settings
    assert cfg["file_prefix"] == "nvdcve-1.1-"
    assert cfg["file_suffix"] == ".json.gz"


def test_missing_env_loads_yaml_wholesale(tmp_path, monkeypatch):
    """One missing env var → the WHOLE set comes from yaml, even vars
    that were present in the environment (the reference's all-or-nothing
    load_from_yaml flag)."""
    monkeypatch.setenv("local_path", "/env/landing")
    monkeypatch.delenv("store_path", raising=False)
    monkeypatch.delenv("url_base", raising=False)
    path = _write_config(tmp_path)
    cfg = build_config(path)
    assert cfg["local_path"] == str(tmp_path / "landing")  # yaml, not env
    assert cfg["store_path"] == str(tmp_path / "store")


# --------------------------------------------------------------------------
# bootstrap-vs-incremental through the CLI surface (bq-nvd.py:70-104)
def test_cli_bootstrap_then_incremental(spark, tmp_path, monkeypatch):
    for var in ("local_path", "store_path", "url_base"):
        monkeypatch.delenv(var, raising=False)
    cfg = build_config(_write_config(tmp_path))

    # Greenfield: bootstraps the configured year range
    results = run_cli(cfg, spark=spark)
    assert [r.loaded for r in results] == [8]

    # Brownfield (8 >= threshold 5): one incremental pass over `recent`,
    # first-write-wins keeps only the 2 genuinely-new CVEs
    results = run_cli(cfg, spark=spark)
    assert [(r.loaded, r.skipped) for r in results] == [(2, False)]

    # Idempotent re-run: empty delta short-circuits ("no updates to load")
    results = run_cli(cfg, spark=spark)
    assert [(r.loaded, r.skipped) for r in results] == [(0, True)]

    store = NvdStore(spark, cfg["store_path"])
    assert store.count_cves() == 10


@pytest.mark.slow
def test_module_entry_point_subprocess(tmp_path):
    """`python -m bq_nvd_spark.nvd --config ...` end-to-end on the golden
    feed fixture — the actual invocation surface a scheduler would use."""
    path = _write_config(tmp_path)
    env = dict(os.environ)
    for var in ("local_path", "store_path", "url_base"):
        env.pop(var, None)
    env["PYTHONPATH"] = REPO_ROOT
    env["SPARK_GRAFT_CPUS"] = "4"
    proc = subprocess.run(
        [sys.executable, "-m", "bq_nvd_spark.nvd", "--config", path],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd=REPO_ROOT,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "bootstrapping" in proc.stdout
    assert "loaded 8 CVEs" in proc.stdout
    assert os.path.isdir(str(tmp_path / "store"))


# --------------------------------------------------------------------------
# sink-format seam (reference bq_nvd/bq.py:171-202 — warehouse load job)
def test_store_format_seam_orc(spark, tmp_path):
    """The identical pipeline code runs against a non-default sink format
    purely by configuration — the swap-in point for format('bigquery')."""
    store = NvdStore(spark, str(tmp_path / "orc_store"), format="orc")
    result = ingest_feed(spark, store, YEAR_FEED)
    assert result.loaded == 8
    assert store.count_cves() == 8

    # files under the year partitions really are ORC
    part = os.path.join(store.path, "_pub_year=2024")
    assert any(n.endswith(".orc") for n in os.listdir(part))

    # read-back flows through the same seam (format-aware scan)
    ids = {r[0] for r in store.read().select(F.col(ID_COL)).collect()}
    assert len(ids) == 8

    # and re-ingest dedups against the ORC store exactly like parquet
    again = ingest_feed(spark, store, YEAR_FEED)
    assert (again.loaded, again.skipped) == (0, True)


def test_store_format_seam_json_with_options(spark, tmp_path):
    """Second non-default format through the same seam, WITH writer/reader
    options passed through — the configuration surface the reference's
    load-job config occupies (bq_nvd/bq.py:190-193 sets source_format +
    schema on the LoadJobConfig). ``compression=gzip`` must reach the
    JSON writer (files end .json.gz) and the reader must scan them back
    through the same options dict."""
    store = NvdStore(
        spark,
        str(tmp_path / "json_store"),
        format="json",
        options={"compression": "gzip"},
    )
    result = ingest_feed(spark, store, YEAR_FEED)
    assert result.loaded == 8
    part = os.path.join(store.path, "_pub_year=2024")
    data_files = [n for n in os.listdir(part) if not n.startswith(("_", "."))]
    assert data_files and all(n.endswith(".json.gz") for n in data_files)

    # read-back + dedup flow through the option-carrying scan
    assert store.count_cves() == 8
    again = ingest_feed(spark, store, YEAR_FEED)
    assert (again.loaded, again.skipped) == (0, True)


def test_store_options_reach_reader(spark, tmp_path):
    """Reader options genuinely pass through the seam: a JSON store whose
    files carry a non-default date layout only round-trips when the
    configured read options are applied — the same store WITHOUT the
    option must parse differently. Proves options aren't write-only."""
    from pyspark.sql import Row

    path = str(tmp_path / "opt_store")
    opts = {"dateFormat": "dd/MM/yyyy", "timestampFormat": "dd/MM/yyyy HH:mm:ss"}
    store = NvdStore(spark, path, format="json", options=opts)
    store.ensure()
    # hand-write one record with the custom date layout into the partition
    os.makedirs(os.path.join(path, "_pub_year=2024"), exist_ok=True)
    with open(os.path.join(path, "_pub_year=2024", "rec.json"), "w") as fh:
        fh.write(
            '{"cve": {"CVE_data_meta": {"ID": "CVE-2024-0001"}},'
            ' "publishedDate": "31/12/2024 23:59:59"}\n'
        )
    got = store.read().select(ID_COL, "publishedDate").collect()
    ids = {r[0] for r in got}
    assert "CVE-2024-0001" in ids
    ts = [r[1] for r in got if r[0] == "CVE-2024-0001"][0]
    assert ts is not None and ts.year == 2024 and ts.month == 12 and ts.day == 31

    # control: same files, options stripped -> the custom layout can no
    # longer be parsed into a timestamp (permissive mode nulls it)
    bare = NvdStore(spark, path, format="json")
    bare_ts = {
        r[0]: r[1] for r in bare.read().select(ID_COL, "publishedDate").collect()
    }
    assert bare_ts.get("CVE-2024-0001") is None
