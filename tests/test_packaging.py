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
