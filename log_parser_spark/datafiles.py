"""Resolve the package's vendored data files (fixture/baseline logs,
staged oracle parquet) whether the package is an on-disk tree or a
``spark-submit --py-files`` zip.

Zip-imported packages expose resources via importlib.resources but not
as real filesystem paths, and everything downstream (open(), pyarrow,
DuckDB oracle SQL) needs paths — so in zip mode the data tree is
extracted once per process into a temp cache and cleaned at exit.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_CACHE: str | None = None


def data_dir() -> str:
    global _CACHE
    disk = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
    if os.path.isdir(disk):
        return disk
    if _CACHE is None:
        import importlib.resources as res

        cache = tempfile.mkdtemp(prefix="log_parser_spark_data_")

        def copy(node, dst):
            if node.is_dir():
                os.makedirs(dst, exist_ok=True)
                for child in node.iterdir():
                    copy(child, os.path.join(dst, child.name))
            else:
                with node.open("rb") as fsrc, open(dst, "wb") as fdst:
                    shutil.copyfileobj(fsrc, fdst)

        copy(res.files("log_parser_spark") / "data", cache)
        atexit.register(lambda: shutil.rmtree(cache, ignore_errors=True))
        _CACHE = cache
    return _CACHE


def data_path(*parts: str) -> str:
    return os.path.join(data_dir(), *parts)
