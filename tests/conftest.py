import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"

sys.path.insert(0, REPO)


@pytest.fixture(scope="session")
def reference():
    """Import the reference implementation as a test ORACLE only.

    The reference modules use bare intra-package imports, so they need
    both sys.path and cwd pointing at /root/reference while loading.
    """
    sys.path.insert(0, REFERENCE)
    cwd = os.getcwd()
    os.chdir(REFERENCE)
    try:
        import log_file  # noqa
        import counters  # noqa
        import db_options  # noqa
        import csv_outputter  # noqa
        import log_entry  # noqa
        yield {
            "log_file": log_file,
            "counters": counters,
            "db_options": db_options,
            "csv_outputter": csv_outputter,
            "log_entry": log_entry,
        }
    finally:
        os.chdir(cwd)


@pytest.fixture(scope="session")
def spark():
    from log_parser_spark.engine.session import get_spark

    spark = get_spark(app_name="tests", cores=4, shuffle_partitions=8)
    yield spark


def fixture_log(name: str) -> str:
    with open(os.path.join(REFERENCE, "test", "input_files", name)) as f:
        return f.read()


def parsed_ref_log(reference, name: str):
    path = os.path.join(REFERENCE, "test", "input_files", name)
    with open(path) as f:
        lines = f.read().splitlines()
    cwd = os.getcwd()
    os.chdir(REFERENCE)
    try:
        return reference["log_file"].ParsedLog(path, lines, False)
    finally:
        os.chdir(cwd)
