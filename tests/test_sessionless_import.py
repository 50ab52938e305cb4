"""Sessionless-import regression gate.

Every module in the package must import, and the full query inventory
must load, WITHOUT a SparkSession or SparkContext.  This matters twice:

1. Executor Python workers unpickle UDFs and re-import their defining
   modules with no SparkContext — a module-level ``@pandas_udf("ddl
   string")`` crashes there (``_parse_datatype_string`` needs a live
   context).  returnTypes must be DataType objects.
2. pytest collection and driver tooling import the inventory before
   any session exists; an import-time crash silently disables whole
   test modules (the round-2 incident: tests/test_oracle_inventory.py
   and tests/test_plans.py failed at collection).

Run in a SUBPROCESS so an already-created session in this pytest
process can't mask the failure.
"""

import pkgutil
import subprocess
import sys

import robosystems_spark


def _run_sessionless(code: str) -> None:
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=180,
    )
    assert proc.returncode == 0, (
        f"sessionless import failed:\nstdout: {proc.stdout}\nstderr: {proc.stderr}"
    )


def test_all_modules_import_without_spark_session():
    mods = sorted(
        m.name
        for m in pkgutil.walk_packages(
            robosystems_spark.__path__, prefix="robosystems_spark."
        )
    )
    assert mods, "package walk found no modules"
    body = "\n".join(
        [
            "import importlib",
            "from pyspark.sql import SparkSession",
            *[f"importlib.import_module({m!r})" for m in mods],
            # still no session after importing everything
            "assert SparkSession.getActiveSession() is None",
        ]
    )
    _run_sessionless(body)


def test_inventory_loads_without_spark_session():
    _run_sessionless(
        "import robosystems_spark.inventory as i\n"
        "qs = i.all_queries()\n"
        "assert len(qs) >= 60, len(qs)\n"
        "from pyspark.sql import SparkSession\n"
        "assert SparkSession.getActiveSession() is None"
    )


def test_pandas_udf_query_runs_on_vanilla_session():
    """The driver builds its OWN SparkSession (none of session.py's
    confs, no package shipping).  A pandas-UDF query must still run:
    the registry wrapper ships the package zip to executors on first
    call (the round-2 ModuleNotFoundError / SESSION_OR_CONTEXT
    incident, both directions)."""
    _run_sessionless(
        "from pyspark.sql import SparkSession\n"
        "spark = (SparkSession.builder.master('local[2]')\n"
        "         .config('spark.ui.enabled','false').getOrCreate())\n"
        "import robosystems_spark.inventory as i\n"
        "rows = i.all_queries()['embedding_cosine_topk'](spark, '/root/testdata/sf0.001').collect()\n"
        "assert len(rows) > 0, rows"
    )


def test_entry_module_imports_without_spark_session():
    _run_sessionless(
        "import __spark_entry__ as e\n"
        "assert callable(e.entry) and callable(e.queries) and callable(e.oracle_sql)\n"
        "from pyspark.sql import SparkSession\n"
        "assert SparkSession.getActiveSession() is None"
    )
