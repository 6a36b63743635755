"""Driver contract for the spark-graft builder (PySpark target).

Thin façade over ``server_spark.registry``: the driver's verify runs
``entry(spark)`` as a smoke check, runs each ``queries()[name]`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]``
via DuckDB (row-count + schema + order-insensitive value-hash).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Make the repo importable no matter where the driver launched from —
# both in this process and (via PYTHONPATH, if the SparkSession isn't
# up yet) in Spark's Python workers.
import os  # noqa: E402

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
# compare path ENTRIES, not substrings: PYTHONPATH=/root/repository
# contains '/root/repo' as a substring and would wrongly suppress the
# append, leaving Python workers unable to import server_spark
if _REPO not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
    os.environ["PYTHONPATH"] = (
        _REPO + os.pathsep + os.environ["PYTHONPATH"]
        if os.environ.get("PYTHONPATH")
        else _REPO
    )

from server_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's live-auctions read path end-to-end: scan → price
    stats with exact median → broadcast item enrich → deterministic
    paginated top page (SURVEY.md §3.1, §7.1).
    """
    from server_spark.queries.core import flagship

    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-expressible query."""
    return registry.oracle_sql()
