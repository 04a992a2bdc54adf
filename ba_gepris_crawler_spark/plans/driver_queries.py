"""Compatibility shim: the driver-contract query registry now lives in
ba_gepris_crawler_spark/plans/queries/ split by family (round-5 hygiene —
this module had grown past 2,800 lines). REGISTRY contents and order are
unchanged; import sites (__spark_entry__, bench.py, tests) keep working.
"""

from __future__ import annotations

from ba_gepris_crawler_spark.plans.queries import REGISTRY, SparkFn  # noqa: F401
