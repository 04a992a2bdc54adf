from __future__ import annotations

import pytest

from ba_gepris_crawler_spark.session import get_spark
from ba_gepris_crawler_spark.sources.synthetic_site import SiteConfig


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", shuffle_partitions=8, app_name="pytest")
    yield s


@pytest.fixture(scope="session")
def cfg() -> SiteConfig:
    # t1 smoke tier (FIXTURES.md §7): small but exercises every quirk.
    return SiteConfig(
        hosts=("gepris.example.org", "alt1.example.org", "alt2.example.org"),
        n_projects=40,
        n_persons=24,
        n_institutions=8,
        hits_per_page=10,
        seed=42,
    )
