"""S1: NVD feed acquisition — driver-side fetch to a landing directory.

Feed download is deliberately NOT a Spark concern (SURVEY §2.1 S1): the
NVD publishes one gzipped JSON artifact per year plus ``recent`` and
``modified`` deltas, and the reference fetches them with
``urllib.request.urlretrieve`` (reference bq_nvd/download.py:32-54).
Here the same driver-side fetch lands artifacts in a local directory and
``read_feed`` (etl.py) scans the landing dir distributed — Spark
parallelizes per feed file, so a full backfill reads all years at once.

The retry loop covers S4's concern as well (reference etl.py:138-154
retries the object-store upload ×3): transient fetch failures retry with
the same bound. Tests exercise the path with ``file://`` URLs — no
network access is assumed anywhere.
"""

from __future__ import annotations

import os
import time
import urllib.error
import urllib.request
from collections.abc import Iterable

# Reference bq_nvd/download.py:8-10 / config.yml:17-23.
URL_BASE = "https://nvd.nist.gov/feeds/json/cve/1.1/"
FEED_PREFIX = "nvdcve-1.1-"
FEED_SUFFIX = ".json.gz"
FIRST_FEED_YEAR = 2002

MAX_RETRIES = 3


def feed_names(through_year: int) -> list[str]:
    """Every published feed name: one per year plus the delta feeds."""
    years = [str(y) for y in range(FIRST_FEED_YEAR, through_year + 1)]
    return years + ["recent", "modified"]


def feed_url(
    name: str,
    url_base: str = URL_BASE,
    prefix: str = FEED_PREFIX,
    suffix: str = FEED_SUFFIX,
) -> str:
    """URL of one feed artifact (reference download.py:45-47)."""
    return f"{url_base}{prefix}{name}{suffix}"


def download_feed(
    name: str,
    landing_dir: str,
    url_base: str = URL_BASE,
    prefix: str = FEED_PREFIX,
    suffix: str = FEED_SUFFIX,
) -> str:
    """Fetch one feed artifact into the landing dir; returns the local
    path. Retries transient failures ×3 (reference etl.py:138-154)."""
    os.makedirs(landing_dir, exist_ok=True)
    dest = os.path.join(landing_dir, f"{prefix}{name}{suffix}")
    url = feed_url(name, url_base, prefix, suffix)
    last_err: Exception | None = None
    for attempt in range(MAX_RETRIES):
        try:
            urllib.request.urlretrieve(url, dest)  # noqa: S310
            return dest
        except (urllib.error.URLError, OSError) as err:
            last_err = err
            if attempt + 1 < MAX_RETRIES:
                time.sleep(2**attempt)
    raise RuntimeError(f"failed to fetch {url} after {MAX_RETRIES} tries") from last_err


def download_feeds(
    names: Iterable[str], landing_dir: str, url_base: str = URL_BASE
) -> list[str]:
    """Fetch a set of feeds serially on the driver (the artifacts are a
    few MB each; parallel ingest happens in the distributed read, not
    the fetch)."""
    return [download_feed(n, landing_dir, url_base) for n in names]
