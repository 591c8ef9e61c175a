"""Driver-side ontology fetch with cache TTL, retry/backoff, and offline
mode (SURVEY §2.1 S6; reference: src/phenoqc/mapping.py:145-201).

This is a driver concern — executors never do I/O for ontologies (the
parsed dictionaries ride a Spark broadcast).  The fetcher is injectable so
tests exercise retry/offline behavior without network (the reference tests
do the same by monkeypatching HTTP — tests/test_offline_and_retry.py).
"""

from __future__ import annotations

import os
import time
from typing import Callable, Optional

DEFAULT_TTL_DAYS = 30  # reference: OntologyMapper.cache_expiry_days default
DEFAULT_RETRIES = 3
DEFAULT_BACKOFF = 2.0


def _default_fetcher(url: str) -> bytes:
    """urllib GET (requests is not guaranteed in this container)."""
    from urllib.request import urlopen

    with urlopen(url, timeout=30) as resp:  # noqa: S310 — driver-side, explicit url
        if getattr(resp, "status", 200) != 200:
            raise OSError(f"HTTP {resp.status} for {url}")
        return resp.read()


def fetch_ontology_with_cache(
    ontology_id: str,
    url: str,
    cache_dir: str,
    file_format: str = "obo",
    ttl_days: float = DEFAULT_TTL_DAYS,
    offline: bool = False,
    retries: int = DEFAULT_RETRIES,
    backoff: float = DEFAULT_BACKOFF,
    fetcher: Optional[Callable[[str], bytes]] = None,
    sleep: Callable[[float], None] = time.sleep,
) -> str:
    """Return a local path to the ontology file, using the cache when fresh.

    Semantics (reference: mapping.py:145-201):
    - cache hit within ``ttl_days`` → cached path, no network;
    - expired/missing + ``offline`` → FileNotFoundError (fail fast);
    - else download with ``retries`` attempts and exponential backoff
      (``backoff ** attempt`` seconds between tries), write to cache.
    """
    os.makedirs(cache_dir, exist_ok=True)
    cached = os.path.join(cache_dir, f"{ontology_id}.{file_format.lower()}")

    if os.path.exists(cached):
        age_days = (time.time() - os.path.getmtime(cached)) / 86400.0
        if age_days < ttl_days:
            return cached

    if offline:
        raise FileNotFoundError(
            f"offline mode: cached ontology for '{ontology_id}' missing or "
            f"expired at '{cached}'"
        )

    fetch = fetcher or _default_fetcher
    last_exc: Optional[Exception] = None
    for attempt in range(retries):
        try:
            data = fetch(url)
            # temp-then-rename: a write interrupted mid-way (disk full,
            # SIGKILL) must never leave a truncated file at the final path,
            # where the next call within the TTL would treat it as a fresh
            # cache hit.
            tmp = f"{cached}.tmp.{os.getpid()}"
            try:
                with open(tmp, "wb") as fh:
                    fh.write(data)
                os.replace(tmp, cached)
            finally:
                if os.path.exists(tmp):
                    os.remove(tmp)
            return cached
        except Exception as exc:  # noqa: BLE001 — retry semantics mirror the reference
            last_exc = exc
            if attempt < retries - 1:
                sleep(backoff**attempt)
    raise last_exc if last_exc else OSError(f"failed to fetch '{ontology_id}' from '{url}'")
