"""HTTP raw-layer fetcher (SURVEY.md §2.1 S1).

Re-expresses the reference's extract stage
(``/root/reference/dags/lib/dvf_fetcher.py:16-35``): stream one
upstream archive into the datalake raw layer, skipping when a
non-empty file already exists (idempotent re-run), and leaving no
partial file behind on failure.

Spark-first notes: fetching ONE upstream archive is inherently a
single driver-side stream — the engine's parallelism begins at the
raw-layer *scan*, not the download. What matters at 100 TB is that the
raw layer is append-shaped (per-day paths, skip-if-exists) so a fleet
of fetchers can land shards independently and every downstream stage
prunes by partition.

Deliberate divergences from the reference, documented per ADVICE
round-4 lessons on swap atomicity:

- The reference writes the target in place and deletes it on error
  (``dvf_fetcher.py:27-34``); here the stream lands in a ``.part``
  temp file and is ``os.replace``'d into place, so the visible target
  transitions atomically empty→complete and a crashed fetch can never
  be mistaken for a finished one by the skip-if-exists guard.
- Transport is a pluggable ``opener`` (default: stdlib
  ``urllib.request.urlopen``) so tests run fully offline against
  ``file://`` URLs or an in-memory fake — no third-party HTTP client.
"""

from __future__ import annotations

import os
import urllib.request
from dataclasses import dataclass
from typing import Callable, ContextManager
from urllib.parse import urlparse

__all__ = ["FetchResult", "fetch_file", "fetch_dvf", "DVF_URL"]

# Public open-data URL, verbatim from the reference
# (``dvf_fetcher.py:16``).
DVF_URL = "https://files.data.gouv.fr/geo-dvf/latest/csv/2025/full.csv.gz"

_CHUNK = 8192  # reference chunk size (``dvf_fetcher.py:30``)


@dataclass(frozen=True)
class FetchResult:
    """Outcome of one fetch: final path, bytes written this call
    (0 when skipped), and whether the skip-if-exists guard fired."""

    path: str
    bytes_written: int
    skipped: bool


def _default_opener(url: str) -> ContextManager:
    scheme = urlparse(url).scheme
    if scheme not in ("http", "https", "file"):
        raise ValueError(
            f"fetch_file: unsupported URL scheme {scheme!r} in {url!r} "
            "(pass an explicit opener for custom transports)"
        )
    return urllib.request.urlopen(url)  # noqa: S310 — scheme-gated above


def fetch_file(
    url: str,
    target_path: str,
    *,
    opener: Callable[[str], ContextManager] | None = None,
    chunk_size: int = _CHUNK,
    force: bool = False,
) -> FetchResult:
    """Stream ``url`` into ``target_path`` (idempotent).

    Parity with ``dvf_fetcher.py:16-35``: the parent directory is
    created, an existing non-empty target short-circuits the download
    (the reference's ``os.path.getsize(...) > 0`` guard — an empty
    file from an old failed writer is re-fetched), and a failed
    transfer leaves nothing behind. ``force=True`` re-downloads
    unconditionally (engine addition for backfills).

    ``opener`` must return a context manager whose value has
    ``read(n) -> bytes`` (``urllib.request.urlopen`` does).
    """
    if opener is None:
        opener = _default_opener
    parent = os.path.dirname(os.path.abspath(target_path))
    os.makedirs(parent, exist_ok=True)

    if (
        not force
        and os.path.exists(target_path)
        and os.path.getsize(target_path) > 0
    ):
        return FetchResult(path=target_path, bytes_written=0, skipped=True)

    part = target_path + ".part"
    written = 0
    try:
        with opener(url) as src, open(part, "wb") as dst:
            while True:
                chunk = src.read(chunk_size)
                if not chunk:
                    break
                dst.write(chunk)
                written += len(chunk)
        os.replace(part, target_path)
    except BaseException:
        if os.path.exists(part):
            os.remove(part)
        raise
    return FetchResult(path=target_path, bytes_written=written, skipped=False)


def fetch_dvf(
    layout,
    url: str = DVF_URL,
    *,
    opener: Callable[[str], ContextManager] | None = None,
    force: bool = False,
) -> FetchResult:
    """The reference's ``extract_dvf`` task (``DAG_Project.py`` →
    ``dvf_fetcher.fetch_dvf_data``): land the public DVF archive at the
    layout's raw-layer path. ``layout`` is a
    :class:`~..pipeline.DatalakeLayout` (anything with ``raw_dvf``)."""
    return fetch_file(url, layout.raw_dvf, opener=opener, force=force)
