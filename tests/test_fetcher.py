"""S1 raw-layer fetcher (sources/fetcher.py) — offline via file://
URLs and fakes; parity points cite dvf_fetcher.py."""

from __future__ import annotations

import contextlib
import os

import pytest

from projet_big_data_boutin_danre_spark.pipeline import DatalakeLayout
from projet_big_data_boutin_danre_spark.sources.fetcher import (
    DVF_URL,
    fetch_dvf,
    fetch_file,
)


def _src(tmp_path, payload: bytes, name="src.bin"):
    p = tmp_path / name
    p.write_bytes(payload)
    return "file://" + str(p)


def test_fetch_file_streams_bytes(tmp_path):
    payload = os.urandom(50_000)  # > chunk size: multiple read() loops
    url = _src(tmp_path, payload)
    target = str(tmp_path / "raw" / "out.bin")
    res = fetch_file(url, target, chunk_size=4096)
    assert not res.skipped
    assert res.bytes_written == len(payload)
    assert open(target, "rb").read() == payload
    assert not os.path.exists(target + ".part")


def test_fetch_is_idempotent_then_forceable(tmp_path):
    # non-empty target short-circuits (dvf_fetcher.py:21-23)
    url = _src(tmp_path, b"v1")
    target = str(tmp_path / "out.bin")
    assert not fetch_file(url, target).skipped
    again = fetch_file(_src(tmp_path, b"v2-longer", "src2.bin"), target)
    assert again.skipped and open(target, "rb").read() == b"v1"
    forced = fetch_file(
        _src(tmp_path, b"v2-longer", "src2.bin"), target, force=True
    )
    assert not forced.skipped and open(target, "rb").read() == b"v2-longer"


def test_empty_existing_target_is_refetched(tmp_path):
    # the size>0 guard: an empty file from a dead writer doesn't count
    target = str(tmp_path / "out.bin")
    open(target, "wb").close()
    res = fetch_file(_src(tmp_path, b"data"), target)
    assert not res.skipped and open(target, "rb").read() == b"data"


def test_failed_transfer_leaves_nothing(tmp_path):
    class Boom:
        def __init__(self):
            self.calls = 0

        def read(self, n):
            self.calls += 1
            if self.calls > 2:
                raise OSError("connection reset")
            return b"x" * n

    @contextlib.contextmanager
    def opener(url):
        yield Boom()

    target = str(tmp_path / "out.bin")
    with pytest.raises(OSError):
        fetch_file("https://example.invalid/f", target, opener=opener)
    # no partial target, no .part — skip-if-exists stays correct
    assert not os.path.exists(target)
    assert not os.path.exists(target + ".part")


def test_unsupported_scheme_raises(tmp_path):
    with pytest.raises(ValueError, match="scheme"):
        fetch_file("ftp://host/f", str(tmp_path / "o"))


def test_fetch_dvf_lands_at_layout_raw_path(tmp_path):
    lake = tmp_path / "lake"
    lay = DatalakeLayout(str(lake), "20260101")
    res = fetch_dvf(lay, _src(tmp_path, b"csv.gz bytes"))
    assert res.path == lay.raw_dvf == f"{lake}/raw/gov/dvf_full.csv.gz"
    assert open(res.path, "rb").read() == b"csv.gz bytes"
    assert DVF_URL.startswith("https://files.data.gouv.fr/")
