"""Focused tests for the Arrow-native fetch kernel (round-6 rewrite of
_parse_batches -> _parse_arrow): the vectorized LUT link derivation and
the per-store decode cache must be value-identical to the reference
per-row kernels the simulator uses."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from crusty_spark import fetch as FE
from crusty_spark.codec import decode_image, phash64
from crusty_spark.fixtures import gen_image_row


def test_derive_links_flat_equals_reference_kernel():
    rng = np.random.default_rng(11)
    n = 5000
    fh = rng.integers(-(2**62), 2**62, size=n, dtype=np.int64)
    ph = rng.integers(-(2**62), 2**62, size=n, dtype=np.int64)
    ph[::5] = 0  # non-admitted rows carry phash 0 in the real pipeline
    admit = rng.random(n) < 0.8
    ints, exts = FE.derive_links_np(fh, ph)
    off_i, val_i, off_e, val_e = FE.derive_links_flat(fh, ph, admit)
    vi, ve = val_i.to_pylist(), val_e.to_pylist()
    assert off_i[0] == 0 and off_e[0] == 0
    for i in range(n):
        assert vi[off_i[i] : off_i[i + 1]] == (ints[i] if admit[i] else [])
        assert ve[off_e[i] : off_e[i + 1]] == (exts[i] if admit[i] else [])


def test_derive_links_flat_all_blocked_is_empty():
    fh = np.array([1, 2, 3], dtype=np.int64)
    ph = np.array([4, 5, 6], dtype=np.int64)
    off_i, val_i, off_e, val_e = FE.derive_links_flat(fh, ph, np.zeros(3, dtype=bool))
    assert list(off_i) == [0, 0, 0, 0] and len(val_i) == 0
    assert list(off_e) == [0, 0, 0, 0] and len(val_e) == 0


def _fake_store(n_images: int, hole: int | None = None):
    ids = np.empty(n_images, dtype=object)
    captions = np.empty(n_images, dtype=object)
    phashes = np.zeros(n_images, dtype=np.int64)
    blobs: list[bytes | None] = [None] * n_images
    for i in range(n_images):
        image_id, data, w, h, fmt, caption, ph = gen_image_row(i, sizes=[32])
        ids[i], captions[i], phashes[i] = image_id, caption, ph
        blobs[i] = None if i == hole else bytes(data)

    class FakeBC:
        value = {"image_id": ids, "bytes": blobs, "caption": captions, "phash": phashes}

    return FakeBC


def test_store_decode_cache_matches_per_row_decode():
    store = _fake_store(16, hole=5).value
    dec = FE._store_decoded(store)
    assert dec is store["_decoded"]  # cached on the broadcast value
    assert FE._store_decoded(store) is dec  # second call hits the cache
    for i, b in enumerate(store["bytes"]):
        if b is None:
            assert not dec["present"][i]
            assert dec["phash"][i] == 0 and dec["size"][i] == 0
        else:
            px, _ = decode_image(b)
            assert dec["present"][i]
            assert int(dec["phash"][i]) == phash64(px)
            assert int(dec["size"][i]) == len(b)


def test_parse_arrow_store_mode_values():
    """End-to-end kernel check without Spark: statuses, payload fields
    and links must match the scalar twins row by row."""
    store_bc = _fake_store(32)
    n = 4000
    rng = np.random.default_rng(23)
    uh = rng.integers(-(2**62), 2**62, size=n, dtype=np.int64)
    rb = pa.RecordBatch.from_arrays(
        [
            pa.array([f"http://d{i % 50}.com/p{i}" for i in range(n)]),
            pa.array(uh),
            pa.array([f"d{i % 50}.com" for i in range(n)]),
            pa.array(np.zeros(n, dtype=np.int32)),
        ],
        names=["url", "url_hash", "domain", "depth"],
    )
    (out,) = list(FE._parse_arrow(iter([rb]), 32, store_bc))
    rows = out.to_pylist()
    assert len(rows) == n
    store = store_bc.value
    for i, r in enumerate(rows):
        fh, st, hops = FE.py_resolve_redirects(int(uh[i]))
        st_ms, ld_ms, oversz, wait_ms, write_b = FE.py_fetch_phase(fh, int(uh[i]))
        if st == 200 and st_ms >= FE.STATUS_TIMEOUT_MS:
            st = FE.STATUS_STATUS_TIMEOUT
        if st == 200 and ld_ms >= FE.LOAD_TIMEOUT_MS:
            st = FE.STATUS_LOAD_TIMEOUT
        oversize = st == 200 and oversz
        admit = st == 200 and FE.py_content_ok(fh) and not oversize
        assert r["status"] == st and r["n_redirects"] == hops
        assert r["oversize"] == oversize
        assert r["wait_time_ms"] == wait_ms and r["write_size_b"] == write_b
        if hops > 0:
            assert r["final_url"] == f"http://d{i % 50}.com/r{fh % FE.INTERNAL_PATHS}"
        else:
            assert r["final_url"] == r["url"]
        if admit:
            idx = fh % 32
            assert r["image_id"] == store["image_id"][idx]
            assert r["caption"] == store["caption"][idx]
            assert r["phash_ok"] and r["read_size_b"] == len(store["bytes"][idx])
            ints, exts = FE.py_derive_links(fh, r["phash"])
            assert r["internal_paths"] == ints
            assert r["external_domains"] == exts
        else:
            assert r["image_id"] is None and r["caption"] is None
            assert r["phash"] == 0 and not r["phash_ok"]
            assert r["read_size_b"] == (FE.MAX_RESPONSE_SIZE if oversize else 0)
            assert r["internal_paths"] == [] and r["external_domains"] == []


def test_parse_arrow_empty_batch_skipped():
    rb = pa.RecordBatch.from_arrays(
        [
            pa.array([], type=pa.string()),
            pa.array([], type=pa.int64()),
            pa.array([], type=pa.string()),
            pa.array([], type=pa.int32()),
        ],
        names=["url", "url_hash", "domain", "depth"],
    )
    assert list(FE._parse_arrow(iter([rb]), 32, _fake_store(32))) == []
