"""Atomic persistent-cache writes (modulation_mfcc_tpu._harden_cache_writes).

jax's stock LRUCache.put publishes entries with a bare write_bytes and
never overwrites an existing key, so a kill mid-write leaves a permanently
truncated entry; deserializing one segfaulted the full suite twice
(2026-08-21) until the cache dir was wiped. The package patches put to
tmp-file + os.replace when eviction is off. These tests pin the patch.
"""
import os

import modulation_mfcc_tpu  # noqa: F401  (applies the patch on import)

from jax._src import lru_cache


def _mkcache(tmp_path):
    return lru_cache.LRUCache(str(tmp_path), max_size=-1)


def test_patch_applied():
    assert getattr(lru_cache.LRUCache, "_modmfcc_atomic_put", False)


def test_put_writes_entry_and_leaves_no_tmp(tmp_path):
    c = _mkcache(tmp_path)
    c.put("k1", b"payload-bytes")
    assert (tmp_path / "k1-cache").read_bytes() == b"payload-bytes"
    assert c.get("k1") == b"payload-bytes"
    leftovers = [p for p in os.listdir(tmp_path) if p.endswith("-tmp")]
    assert leftovers == []


def test_put_heals_truncated_entry(tmp_path):
    # a kill mid-write under stock jax leaves a short file that put will
    # never repair (first-write-wins); the atomic patch replaces it.
    c = _mkcache(tmp_path)
    (tmp_path / "k2-cache").write_bytes(b"trunc")
    c.put("k2", b"the-full-serialized-executable")
    assert (tmp_path / "k2-cache").read_bytes() == b"the-full-serialized-executable"


def test_orphan_tmp_invisible_to_get(tmp_path):
    c = _mkcache(tmp_path)
    (tmp_path / ".put-orphan-tmp").write_bytes(b"garbage")
    assert c.get("nokey") is None
    c.put("k3", b"v")
    assert c.get("k3") == b"v"
