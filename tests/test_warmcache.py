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


# ---------------------------------------------------------------------------
# r4 size policy: lookup-recorded pruning, size cap, version-gated seeding
# ---------------------------------------------------------------------------

def test_snapshot_prunes_to_looked_up_keys(tmp_path):
    repo = tmp_path / "repo"
    repo.mkdir()
    live = _fake_live_cache(str(tmp_path / "live"))
    manifest = warmcache.snapshot(
        str(repo), live, keep_keys={"jit__denoise-abc-cache"}
    )
    assert sorted(manifest["entries"]) == ["jit__denoise-abc-cache"]
    assert manifest["pruned_not_looked_up"] == 1


def test_snapshot_empty_keep_set_raises(tmp_path):
    repo = tmp_path / "repo"
    repo.mkdir()
    live = _fake_live_cache(str(tmp_path / "live"))
    try:
        warmcache.snapshot(str(repo), live, keep_keys={"jit__unknown-cache"})
    except RuntimeError as e:
        assert "lookup log" in str(e)
    else:
        raise AssertionError("a keep set matching nothing must fail loudly")


def test_snapshot_cap_enforced_and_preserves_old_snapshot(tmp_path):
    repo = tmp_path / "repo"
    repo.mkdir()
    live = _fake_live_cache(str(tmp_path / "live"))
    warmcache.snapshot(str(repo), live)  # a good prior snapshot
    try:
        warmcache.snapshot(str(repo), live, cap_mb=1e-8)
    except RuntimeError as e:
        assert "cap" in str(e)
    else:
        raise AssertionError("cap must be enforced")
    # the failed snapshot must NOT have destroyed the committed one
    assert len(os.listdir(warmcache.warm_dir(str(repo)))) == 3


def test_seed_skips_foreign_jax_version(tmp_path):
    repo = tmp_path / "repo"
    repo.mkdir()
    live = _fake_live_cache(str(tmp_path / "live"))
    warmcache.snapshot(str(repo), live)
    mp = os.path.join(warmcache.warm_dir(str(repo)), warmcache.MANIFEST)
    m = json.load(open(mp))
    m["jax_version"] = "0.0.1-foreign"
    json.dump(m, open(mp, "w"))
    dst = str(tmp_path / "cache")
    assert warmcache.seed(str(repo), dst) == 0


def test_seed_copies_not_hardlinks(tmp_path):
    """ADVICE r3: the committed snapshot must not share inodes with the
    live cache dir other software writes into."""
    repo = tmp_path / "repo"
    repo.mkdir()
    live = _fake_live_cache(str(tmp_path / "live"))
    warmcache.snapshot(str(repo), live)
    dst = str(tmp_path / "cache")
    warmcache.seed(str(repo), dst)
    for name in os.listdir(dst):
        assert os.stat(os.path.join(dst, name)).st_nlink == 1, name


def test_read_lookup_log_normalizes_cache_suffix(tmp_path):
    log = tmp_path / "lookups.log"
    log.write_text("jit_f-123\njit_g-456-cache\n\njit_f-123\n")
    assert warmcache.read_lookup_log(str(log)) == {
        "jit_f-123-cache",
        "jit_g-456-cache",
    }


def test_record_lookups_hooks_and_logs(tmp_path):
    import jax._src.compilation_cache as cc

    orig = cc.get_executable_and_time
    log = str(tmp_path / "l.log")
    try:
        warmcache.record_lookups(log)
        hooked = cc.get_executable_and_time
        assert getattr(hooked, "_unigeo_logged", False)
        warmcache.record_lookups(log)  # idempotent: no double-wrap
        assert cc.get_executable_and_time is hooked
    finally:
        cc.get_executable_and_time = orig
