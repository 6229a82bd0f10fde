"""Platform helpers: persistent XLA compilation cache.

The reference (torch eager) has no compile step to cache; our jit graphs
cost 1-7 min cold, so serving daemons / preempted trainers opt into a
disk cache via ``TPU.COMPILATION_CACHE`` or ``$UDP_POSE_COMPILATION_CACHE``
(utils/platform.py).  Covers: disabled by default, env + explicit-arg
enablement (arg wins), and a functional check that a jit compile actually
writes reloadable executable entries into the directory.
"""

import glob
import os

import jax
import jax.numpy as jnp


def _snapshot_cache_config():
    names = ("jax_compilation_cache_dir",
             "jax_persistent_cache_min_compile_time_secs",
             "jax_persistent_cache_min_entry_size_bytes")
    return {n: getattr(jax.config, n) for n in names}


def _restore_cache_config(snap):
    for n, v in snap.items():
        jax.config.update(n, v)


def test_disabled_by_default(monkeypatch):
    from udp_pose_tpu.utils.platform import maybe_enable_compilation_cache
    monkeypatch.delenv("UDP_POSE_COMPILATION_CACHE", raising=False)
    snap = _snapshot_cache_config()
    try:
        assert maybe_enable_compilation_cache("") == ""
        assert getattr(jax.config, "jax_compilation_cache_dir") == \
            snap["jax_compilation_cache_dir"]
    finally:
        _restore_cache_config(snap)


def test_env_and_arg_enable(tmp_path, monkeypatch):
    from udp_pose_tpu.utils.platform import maybe_enable_compilation_cache
    snap = _snapshot_cache_config()
    try:
        from udp_pose_tpu.utils.platform import host_cache_fingerprint
        host_sub = "host-" + host_cache_fingerprint()
        env_dir = tmp_path / "env_cache"
        monkeypatch.setenv("UDP_POSE_COMPILATION_CACHE", str(env_dir))
        assert maybe_enable_compilation_cache("") == \
            str(env_dir / host_sub)
        assert (env_dir / host_sub).is_dir()

        # the explicit config value (TPU.COMPILATION_CACHE) wins over env
        cfg_dir = tmp_path / "cfg_cache"
        assert maybe_enable_compilation_cache(str(cfg_dir)) == \
            str(cfg_dir / host_sub)
        assert getattr(jax.config, "jax_compilation_cache_dir") == \
            str(cfg_dir / host_sub)
    finally:
        _restore_cache_config(snap)


def test_compile_writes_cache_entries(tmp_path):
    """A jit compile lands serialized executables in the cache dir.

    Runs in a SUBPROCESS: jax initializes the persistent cache once per
    process at the first cached compile, so any earlier suite test that
    compiled with a cache dir configured (e.g. an in-process dryrun with
    the repo-local warm cache) would pin THAT dir and make an in-process
    version of this test order-dependent."""
    import subprocess
    import sys

    code = f"""
import glob, os
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from udp_pose_tpu.utils.platform import maybe_enable_compilation_cache
os.environ.pop("UDP_POSE_COMPILATION_CACHE", None)
d = maybe_enable_compilation_cache({str(tmp_path / "xc")!r})
assert d
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
f = jax.jit(lambda x: jnp.tanh(x) @ x.T + 1.0)
f(jnp.ones((32, 32), jnp.float32)).block_until_ready()
assert glob.glob(os.path.join(d, "*")), "no persistent-cache entries"
print("CACHE_ENTRIES_OK")
"""
    p = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert p.returncode == 0 and "CACHE_ENTRIES_OK" in p.stdout, (
        p.stdout, p.stderr[-1500:])


def test_refused_on_axon_relay(tmp_path, monkeypatch, capsys):
    """On the axon relay platform the cache must refuse to enable:
    measured there, entries write but never reload (a warm rerun
    recompiles at full cost and a cache-enabled serving warmup stalled),
    so enabling it only adds serialization overhead."""
    from udp_pose_tpu.utils.platform import maybe_enable_compilation_cache
    snap = _snapshot_cache_config()
    plat_snap = jax.config.jax_platforms
    try:
        jax.config.update("jax_platforms", "axon")
        d = tmp_path / "axon_cache"
        assert maybe_enable_compilation_cache(str(d)) == ""
        assert not d.exists()
        assert getattr(jax.config, "jax_compilation_cache_dir") == \
            snap["jax_compilation_cache_dir"]
        assert "axon" in capsys.readouterr().err
    finally:
        jax.config.update("jax_platforms", plat_snap)
        _restore_cache_config(snap)


def test_host_cache_fingerprint_keying():
    """VERDICT r4 item 8: the warm-cache key must include host machine
    features so an XLA:CPU AOT executable never loads on a host with
    different flags (the dryrun's SIGILL-warning tail)."""
    from udp_pose_tpu.utils.platform import host_cache_fingerprint

    a = host_cache_fingerprint("flags\t\t: sse2 avx avx2 fma\n",
                               versions=("0.9.0", "0.9.0"))
    a2 = host_cache_fingerprint("flags\t\t: avx2 fma sse2 avx\n",
                                versions=("0.9.0", "0.9.0"))
    b = host_cache_fingerprint("flags\t\t: sse2 avx\n",
                               versions=("0.9.0", "0.9.0"))
    c = host_cache_fingerprint("flags\t\t: sse2 avx avx2 fma\n",
                               versions=("0.9.1", "0.9.0"))
    assert a == a2                      # flag ORDER is not a new host
    assert len(a) == 12 and a != b and a != c
    # the live path (real /proc/cpuinfo + jax versions) is stable
    assert host_cache_fingerprint() == host_cache_fingerprint()


def test_compilation_cache_dir_is_host_scoped(tmp_path):
    """maybe_enable_compilation_cache scopes the directory by the host
    fingerprint (a host change invalidates instead of risking SIGILL)."""
    import jax

    from udp_pose_tpu.utils.platform import (host_cache_fingerprint,
                                             maybe_enable_compilation_cache)

    d = maybe_enable_compilation_cache(str(tmp_path / "cache"))
    try:
        assert d.endswith("host-" + host_cache_fingerprint())
        assert os.path.isdir(d)
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
