"""utils/aot: the ahead-of-time executable cache behind bench.py's ladder.

The reference compiles at install time and never at run time (reference
setup.py:9-44); this module is the TPU analog — serialize a compiled
executable under our own deterministic key and reload it in seconds.
These tests exercise the full contract on the CPU backend: key hashing,
save/load round trip, fingerprint gating, corrupt-artifact eviction, and
the load_or_compile source reporting bench.py keys its markers on.
"""

import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_darktable.utils import aot


@pytest.fixture()
def aot_dir(tmp_path, monkeypatch):
    """Isolate both search and save to a per-test dir (TD_AOT_DIR is the
    first search root and, when set, the save root).  Also point the suite's
    persistent XLA compile cache at a throwaway dir: an XLA:CPU executable
    rebuilt FROM that cache serializes, but its deserialized copy loses its
    function registration ("Buffer Definition Event: Function ... not
    found") - only fresh-compiled executables round-trip."""
    d = tmp_path / 'aot'
    monkeypatch.setenv('TD_AOT_DIR', str(d))
    monkeypatch.delenv('TD_NO_AOT', raising=False)
    old = jax.config.jax_compilation_cache_dir
    jax.config.update('jax_compilation_cache_dir', str(tmp_path / 'xla_cache'))
    yield d
    jax.config.update('jax_compilation_cache_dir', old)


def _sharding():
    # deserialize_and_load binds the executable to ALL local devices (see
    # the aot.py docstring), so on this 8-virtual-device CPU backend the
    # test programs must be compiled over the full device set.  On the
    # bench's single-TPU host, plain jit compiles for the 1 local device
    # and the same contract holds trivially.
    import numpy as _np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    mesh = Mesh(_np.array(jax.devices()), ('d',))
    return NamedSharding(mesh, PartitionSpec('d'))


def _compiled(scale=2.0):
    def fn(x):
        return jnp.sum(x * scale), x + scale

    sh = _sharding()
    args = (jax.device_put(
        jnp.arange(48.0, dtype=jnp.float32).reshape(8, 6), sh),)
    jitted = jax.jit(fn, in_shardings=(sh,))
    return jitted.lower(*args).compile(), args


def test_key_deterministic_and_identity_sensitive():
    assert aot.aot_key('id-a') == aot.aot_key('id-a')
    assert aot.aot_key('id-a') != aot.aot_key('id-b')
    # The path is computable without jax/TPU init: pure hash, hex name.
    assert len(aot.aot_key('id-a')) == 64


def test_save_load_round_trip(aot_dir):
    compiled, args = _compiled()
    ident = 'test-round-trip'
    path = aot.save(ident, compiled)
    assert path is not None and path.parent == aot_dir
    assert aot.find_artifact(ident) == path

    # Materialize the original executable's outputs BEFORE deserializing:
    # XLA:CPU registers loaded functions by name process-wide, so loading a
    # second copy of the same program can clobber the first executable's
    # functions while its output buffers are still lazy.
    want = [np.asarray(v) for v in compiled(*args)]
    reloaded = aot.load(ident)
    assert reloaded is not None
    got = reloaded(*args)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(w, np.asarray(g))


def test_load_or_compile_reports_source(aot_dir):
    def fn(x):
        return x * 3.0

    sh = _sharding()
    args = (jax.device_put(jnp.ones((8, 4), jnp.float32), sh),)
    fn = jax.jit(fn, in_shardings=(sh,))
    ident = 'test-source'
    c1, source1 = aot.load_or_compile(fn, args, ident)
    assert source1 == 'compiled'  # nothing saved yet: fresh compile + save
    want = np.asarray(c1(*args))  # materialize before the load (see above)
    c2, source2 = aot.load_or_compile(fn, args, ident)
    assert source2 == 'aot'  # second process-equivalent: deserialized
    np.testing.assert_array_equal(want, np.asarray(c2(*args)))


def test_fingerprint_mismatch_is_a_miss_not_an_error(aot_dir):
    compiled, _ = _compiled()
    ident = 'test-fingerprint'
    path = aot.save(ident, compiled)
    payload = pickle.loads(path.read_bytes())
    payload['fingerprint'] = 'some-other-host|0.0.0'
    path.write_bytes(pickle.dumps(payload))
    assert aot.load(ident) is None
    # A mismatched (but well-formed) artifact is foreign, not corrupt:
    # it must survive for the host it belongs to.
    assert path.exists()


def test_corrupt_cache_artifact_is_evicted(aot_dir):
    ident = 'test-corrupt'
    path = aot_dir / f'{aot.aot_key(ident)}.aotexe'
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(b'not a pickle')
    assert aot.load(ident) is None
    assert not path.exists()  # evicted from the writable cache dir


def test_disabled_by_env(aot_dir, monkeypatch):
    compiled, _ = _compiled()
    ident = 'test-disabled'
    aot.save(ident, compiled)
    monkeypatch.setenv('TD_NO_AOT', '1')
    assert aot.find_artifact(ident) is None
    assert aot.save(ident, compiled) is None


def test_search_order_prefers_env_dir(aot_dir):
    dirs = aot.search_dirs()
    assert dirs[0] == aot_dir
    # Committed repo artifacts ride with the code to fresh hosts.
    assert dirs[1].parts[-2:] == ('artifacts', 'aot')
    assert aot.save_dir() == aot_dir
