"""Native .mc cache codec tests: correctness vs json, format interop."""

import json

import numpy as np
import pytest

from code_robchar_tpu.utils import native_io


pytestmark = pytest.mark.skipif(not native_io.native_available(),
                                reason="no C++ toolchain")


def test_roundtrip_exact(rng):
    x = rng.normal(size=(3, 5, 7))
    text = native_io.encode_tensor(x)
    back = native_io.decode_tensor(text)
    np.testing.assert_array_equal(back, x)  # shortest round-trip is bit-exact


@pytest.mark.quick
def test_native_path_actually_engages(rng):
    """Drive the C codec DIRECTLY (no json fallback) on non-hypercube
    rectangular shapes.  Regression: the original parser stored shape
    slots in completion order instead of depth order, so every tensor
    whose dims weren't all equal returned rc=-4 and production decodes
    silently took the stdlib-json fallback — all 'native' decode tests
    were green without the native decoder ever succeeding."""
    lib = native_io._load()
    for shp in [(3, 2), (2, 3), (11, 13, 7), (5, 1, 1), (1, 4), (6,),
                (2, 3, 4, 5)]:
        x = rng.normal(size=shp)
        text = native_io._encode_native(
            np.ascontiguousarray(x, dtype=np.float64), lib)
        back = native_io._decode_native(text, lib)  # raises on rc != 0
        assert back.shape == shp
        np.testing.assert_array_equal(back, x)
        # and a stdlib-json rendering of the same tensor decodes natively
        back2 = native_io._decode_native(json.dumps(x.tolist()), lib)
        np.testing.assert_array_equal(back2, x)


@pytest.mark.quick
def test_native_encode_bracket_heavy_shapes(rng):
    """Trailing size-1 dims maximise per-scalar bracket overhead; the
    original capacity bound (total*29) under-allocated for them (heap
    overflow beyond ~1024 elements at shape (N,1,1))."""
    lib = native_io._load()
    x = rng.normal(size=(3000, 1, 1))
    text = native_io._encode_native(
        np.ascontiguousarray(x, dtype=np.float64), lib)
    back = native_io._decode_native(text, lib)
    np.testing.assert_array_equal(back, x)
    np.testing.assert_array_equal(np.asarray(json.loads(text)), x)


@pytest.mark.quick
def test_native_decoder_rejects_mixed_rank(rng):
    """A nest whose branches have different depth must be rejected, not
    silently flattened into a plausible-looking rectangle."""
    lib = native_io._load()
    for bad in ["[[[1]],[2]]", "[[1,[2]]]"]:
        with pytest.raises(native_io.NativeCodecError):
            native_io._decode_native(bad, lib)


@pytest.mark.quick
def test_native_decoder_bounds_nest_depth():
    """A corrupted / hostile body nested deeper than the 8-dim ABI cap
    must come back as an error (rc=-5), not a C-stack overflow: the
    post-parse shape.size() check can never run if the recursion itself
    crashes the process (and the json fallback would then never engage)."""
    lib = native_io._load()
    for depth in (9, 64, 100_000):
        bad = "[" * depth + "1" + "]" * depth
        with pytest.raises(native_io.NativeCodecError):
            native_io._decode_native(bad, lib)
    # exactly 8 dims still parses
    ok = native_io._decode_native("[" * 8 + "1" + "]" * 8, lib)
    assert ok.shape == (1,) * 8


def test_interop_with_python_json(rng):
    x = rng.uniform(size=(4, 6))
    # native-encoded text parses with stdlib json to the same values
    via_json = np.asarray(json.loads(native_io.encode_tensor(x)))
    np.testing.assert_array_equal(via_json, x)
    # json-encoded text parses with the native decoder
    back = native_io.decode_tensor(json.dumps(x.tolist()))
    np.testing.assert_array_equal(back, x)


def test_nan_and_inf_tokens():
    x = np.array([[1.0, np.nan], [np.inf, -np.inf]])
    text = native_io.encode_tensor(x)
    back = native_io.decode_tensor(text)
    assert np.isnan(back[0, 1])
    assert back[1, 0] == np.inf and back[1, 1] == -np.inf
    # Python json emits the same tokens and both sides accept them
    back2 = native_io.decode_tensor(json.dumps(x.tolist()))
    assert np.isnan(back2[0, 1]) and back2[1, 0] == np.inf


def test_mc_envelope_roundtrip(tmp_path, rng):
    tensors = {"ppo": rng.uniform(size=(2, 3, 4)),
               "lbfgs": rng.uniform(size=(2, 3, 4))}
    path = str(tmp_path / "x.mc")
    native_io.dump_mc(tensors, path)
    # stdlib json can read the envelope
    loaded = json.load(open(path))
    assert set(loaded) == {"ppo", "lbfgs"}
    np.testing.assert_array_equal(np.asarray(loaded["ppo"]),
                                  tensors["ppo"])
    # native loader round-trips
    nat = native_io.load_mc(path)
    np.testing.assert_array_equal(nat["lbfgs"], tensors["lbfgs"])


def test_reference_style_envelope(tmp_path, rng):
    # a json.dump-produced file (reference writer) loads natively
    tensors = {"snob": rng.uniform(size=(2, 2, 2)).tolist()}
    path = str(tmp_path / "ref.mc")
    json.dump(tensors, open(path, "w"))
    nat = native_io.load_mc(path)
    np.testing.assert_allclose(nat["snob"], np.asarray(tensors["snob"]),
                               atol=0)


def test_decoder_rejects_ragged():
    with pytest.raises(Exception):
        bad = native_io.decode_tensor("[[1,2],[3]]")
        # fallback json path would return object array; native returns
        # error -> json fallback raises ValueError on ragged
        np.asarray(bad, dtype=float)


def test_mc_sidecar_roundtrip_and_freshness(tmp_path, rng):
    """The .mcb binary sidecar must round-trip exactly, be preferred when
    fresh, and be ignored when stale (JSON stays canonical)."""
    import os
    import time
    import numpy as np
    from code_robchar_tpu.utils import native_io

    path = str(tmp_path / "t.mc")
    tens = {"ppo": rng.normal(size=(2, 3, 4)), "snob": rng.normal(size=(2, 3, 4))}
    native_io.dump_mc(tens, path)
    assert os.path.exists(path + ".mcb")
    got = native_io.load_mc(path)
    for k in tens:
        np.testing.assert_array_equal(got[k], tens[k])

    # stale sidecar: rewrite the JSON only -> loader must fall back to it
    time.sleep(0.05)
    tens2 = {"ppo": tens["ppo"] + 1.0}
    import json
    with open(path, "w") as f:
        json.dump({k: v.tolist() for k, v in tens2.items()}, f)
    got2 = native_io.load_mc(path)
    assert set(got2) == {"ppo"}
    np.testing.assert_allclose(got2["ppo"], tens2["ppo"], rtol=0, atol=0)
