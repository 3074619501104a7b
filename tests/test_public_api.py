"""Contract tests for public-API names no other test exercises directly.

Every name exported by a package ``__all__`` is part of the migration
surface (docs/MIGRATION.md); these pin the small utility/parity entries —
the big entries (models, engine, figures) have their own modules.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg

from code_robchar_tpu.ops import (basis_state, control_projectors,
                                  transfer_fidelity, xx_hamiltonian)
from code_robchar_tpu.ops.chain import add_bias
from code_robchar_tpu.utils import (Deadline, RunRecord, TimeoutError_,
                                    TopControllers, dump_json, load_json,
                                    mc_cache_name, noises_tag)


def test_basis_state_one_hot():
    psi = np.asarray(basis_state(5, 3))
    assert psi.shape == (5,)
    assert np.iscomplexobj(psi)
    expected = np.zeros(5)
    expected[3] = 1.0
    np.testing.assert_array_equal(psi, expected)


def test_control_projectors_match_reference_contract():
    """C[k] = e_k e_k^T (qnewton.py:153-159); sum_k b_k C_k is the diag-add
    the hot path inlines via add_bias."""
    n = 4
    cc = np.asarray(control_projectors(n))
    assert cc.shape == (n, n, n)
    eye = np.eye(n)
    for k in range(n):
        np.testing.assert_array_equal(cc[k].real, np.outer(eye[k], eye[k]))
    np.testing.assert_array_equal(cc.sum(0).real, eye)

    h = np.asarray(xx_hamiltonian(n))
    b = np.arange(1.0, n + 1.0)
    via_projectors = h + np.tensordot(b, cc, axes=1)
    np.testing.assert_allclose(np.asarray(add_bias(jnp.asarray(h),
                                                   jnp.asarray(b))),
                               via_projectors, atol=0, rtol=0)


def test_transfer_fidelity_matches_scipy_expm():
    """|<out| exp(-i t H) |in>|^2 vs the reference's scipy path
    (qnewton.py:397-400) at the x64 parity bar."""
    rng = np.random.default_rng(11)
    n, t = 5, 1.7
    a = rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))
    h = (a + a.conj().T) / 2
    u = scipy.linalg.expm(-1j * t * h)
    want = abs(u[4, 0]) ** 2
    got = float(transfer_fidelity(jnp.asarray(h), jnp.asarray(t), 0, 4))
    np.testing.assert_allclose(got, want, atol=1e-10, rtol=0)
    # batched over a leading axis
    hb = jnp.stack([jnp.asarray(h)] * 3)
    got_b = np.asarray(transfer_fidelity(hb, jnp.asarray(t), 0, 4))
    np.testing.assert_allclose(got_b, want, atol=1e-10, rtol=0)


def test_noises_tag_and_mc_cache_name_reproduce_shipped_literal():
    """The cache filename IS the wire format: the str(np.ndarray) tag must
    reproduce the reference's shipped cache names byte-for-byte
    (mcsim.py:351-356)."""
    noises = np.linspace(0, 0.1, 11)
    assert noises_tag(noises) == ("[0.   0.01 0.02 0.03 0.04 0.05 0.06 "
                                  "0.07 0.08 0.09 0.1 ]")
    name = mc_cache_name("ppo_spin_5_0-2_c_1000.le", "0.05", 1, noises)
    assert name == ("ppo_spin_5_0-2_c_1000.le_tn0.05_br_1_nlvl[0.   0.01 "
                    "0.02 0.03 0.04 0.05 0.06 0.07 0.08 0.09 0.1 ].mc")
    # lbfgs cells pass training_noise=None; floats keep plain str()
    assert "_tnNone_" in mc_cache_name("x.le", None, 2, noises)
    assert "_tn0.1_" in mc_cache_name("x.le", 0.1, 2, noises)


def test_dump_json_atomic_roundtrip(tmp_path):
    path = tmp_path / "deep" / "nested" / "cache.json"
    obj = {"a": [1, 2.5, None], "b": {"c": "d"}}
    dump_json(obj, str(path))
    assert load_json(str(path)) == obj
    # atomic write leaves no .tmp behind and overwrites in place
    dump_json({"a": 1}, str(path))
    assert load_json(str(path)) == {"a": 1}
    assert not os.path.exists(str(path) + ".tmp")


def test_top_controllers_eviction_quirks():
    """Reference parity (qnewton.py:604-616): fid-keyed dict — equal fids
    collide/overwrite, and once full the min is evicted unconditionally,
    even when the newcomer is worse."""
    top = TopControllers(capacity=2)
    top.offer(0.5, [1.0])
    top.offer(0.5, [2.0])            # same key: overwrite, store still size 1
    assert top.controllers() == [[2.0]]
    top.offer(0.9, [3.0])
    top.offer(0.1, [4.0])            # full: evicts min(0.5) then inserts 0.1
    assert len(top) == 2
    assert top.best_fid() == 0.9
    assert [4.0] in top.controllers() and [2.0] not in top.controllers()
    top.offer_many([0.95, 0.05], [[5.0], [6.0]])
    assert len(top.controllers()) == 2
    assert top.best_fid() == 0.95


def test_run_record_keys_and_checkpoint_boundaries():
    rec = RunRecord(landscape_exploration=True, records_update_rate=100,
                    run_until_completion_its=1000)
    assert set(rec.record) == {"time_to_get_fid", "func_calls", "iterations",
                               "repeats", "best_fid", "controller"}
    top = TopControllers(4)
    top.offer(0.7, [1.0, 2.0])
    rec.save(func_calls=150, iterations=3, repeats=1, controller=[1.0, 2.0],
             best_fid=0.7, top=top)
    assert rec.record["func_calls"] == 150
    assert rec.record["best_fid"] == 0.7
    assert rec.record["controllers"] == [[1.0, 2.0]]
    # fcall-checkpointed records (qnewton.py:107-115): keyed by the fcall
    # count that crossed the boundary; the boundary advances by +rate per
    # snapshot (NOT to the fcall count), so a burst past several boundaries
    # records repeatedly until the counter catches up — reference quirk
    assert list(rec.records) == [150]                    # counter now 100
    rec.save(func_calls=160, iterations=4, repeats=1, controller=[1.0, 2.0],
             best_fid=0.7, top=top)                      # 160 > 100: records
    assert list(rec.records) == [150, 160]               # counter now 200
    rec.save(func_calls=260, iterations=5, repeats=1, controller=[1.0, 2.0],
             best_fid=0.7, top=top)                      # 260 > 200: records
    assert list(rec.records) == [150, 160, 260]          # counter now 300
    rec.save(func_calls=280, iterations=6, repeats=1, controller=[1.0, 2.0],
             best_fid=0.7, top=top)                      # 280 < 300: skipped
    assert list(rec.records) == [150, 160, 260]


def test_deadline_and_timeout_decorator():
    from code_robchar_tpu.utils.timeout import timeout

    dl = Deadline(3600)
    assert not dl.expired() and dl.remaining() > 3590
    dl.check()                                     # no raise
    expired = Deadline(-1.0)
    assert expired.expired()
    try:
        expired.check("ctx")
    except TimeoutError_ as e:
        assert isinstance(e, AssertionError)       # reference raises
        assert "ctx" in str(e)                     # AssertionError("timeout")
    else:
        raise AssertionError("Deadline.check did not raise")

    # decorator clock starts at decoration, not call (reference semantics)
    @timeout(-1.0)
    def fn():
        return 1

    try:
        fn()
    except TimeoutError_:
        pass
    else:
        raise AssertionError("timeout decorator did not raise")

    @timeout(3600)
    def ok():
        return 2

    assert ok() == 2


def test_shard_batch_places_without_changing_values():
    from code_robchar_tpu.parallel import make_mesh, shard_batch

    mesh = make_mesh(8)
    x = jnp.arange(64.0).reshape(16, 4)
    y = shard_batch(mesh, x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    assert len(y.sharding.device_set) == 8
    # non-leading axis placement
    z = shard_batch(mesh, x.T, axis=1)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(x.T))


def test_remove_redundant_ticks_strips_inner_axes():
    import matplotlib
    matplotlib.use("Agg", force=True)
    import matplotlib.pyplot as plt

    from code_robchar_tpu.mc import remove_redundant_ticks

    fig, ax = plt.subplots(2, 3)
    for row in ax:
        for a in row:
            a.plot([0, 1], [0, 1])
            a.set_ylabel("y")
            a.set_xlabel("x")
    remove_redundant_ticks(ax, 2, 3, remove_titles=True,
                           remove_x_title_too=True)
    assert len(ax[0][1].get_xticks()) == 0          # inner: stripped
    assert ax[0][1].get_xlabel() == ""
    assert len(ax[1][1].get_yticks()) == 0
    assert ax[1][1].get_ylabel() == ""
    assert len(ax[1][0].get_xticks()) > 0           # bottom-left: kept
    assert len(ax[0][0].get_yticks()) > 0
    assert ax[1][0].get_ylabel() == "y"
    plt.close(fig)
