"""Pallas TPU kernel: batched split-complex Jacobi transfer fidelity.

The XLA lanes formulation (ops/realform.py) expresses each Jacobi rotation
as slice updates on (n, n, B) HBM-resident arrays; XLA fuses well but
still materialises intermediate tiles between rotation steps.  This kernel
pins the ENTIRE working set — the split Hamiltonian (n^2 rows x B lanes)
and the two carried eigenvector rows — in VMEM scratch for all
sweeps x n(n-1)/2 rotations, touching HBM exactly twice per element:
one read of the assembled Hamiltonian, one write of the fidelity.

Layout: a (n*n, TILE) VMEM block per grid step; matrix entry (i, j) lives
on sublane row i*n+j, the batch rides the 128-wide lane dimension.  The
rotation schedule is static and fully unrolled inside the kernel; every
operation is a (1, TILE) or (n, TILE) VPU vector op with static sublane
indices.

Used by the MC engine when `use_pallas=True` on TPU backends; numerically
identical to realform.fidelity_herm_lanes (same schedule, same arithmetic)
— pinned in tests/test_pallas.py on CPU interpret mode and validated on
device by the bench checksum.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

DEFAULT_TILE = 1024


def pick_tile(b: int, max_tile: int = DEFAULT_TILE) -> tuple[int, int]:
    """Legal Mosaic lane tiling for a batch of ``b``: (tile, padded_b).

    Mosaic requires each block's lane (last) dimension be a multiple of
    128 OR equal the full array dimension.  The dispatch wrappers below
    previously required b % 1024 == 0 and silently fell back to the
    ~5x-slower XLA lanes kernel otherwise (e.g. the NM shrink chain at
    512 lanes, b = 512*(d+1)); production batch widths can also be
    data-dependent with no legal dividing tile at all (observed
    b = 5831 from a budget-scheduled restart count).  Policy:

    - b <= max_tile: one whole-array block (always legal, no padding);
    - else the largest multiple-of-128 tile <= max_tile dividing b;
    - else pad b up to the next multiple of 128 and take the largest
      multiple-of-128 tile <= max_tile dividing that (128 always does).

    Callers pad operands up to ``padded_b`` lanes (edge-replicated) and
    slice results back to ``b``; worst-case padding is 127 lanes.
    """
    if b <= max_tile:
        return b, b
    for bp in (b, -(-b // 128) * 128):
        t = (max_tile // 128) * 128
        while t >= 128:
            if bp % t == 0:
                return t, bp
            t -= 128
    raise AssertionError("unreachable: 128 divides the padded batch")


#: rotation-ordering default for every Pallas Jacobi kernel.
#: "roundrobin" arranges each sweep's n(n-1)/2 pivots into n-1 (n odd:
#: n) STAGES of disjoint pairs (circle-method tournament schedule) and
#: hoists the whole stage's angle computations ahead of its rotations.
#: Disjoint pivots make the hoist exact — a rotation never touches
#: another stage-member's pivot entries — and make the stage's rotation
#: streams data-independent, so the VPU can overlap the angle cluster's
#: div/sqrt latencies and interleave the row updates.  Measured on one
#: v5e chip (artifacts/perf/ROOFLINE.md): the dependent-chain ALU probe
#: runs at 4.7 cycles/FMA vs 0.4-1.1 with 4-8 independent streams, and
#: the reorder alone lifts the Hermitian fidelity kernel 50.6 -> 61.7M
#: Hams/s (1.22x) at IDENTICAL sweep counts.  Accuracy at the
#: production sweep policy is at the same f32 floor as cyclic for every
#: n in 3..10 incl. near-degenerate drift-dominated batches (~1e-5).
#: The x64 parity path (ops/realform.py lanes kernels, CPU) keeps the
#: cyclic order — it anchors the 1e-10 reference-parity contract and is
#: not launch-latency-bound.
DEFAULT_ORDER = "roundrobin"


def pair_schedule(n: int, order: str = None):
    """Sweep schedule as a list of stages of disjoint (p, q) pivots.

    "cyclic": the classical row-major order, one pair per stage (the
    pre-round-4 behavior).  "roundrobin": circle-method tournament —
    every stage's pairs are pairwise disjoint and each sweep still
    covers all n(n-1)/2 pairs exactly once."""
    order = order or DEFAULT_ORDER
    if order == "cyclic":
        return [[(p, q)] for p in range(n - 1) for q in range(p + 1, n)]
    if order != "roundrobin":
        raise ValueError(f"unknown rotation order {order!r}")
    players = list(range(n)) + ([None] if n % 2 else [])
    m = len(players)
    stages, arr = [], players[:]
    for _ in range(m - 1):
        pairs = []
        for i in range(m // 2):
            a, b = arr[i], arr[m - 1 - i]
            if a is not None and b is not None:
                pairs.append((min(a, b), max(a, b)))
        stages.append(pairs)
        arr = [arr[0], arr[-1]] + arr[1:-1]
    return stages


def _rotation_body(n, sweeps, ar, ai, vr, vi, eps, order=None):
    """Unrolled Jacobi schedule on VMEM refs.

    ar/ai: (n*n, T) refs; vr/vi: (2*n, T) refs holding rows [in, out].

    Symmetric update: only the column pair (A J) is rotated; rows p, q
    are conjugate mirrors (A'[p,i] = conj(A'[i,p]) — a store + negate per
    entry instead of a second complex rotation), and the 2x2 pivot block
    is closed-form (A'[p,q] = 0 exactly, A'[p,p] = app - t|apq|,
    A'[q,q] = aqq + t|apq|, Rutishauser).  ~2/3 the arithmetic of the
    two-sided update; the imaginary diagonal stays exactly zero.  Same
    formulation as realform._herm_rotate_lanes; pivots ordered by
    ``pair_schedule`` (round-robin stages with hoisted angles by
    default — see DEFAULT_ORDER)."""
    def cmul(xr, xi, yr, yi):
        return xr * yr - xi * yi, xr * yi + xi * yr

    def angles(p, q):
        app = ar[p * n + p, :]
        aqq = ar[q * n + q, :]
        xr = ar[p * n + q, :]
        xi = ai[p * n + q, :]
        r = jnp.sqrt(xr * xr + xi * xi)
        active = r > eps * (jnp.abs(app) + jnp.abs(aqq) + r)
        safe = jnp.where(active, r, 1.0)
        pr = jnp.where(active, xr / safe, 1.0)
        pi_ = jnp.where(active, xi / safe, 0.0)
        tau = (aqq - app) / (2.0 * safe)
        t = jnp.sign(tau) / (jnp.abs(tau) +
                             jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(tau == 0.0, 1.0, t)
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s = t * c
        c = jnp.where(active, c, 1.0)
        s = jnp.where(active, s, 0.0)
        t_eff = jnp.where(active, t, 0.0)
        return pr, pi_, c, s, t_eff, r, xr, xi, app, aqq, active

    def apply(p, q, ang):
        pr, pi_, c, s, t_eff, r, xr, xi, app, aqq, active = ang
        # columns p, q of A at rows i not in {p, q}, mirrored
        # into rows p, q by conjugation
        for i in range(n):
            if i == p or i == q:
                continue
            cpr = ar[i * n + p, :]
            cpi = ai[i * n + p, :]
            cqr = ar[i * n + q, :]
            cqi = ai[i * n + q, :]
            tr, ti = cmul(pr, -pi_, cqr, cqi)
            npr_ = c * cpr - s * tr
            npi_ = c * cpi - s * ti
            ar[i * n + p, :] = npr_
            ai[i * n + p, :] = npi_
            ar[p * n + i, :] = npr_
            ai[p * n + i, :] = -npi_
            tr, ti = cmul(pr, pi_, cpr, cpi)
            nqr_ = s * tr + c * cqr
            nqi_ = s * ti + c * cqi
            ar[i * n + q, :] = nqr_
            ai[i * n + q, :] = nqi_
            ar[q * n + i, :] = nqr_
            ai[q * n + i, :] = -nqi_

        # closed-form pivot block
        zr = jnp.where(active, 0.0, xr)
        zi = jnp.where(active, 0.0, xi)
        ar[p * n + p, :] = app - t_eff * r
        ar[q * n + q, :] = aqq + t_eff * r
        ar[p * n + q, :] = zr
        ar[q * n + p, :] = zr
        ai[p * n + q, :] = zi
        ai[q * n + p, :] = -zi
        # ai diagonal entries start at zero and are never written

        # carried V rows (2 rows x n columns)
        for rrow in range(2):
            wpr = vr[rrow * n + p, :]
            wpi = vi[rrow * n + p, :]
            wqr = vr[rrow * n + q, :]
            wqi = vi[rrow * n + q, :]
            tr, ti = cmul(pr, -pi_, wqr, wqi)
            vr[rrow * n + p, :] = c * wpr - s * tr
            vi[rrow * n + p, :] = c * wpi - s * ti
            tr, ti = cmul(pr, pi_, wpr, wpi)
            vr[rrow * n + q, :] = s * tr + c * wqr
            vi[rrow * n + q, :] = s * ti + c * wqi

    schedule = pair_schedule(n, order)
    for _ in range(sweeps):
        for stage in schedule:
            # hoisted: a stage's pivot entries are mutually untouched,
            # so all its angles read pre-stage values whichever order
            # the rotations then apply in (sequential application is
            # exactly the composed similarity transform)
            angs = [angles(p, q) for (p, q) in stage]
            for (p, q), ang in zip(stage, angs):
                apply(p, q, ang)


def make_fidelity_kernel(n: int, in_spin: int, out_spin: int,
                         sweeps: int, tile: int = DEFAULT_TILE,
                         interpret: bool = False):
    """Build fid = kernel(ar, ai, t): ar/ai (n*n, B), t (1, B) -> (1, B)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    eps = 1e-7

    def kernel(ar_in, ai_in, t_in, fid_out, ar, ai, vr, vi):
        ar[:, :] = ar_in[:, :]
        ai[:, :] = ai_in[:, :]
        rows = jax.lax.broadcasted_iota(jnp.int32,
                                        (2 * n, t_in.shape[-1]), 0)
        sel = (rows == (0 * n + in_spin)) | (rows == (1 * n + out_spin))
        vr[:, :] = jnp.where(sel, 1.0, 0.0).astype(ar_in.dtype)
        vi[:, :] = jnp.zeros((2 * n, t_in.shape[-1]), ar_in.dtype)

        _rotation_body(n, sweeps, ar, ai, vr, vi, eps)

        # phi = sum_k V[out,k] e^{-i t lam_k} conj(V[in,k])
        t = t_in[0, :]
        phr = jnp.zeros_like(t)
        phi = jnp.zeros_like(t)
        for k in range(n):
            lam_k = ar[k * n + k, :]
            bir = vr[0 * n + k, :]
            bii = vi[0 * n + k, :]
            aor = vr[1 * n + k, :]
            aoi = vi[1 * n + k, :]
            gr = aor * bir + aoi * bii
            gi = aoi * bir - aor * bii
            ang = lam_k * t
            fr = jnp.cos(ang)
            fi = -jnp.sin(ang)
            phr = phr + gr * fr - gi * fi
            phi = phi + gr * fi + gi * fr
        fid_out[0, :] = phr * phr + phi * phi

    nn = n * n

    @partial(jax.jit, static_argnames=())
    def run(ar, ai, t):
        b = ar.shape[-1]
        grid = (b // tile,)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((nn, tile), lambda i: (0, i)),
                pl.BlockSpec((nn, tile), lambda i: (0, i)),
                pl.BlockSpec((1, tile), lambda i: (0, i)),
            ],
            out_specs=pl.BlockSpec((1, tile), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((1, b), ar.dtype),
            scratch_shapes=[
                pltpu.VMEM((nn, tile), ar.dtype),
                pltpu.VMEM((nn, tile), ar.dtype),
                pltpu.VMEM((2 * n, tile), ar.dtype),
                pltpu.VMEM((2 * n, tile), ar.dtype),
            ],
            interpret=interpret,
        )(ar, ai, t.reshape(1, b))

    return run


def _sym_angles(n, a, p, q, eps):
    """Rotation angle for real-symmetric pivot (p, q) from the CURRENT
    scratch values (Rutishauser stable form; inactive lanes get the
    identity rotation)."""
    app = a[p * n + p, :]
    aqq = a[q * n + q, :]
    apq = a[p * n + q, :]
    r = jnp.abs(apq)
    active = r > eps * (jnp.abs(app) + jnp.abs(aqq) + r)
    safe = jnp.where(active, apq, 1.0)
    tau = (aqq - app) / (2.0 * safe)
    t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    t = jnp.where(tau == 0.0, 1.0, t)
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    s = t * c
    c = jnp.where(active, c, 1.0)
    s = jnp.where(active, s, 0.0)
    t_eff = jnp.where(active, t, 0.0)
    return c, s, t_eff, apq, app, aqq, active


def _sym_apply(n, a, v, p, q, ang):
    """Symmetric-update rotation at pivot (p, q): rotate columns p, q,
    mirror into rows p, q, closed-form pivot block, rotate carried V
    rows."""
    c, s, t_eff, apq, app, aqq, active = ang
    for i in range(n):
        if i == p or i == q:
            continue
        cp = a[i * n + p, :]
        cq = a[i * n + q, :]
        ncp = c * cp - s * cq
        ncq = s * cp + c * cq
        a[i * n + p, :] = ncp
        a[p * n + i, :] = ncp
        a[i * n + q, :] = ncq
        a[q * n + i, :] = ncq
    z = jnp.where(active, 0.0, apq)
    a[p * n + p, :] = app - t_eff * apq
    a[q * n + q, :] = aqq + t_eff * apq
    a[p * n + q, :] = z
    a[q * n + p, :] = z
    for rr in range(v.shape[0] // n):      # carried V rows
        wp = v[rr * n + p, :]
        wq = v[rr * n + q, :]
        v[rr * n + p, :] = c * wp - s * wq
        v[rr * n + q, :] = s * wp + c * wq


def sym_sweeps_on_scratch(n, sweeps, a, v, eps=1e-7, order=None):
    """Symmetric Jacobi on VMEM scratch ``a`` ((n*n, B): entry (i, j) on
    sublane row i*n+j, batch on lanes), carrying the rows of ``v``
    ((R*n, B), R carried eigenvector rows) through the rotations.
    Shared by the amplitude kernel below and the fused rollout step
    kernel (ops/pallas_rollout.py); symmetric-update formulation
    (conjugate-mirror rows + closed-form pivot block).  Pivot order from
    ``pair_schedule`` — round-robin stages with hoisted angle clusters
    by default (DEFAULT_ORDER; exact because a stage's pivots are
    disjoint)."""
    schedule = pair_schedule(n, order)
    for _ in range(sweeps):
        for stage in schedule:
            angs = [_sym_angles(n, a, p, q, eps) for (p, q) in stage]
            for (p, q), ang in zip(stage, angs):
                _sym_apply(n, a, v, p, q, ang)


def transfer_amp_from_scratch(n, a, v, t):
    """(phr, phi) transfer amplitude from diagonalised scratch ``a`` and
    carried eigenvector rows ``v`` (in-spin row 0, out-spin row 1)."""
    phr = jnp.zeros_like(t)
    phi = jnp.zeros_like(t)
    for k in range(n):
        w = v[0 * n + k, :] * v[1 * n + k, :]
        ang = a[k * n + k, :] * t
        phr = phr + w * jnp.cos(ang)
        phi = phi - w * jnp.sin(ang)
    return phr, phi


def make_sym_amp_kernel(n: int, in_spin: int, out_spin: int,
                        sweeps: int, tile: int = DEFAULT_TILE,
                        interpret: bool = False):
    """REAL symmetric variant: amp = kernel(a, t): a (n*n, B), t (1, B)
    -> (2, B) transfer amplitude (phr, phi).

    ~1/3 the arithmetic of the Hermitian kernel; this is the RL
    environment's per-step physics (training noise is real,
    RLreinforce...:122-133) fused into ONE kernel launch — the rollout
    scan otherwise pays ~10^2 tiny-fusion launches per step.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    eps = 1e-7

    def kernel(a_in, t_in, amp_out, a, v):
        a[:, :] = a_in[:, :]
        b = t_in.shape[-1]
        rows = jax.lax.broadcasted_iota(jnp.int32, (2 * n, b), 0)
        sel = (rows == (0 * n + in_spin)) | (rows == (1 * n + out_spin))
        v[:, :] = jnp.where(sel, 1.0, 0.0).astype(a_in.dtype)
        sym_sweeps_on_scratch(n, sweeps, a, v, eps)
        phr, phi = transfer_amp_from_scratch(n, a, v, t_in[0, :])
        amp_out[0, :] = phr
        amp_out[1, :] = phi

    nn = n * n

    @jax.jit
    def run(a, t):
        b = a.shape[-1]
        grid = (b // tile,)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((nn, tile), lambda i: (0, i)),
                pl.BlockSpec((1, tile), lambda i: (0, i)),
            ],
            out_specs=pl.BlockSpec((2, tile), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((2, b), a.dtype),
            scratch_shapes=[
                pltpu.VMEM((nn, tile), a.dtype),
                pltpu.VMEM((2 * n, tile), a.dtype),
            ],
            interpret=interpret,
        )(a, t.reshape(1, b))

    return run


def make_sym_grad_kernel(n: int, in_spin: int, out_spin: int,
                         sweeps: int, tile: int = DEFAULT_TILE,
                         interpret: bool = False):
    """REAL symmetric exact-gradient kernel: (a (n*n, B), t (1, B)) ->
    (err (1, B), grad (n+1, B)).

    One kernel launch computes, for every lane: the full-V Jacobi
    eigendecomposition, the transfer infidelity, and the Daleckii-Krein
    gradient w.r.t. the n diagonal biases and the readout time — the
    optimizer zoo's entire objective+gradient evaluation fused into a
    single launch.  Same formulation as
    realform.infidelity_and_gradient_sym_lanes (parity pinned in
    tests/test_pallas.py via interpret mode).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    eps = 1e-7

    def kernel(a_in, t_in, err_out, grad_out, a, v):
        a[:, :] = a_in[:, :]
        b = t_in.shape[-1]
        rows = jax.lax.broadcasted_iota(jnp.int32, (n * n, b), 0)
        # identity: V[r, k] lives at sublane r*n+k
        sel = (rows % (n + 1)) == 0
        v[:, :] = jnp.where(sel, 1.0, 0.0).astype(a_in.dtype)

        # same rotation math as sym_sweeps_on_scratch (v carries ALL n
        # eigenvector rows here); round-robin stages by default
        sym_sweeps_on_scratch(n, sweeps, a, v, eps)

        t = t_in[0, :]
        lam = [a[k * n + k, :] for k in range(n)]
        fr = [jnp.cos(lam[k] * t) for k in range(n)]
        fi = [-jnp.sin(lam[k] * t) for k in range(n)]
        v_out = [v[out_spin * n + k, :] for k in range(n)]
        v_in = [v[in_spin * n + k, :] for k in range(n)]
        w = [v_out[k] * v_in[k] for k in range(n)]

        phr = w[0] * fr[0]
        phi = w[0] * fi[0]
        for k in range(1, n):
            phr = phr + w[k] * fr[k]
            phi = phi + w[k] * fi[k]
        err_out[0, :] = 1.0 - (phr * phr + phi * phi)

        # Daleckii-Krein gamma entries on the fly, via the
        # cancellation-free sinc identity (realform._gamma_parts):
        # accurate at every eigenvalue gap incl. exact degeneracies
        def gamma(j, k):
            x = 0.5 * (lam[j] - lam[k]) * t
            small = jnp.abs(x) < 1e-3
            xs = jnp.where(small, 1.0, x)
            s = jnp.where(small, 1.0 - x * x * (1.0 / 6.0),
                          jnp.sin(xs) / xs)
            ang = 0.5 * (lam[j] + lam[k]) * t
            return (-t * s * jnp.sin(ang), -t * s * jnp.cos(ang))

        g_cache = [[gamma(j, k) for k in range(n)] for j in range(n)]

        for l in range(n):
            vl = [v[l * n + k, :] for k in range(n)]
            dphr = None
            dphi = None
            for j in range(n):
                a_lj = v_out[j] * vl[j]
                sr = None
                si = None
                for k in range(n):
                    b_lk = vl[k] * v_in[k]
                    gr_jk, gi_jk = g_cache[j][k]
                    tr = gr_jk * b_lk
                    ti = gi_jk * b_lk
                    sr = tr if sr is None else sr + tr
                    si = ti if si is None else si + ti
                dphr = a_lj * sr if dphr is None else dphr + a_lj * sr
                dphi = a_lj * si if dphi is None else dphi + a_lj * si
            grad_out[l, :] = -2.0 * (dphr * phr + dphi * phi)

        hur = lam[0] * w[0] * fr[0]
        hui = lam[0] * w[0] * fi[0]
        for k in range(1, n):
            hur = hur + lam[k] * w[k] * fr[k]
            hui = hui + lam[k] * w[k] * fi[k]
        grad_out[n, :] = -2.0 * (hui * phr - hur * phi)

    nn = n * n

    @jax.jit
    def run(a, t):
        b = a.shape[-1]
        grid = (b // tile,)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((nn, tile), lambda i: (0, i)),
                pl.BlockSpec((1, tile), lambda i: (0, i)),
            ],
            out_specs=[
                pl.BlockSpec((1, tile), lambda i: (0, i)),
                pl.BlockSpec((n + 1, tile), lambda i: (0, i)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((1, b), a.dtype),
                jax.ShapeDtypeStruct((n + 1, b), a.dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((nn, tile), a.dtype),
                pltpu.VMEM((nn, tile), a.dtype),
            ],
            interpret=interpret,
        )(a, t.reshape(1, b))

    return run


from functools import lru_cache

from code_robchar_tpu.ops.realform import _sweeps_for

_kernel_cache = lru_cache(maxsize=64)(make_fidelity_kernel)
_sym_kernel_cache = lru_cache(maxsize=64)(make_sym_amp_kernel)
_sym_grad_cache = lru_cache(maxsize=64)(make_sym_grad_kernel)


def infidelity_and_gradient_sym_pallas(h0, xs, in_spin: int, out_spin: int,
                                       sweeps: int | None = None,
                                       tile: int | None = None,
                                       interpret: bool = False):
    """Batched exact (infidelity, gradient): h0 (n, n), xs (B, n+1) ->
    (err (B,), grad (B, n+1)) via the fused Pallas kernel.  With
    tile=None the batch is tiled (and edge-padded when needed) by
    pick_tile; an explicit ``tile`` must divide B."""
    n = h0.shape[-1]
    b = xs.shape[0]
    if tile is None:
        tile, bp = pick_tile(b)
        if bp != b:
            xs = jnp.concatenate(
                [xs, jnp.broadcast_to(xs[-1:], (bp - b, xs.shape[1]))])
    bp = xs.shape[0]
    dt = h0.dtype
    a = jnp.broadcast_to(h0[:, :, None], (n, n, bp)).astype(dt)
    for i in range(n):
        a = a.at[i, i].add(xs[:, i].astype(dt))
    t = jnp.abs(xs[:, n]).astype(dt)
    if sweeps is None:
        sweeps = _sweeps_for(dt, n)
    run = _sym_grad_cache(n, in_spin, out_spin, sweeps, tile, interpret)
    err, grad = run(a.reshape(n * n, bp), t)
    return err[0, :b], grad.T[:b]


def transfer_amp_sym_pallas(a: jnp.ndarray, t: jnp.ndarray, in_spin: int,
                            out_spin: int, sweeps: int | None = None,
                            tile: int | None = None,
                            interpret: bool = False):
    """Lanes-layout REAL-symmetric transfer amplitude via the Pallas
    kernel: a (n, n, B), t (B,) -> (phr, phi) each (B,).  With tile=None
    the batch is tiled (and edge-padded when needed) by pick_tile; an
    explicit ``tile`` must divide B."""
    n = a.shape[0]
    b = a.shape[-1]
    if tile is None:
        tile, bp = pick_tile(b)
        if bp != b:
            a = jnp.concatenate(
                [a, jnp.broadcast_to(a[..., -1:], (n, n, bp - b))], axis=-1)
            t = jnp.concatenate([t, jnp.broadcast_to(t[-1:], (bp - b,))])
    if sweeps is None:
        sweeps = _sweeps_for(a.dtype, n)
    run = _sym_kernel_cache(n, in_spin, out_spin, sweeps, tile, interpret)
    amp = run(a.reshape(n * n, a.shape[-1]), t)
    return amp[0, :b], amp[1, :b]


def fidelity_sym_pallas(a: jnp.ndarray, t: jnp.ndarray, in_spin: int,
                        out_spin: int, sweeps: int | None = None,
                        tile: int | None = None,
                        interpret: bool = False) -> jnp.ndarray:
    phr, phi = transfer_amp_sym_pallas(a, t, in_spin, out_spin, sweeps,
                                       tile, interpret)
    return phr * phr + phi * phi


def fidelity_herm_pallas(ar: jnp.ndarray, ai: jnp.ndarray, t: jnp.ndarray,
                         in_spin: int, out_spin: int,
                         sweeps: int | None = None,
                         tile: int | None = None,
                         interpret: bool = False) -> jnp.ndarray:
    """Lanes-layout fidelity via the Pallas kernel.

    ar/ai: (n, n, B) split Hamiltonians, t: (B,).  With tile=None the
    batch is tiled (and edge-padded when needed) by pick_tile; an
    explicit ``tile`` must divide B.
    """
    n = ar.shape[0]
    b = ar.shape[-1]
    if tile is None:
        tile, bp = pick_tile(b)
        if bp != b:
            pad = (n, n, bp - b)
            ar = jnp.concatenate(
                [ar, jnp.broadcast_to(ar[..., -1:], pad)], axis=-1)
            ai = jnp.concatenate(
                [ai, jnp.broadcast_to(ai[..., -1:], pad)], axis=-1)
            t = jnp.concatenate([t, jnp.broadcast_to(t[-1:], (bp - b,))])
    if sweeps is None:
        sweeps = _sweeps_for(ar.dtype, n)
    run = _kernel_cache(n, in_spin, out_spin, sweeps, tile, interpret)
    bp = ar.shape[-1]
    fid = run(ar.reshape(n * n, bp), ai.reshape(n * n, bp), t)
    return fid.reshape(bp)[:b]
