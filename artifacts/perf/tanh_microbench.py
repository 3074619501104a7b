"""Marginal cost of tanh inside a Pallas TPU kernel (fetch-barrier K-sweep).

Settles the pallas_critic.py "further gains need a cheaper tanh"
hypothesis.  Method: a fori_loop of K applications of the op inside one
Pallas kernel; the (K=8192 - K=1024) slope isolates the per-op marginal
cost from launch/stream overhead.  Timing is fetch-to-fetch
(``float(r[0,0])``) because on the axon relay ``block_until_ready`` is
not a barrier (see bench.py).

Measured 2026-08-19, one v5e chip, (512,128) f32, ps/elem/iter marginal:

    x*1.0001        1.18
    jnp.tanh        0.85   <- mul-parity: a hardware-level approximation
    rational tanh   9.58   <- Eigen-style P13/Q6: ~8x SLOWER than jnp.tanh

Conclusion: there is no cheaper tanh on this VPU; the fused critic
kernel stands at its measured roof.  (The rational form IS ~100x more
accurate vs f64 — 3.8e-7 vs 4.4e-5 max abs err — so it would only ever
be an accuracy lever, never a speed one.)
"""
import time, threading, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
SHAPE = (512, 128)
tiny = jax.jit(lambda a: a @ a)(jnp.ones((8, 8)))
hs = threading.Thread(target=lambda: np.asarray(tiny)); hs.start()
def make_kernel(op, K):
    def kernel(x_ref, o_ref):
        def body(i, acc):
            return op(acc) * 0.999
        o_ref[...] = jax.lax.fori_loop(0, K, body, x_ref[...])
    return pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32))
hs.join()
def bench(name, op):
    x = jax.random.normal(jax.random.key(0), SHAPE, jnp.float32)
    ts = {}
    for K in (1024, 8192):
        f = jax.jit(make_kernel(op, K))
        float(f(x)[0, 0])
        reps = 10
        best = 1e9
        for trial in range(2):
            t0 = time.perf_counter()
            for _ in range(reps):
                r = f(x)
            float(r[0, 0])
            best = min(best, (time.perf_counter() - t0) / reps)
        ts[K] = best
    marg = (ts[8192] - ts[1024]) / (8192 - 1024)
    ps = marg / (SHAPE[0] * SHAPE[1]) * 1e12
    print(f"{name:>14}: {ts[1024]*1e6:8.0f} us @1K {ts[8192]*1e6:8.0f} us @8K  marginal {ps:.2f} ps/elem/iter", flush=True)
    return marg
m = bench("x*1.0001", lambda x: x * 1.0001)
t = bench("jnp.tanh", jnp.tanh)
def rational_tanh(x):
    x = jnp.clip(x, -7.99881172180175781, 7.99881172180175781)
    x2 = x * x
    a = x2 * -2.76076847742355e-16 + 2.00018790482477e-13
    a = x2 * a + -8.60467152213735e-11
    a = x2 * a + 5.12229709037114e-08
    a = x2 * a + 1.48572235717979e-05
    a = x2 * a + 6.37261928875436e-04
    a = x2 * a + 4.89352455891786e-03
    p = x * a
    b = x2 * 1.19825839466702e-06 + 1.18534705686654e-04
    b = x2 * b + 2.26843463243900e-03
    q = x2 * b + 4.89352518554385e-03
    return p / q
r = bench("rational_tanh", rational_tanh)
print(f"in mul units: tanh={t/m:.1f} rational={r/m:.1f}  speedup={t/r:.2f}x", flush=True)
