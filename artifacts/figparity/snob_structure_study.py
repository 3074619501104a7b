"""SNOB surrogate structure study (rounds 2-3): brackets the shipped
SNOBFIT behaviour between structural alternatives.  Results in
SNOBPARITY.md.  Usage: python artifacts/figparity/snob_structure_study.py
N OUT SIGMA VARIANT  (VARIANT in {A, B, B2, C, D<alpha>[i<n_inf>],
E[<q>]}).

Variants:
  A = current 30x10 chained trust-radius (via snob.py)
  B = 2x150 SNOBFIT-call structure (150 space-fill, then 1 model + k_loc
      local + rest space-fill), min-over-history reported
  C = pure best-of-300 random (lower bound)
  D = SNOBFIT-mechanistic rounds (nn-distance-scaled local steps)
  E = round-3, VERDICT #2: SNOBFIT's own box-fit mechanism — local
      linear fits over the ACCUMULATED history's nearest neighbours,
      minimized over each point's neighbour-scaled BOX (a linear fit
      minimized over a box lands on a box CORNER — SNOBFIT's class-1/2/3
      candidates are fit minimizers within branch cells, not
      gradient-normalized steps), plus volume-seeking class-4 points at
      the largest empty regions (farthest-point sampling of the history)
      and class-5 uniform fill.  E12 uses q=12 ~ SQSnobFit's n+6
      request size.
"""
import sys, os, json, time
sys.path.insert(0, os.getcwd())
import numpy as np, jax, jax.numpy as jnp
import scipy.stats
from code_robchar_tpu.models import objectives
from code_robchar_tpu.models.base import ControlOptimizer
from code_robchar_tpu.models.snob import SNOB

n, out, sigma = int(sys.argv[1]), int(sys.argv[2]), float(sys.argv[3])
variant = sys.argv[4]
K = 3334          # restarts at the 1e6-fcall budget (300 each)
TOP = 1000

snob = SNOB(n, 0, out, testing=True, fid_threshold=2.0, repeats=K,
            noise=sigma, ham_noisy=True, run_until_told_to_stop=True,
            run_until_completion_its=10**12, landscape_exploration=True,
            save_topc=TOP)
spec = snob.spec()
infid_b = objectives.make_infidelity_batch(spec)
lower, upper = snob._lower, snob._upper
span = upper - lower
d = n + 1

x0s = jnp.asarray(snob.init_points(K), jnp.float32)
key = jax.random.key(7)

def variant_B(x0s, key, k_loc=5, q=150):
    k = x0s.shape[0]
    key, k1, k2, k3, k4 = jax.random.split(key, 5)
    # round 1: x0 + (q-1) space-fill
    r1 = lower + span * jax.random.uniform(k1, (k, q - 1, d), jnp.float32)
    r1 = jnp.concatenate([x0s[:, None, :], r1], axis=1)
    f1, c1 = infid_b(r1.reshape(k * q, d), k2)
    f1 = f1.reshape(k, q)
    # round 2: local refinement around the best few + space-fill rest
    order = jnp.argsort(f1, axis=1)
    top = jnp.take_along_axis(r1, order[:, :k_loc, None], axis=1)  # (k,k_loc,d)
    ftop = jnp.take_along_axis(f1, order[:, :k_loc], axis=1)
    best = top[:, 0]
    # local scale: distance from best to its nearest other evaluated point
    d2 = jnp.sum((r1 - best[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(d2 < 1e-12, jnp.inf, d2)
    near = jnp.sqrt(jnp.min(d2, axis=1))                   # (k,)
    # model point: linear fit on the k_loc best scattered points
    dx = top - best[:, None, :]
    df = ftop - ftop[:, :1]
    ata = jnp.einsum("kqa,kqb->kab", dx, dx) + 1e-9 * jnp.eye(d)[None]
    atb = jnp.einsum("kqa,kq->ka", dx, df)
    g = jnp.linalg.solve(ata, atb[..., None])[..., 0]
    gn = jnp.linalg.norm(g, axis=-1, keepdims=True) + 1e-12
    model_pt = best - near[:, None] * g / gn
    # class-2/3: one jitter around each of the top k_loc, scale ~ near
    jit = top + near[:, None, None] * jax.random.normal(
        k3, (k, k_loc, d), jnp.float32)
    n_exp = q - 1 - k_loc
    exp = lower + span * jax.random.uniform(k4, (k, n_exp, d), jnp.float32)
    r2 = jnp.clip(jnp.concatenate(
        [model_pt[:, None, :], jit, exp], axis=1), lower, upper)
    key, k5 = jax.random.split(key)
    f2, _ = infid_b(r2.reshape(k * q, d), k5)
    f2 = f2.reshape(k, q)
    allf = jnp.concatenate([f1, f2], axis=1)
    allx = jnp.concatenate([r1, r2], axis=1)
    i = jnp.argmin(allf, axis=1)
    return (jnp.take_along_axis(allx, i[:, None, None], axis=1)[:, 0],
            1.0 - jnp.take_along_axis(allf, i[:, None], axis=1)[:, 0])

def variant_C(x0s, key, q=300):
    k = x0s.shape[0]
    key, k1, k2 = jax.random.split(key, 3)
    r = lower + span * jax.random.uniform(k1, (k, q - 1, d), jnp.float32)
    r = jnp.concatenate([x0s[:, None, :], r], axis=1)
    f, _ = infid_b(r.reshape(k * q, d), k2)
    f = f.reshape(k, q)
    i = jnp.argmin(f, axis=1)
    return (jnp.take_along_axis(r, i[:, None, None], axis=1)[:, 0],
            1.0 - jnp.take_along_axis(f, i[:, None], axis=1)[:, 0])


# ---- variant D: SNOBFIT-mechanistic rounds -----------------------------
# 30 rounds x 10 candidates: 1 model point from the best (linear fit on
# its d+2 nearest neighbors, step = alpha * nn-distance of the best),
# 2 local jitters around the 2nd/3rd-best distinct history points
# (scale = alpha * their nn-distance), 7 uniform.  NO trust-radius state:
# step scales decay naturally as sampling densifies (box-size analogue).

def variant_D(x0s, key, alpha=1.0, q=10, budget=300, n_inf=3):
    k = x0s.shape[0]
    rounds = (budget - 1) // q
    hx = jnp.zeros((k, budget, d), jnp.float32)
    hf = jnp.full((k, budget), jnp.inf, jnp.float32)
    key, k0 = jax.random.split(key)
    f0, _ = infid_b(x0s, k0)
    hx = hx.at[:, 0].set(x0s)
    hf = hf.at[:, 0].set(f0)

    def nn_dist(hx, hf, cnt, pt):
        d2 = jnp.sum((hx - pt[:, None, :]) ** 2, axis=-1)
        mask = (jnp.arange(hf.shape[1])[None, :] < cnt) & (d2 > 1e-14)
        d2 = jnp.where(mask, d2, jnp.inf)
        cap = jnp.linalg.norm(span)            # box diagonal
        return jnp.minimum(jnp.sqrt(jnp.min(d2, axis=1)), cap)

    def round_body(r, carry):
        hx, hf, key = carry
        cnt = 1 + r * q
        key, kg, ku, kc = jax.random.split(key, 4)
        order = jnp.argsort(hf, axis=1)
        b1 = jnp.take_along_axis(hx, order[:, 0:1, None], axis=1)[:, 0]
        b2 = jnp.take_along_axis(hx, order[:, 1:2, None], axis=1)[:, 0]
        b3 = jnp.take_along_axis(hx, order[:, 2:3, None], axis=1)[:, 0]
        f1v = jnp.take_along_axis(hf, order[:, 0:1], axis=1)[:, 0]

        # linear fit on the d+2 nearest neighbors of the best
        d2b = jnp.sum((hx - b1[:, None, :]) ** 2, axis=-1)
        maskb = (jnp.arange(budget)[None, :] < cnt) & (d2b > 1e-14)
        d2b = jnp.where(maskb, d2b, jnp.inf)
        nbr = jnp.argsort(d2b, axis=1)[:, :d + 2]
        nx = jnp.take_along_axis(hx, nbr[:, :, None], axis=1)
        nf = jnp.take_along_axis(hf, nbr, axis=1)
        w = jnp.isfinite(nf).astype(jnp.float32)
        nf = jnp.where(jnp.isfinite(nf), nf, f1v[:, None])
        dx = (nx - b1[:, None, :]) * w[:, :, None]
        df = (nf - f1v[:, None]) * w
        ata = jnp.einsum("kqa,kqb->kab", dx, dx) + 1e-9 * jnp.eye(d)[None]
        atb = jnp.einsum("kqa,kq->ka", dx, df)
        g = jnp.linalg.solve(ata, atb[..., None])[..., 0]
        gn = jnp.linalg.norm(g, axis=-1, keepdims=True) + 1e-12

        s1 = nn_dist(hx, hf, cnt, b1)
        s2 = nn_dist(hx, hf, cnt, b2)
        s3 = nn_dist(hx, hf, cnt, b3)
        model_pt = b1 - (alpha * s1)[:, None] * g / gn
        eps = jax.random.normal(kg, (k, 2, d), jnp.float32)
        jit = jnp.stack([b2, b3], axis=1) + \
            (alpha * jnp.stack([s2, s3], axis=1))[:, :, None] * eps
        jit = jit[:, :n_inf - 1]
        exp = lower + span * jax.random.uniform(
            ku, (k, q - 1 - jit.shape[1], d), jnp.float32)
        cands = jnp.clip(jnp.concatenate(
            [model_pt[:, None, :], jit, exp], axis=1), lower, upper)
        fs, _ = infid_b(cands.reshape(k * q, d), kc)
        fs = fs.reshape(k, q)
        hx = jax.lax.dynamic_update_slice(hx, cands, (0, cnt, 0))
        hf = jax.lax.dynamic_update_slice(hf, fs, (0, cnt))
        return hx, hf, key

    hx, hf, _ = jax.lax.fori_loop(0, rounds, round_body, (hx, hf, key))
    i = jnp.argmin(hf, axis=1)
    return (jnp.take_along_axis(hx, i[:, None, None], axis=1)[:, 0],
            1.0 - jnp.take_along_axis(hf, i[:, None], axis=1)[:, 0])

# ---- variant E: box-fit rounds (VERDICT r3 #2) -------------------------
# SNOBFIT's actual candidate geometry: class-1/2/3 points are LOCAL FIT
# MINIMIZERS WITHIN BRANCH CELLS.  A linear fit minimized over a box
# lands on a box corner: cand = x_i - w_i * sign(g_i), where w_i is the
# per-coordinate half-width of point i's cell (estimated here as the
# coordinate-wise spread of its d+2 nearest history neighbours — the
# branch-cell analogue).  Class-4 exploration goes to the largest empty
# region (farthest-point sampling against the history); class-5 is
# uniform fill.  No trust-radius state, no gradient normalisation.

def variant_E(x0s, key, q=10, budget=300, n_loc=3, n_far=2):
    k = x0s.shape[0]
    rounds = (budget - 1) // q
    hx = jnp.zeros((k, budget, d), jnp.float32)
    hf = jnp.full((k, budget), jnp.inf, jnp.float32)
    key, k0 = jax.random.split(key)
    f0, _ = infid_b(x0s, k0)
    hx = hx.at[:, 0].set(x0s)
    hf = hf.at[:, 0].set(f0)

    def corner_cand(hx, hf, cnt, idx):
        """Box-corner candidate for history point #idx (per restart)."""
        xi = jnp.take_along_axis(hx, idx[:, None, None], axis=1)[:, 0]
        fi = jnp.take_along_axis(hf, idx[:, None], axis=1)[:, 0]
        d2 = jnp.sum((hx - xi[:, None, :]) ** 2, axis=-1)
        mask = (jnp.arange(budget)[None, :] < cnt) & (d2 > 1e-14)
        d2 = jnp.where(mask, d2, jnp.inf)
        nbr = jnp.argsort(d2, axis=1)[:, :d + 2]
        nx = jnp.take_along_axis(hx, nbr[:, :, None], axis=1)
        nf = jnp.take_along_axis(hf, nbr, axis=1)
        w = jnp.isfinite(nf).astype(jnp.float32)
        nf = jnp.where(jnp.isfinite(nf), nf, fi[:, None])
        dx = (nx - xi[:, None, :]) * w[:, :, None]
        df = (nf - fi[:, None]) * w
        ata = jnp.einsum("kqa,kqb->kab", dx, dx) + 1e-9 * jnp.eye(d)[None]
        atb = jnp.einsum("kqa,kq->ka", dx, df)
        g = jnp.linalg.solve(ata, atb[..., None])[..., 0]
        # cell half-width per coordinate: spread of the neighbours, with
        # a tiny floor so degenerate clusters still move
        halfw = jnp.maximum(jnp.max(jnp.abs(dx), axis=1),
                            1e-3 * span[None, :])
        sg = jnp.where(g > 0, 1.0, jnp.where(g < 0, -1.0, 0.0))
        return xi - halfw * sg

    def round_body(r, carry):
        hx, hf, key = carry
        cnt = 1 + r * q
        key, ku, kf_, kc = jax.random.split(key, 4)
        order = jnp.argsort(hf, axis=1)
        # class-1/2/3: box corners of the n_loc best history points
        locs = []
        for j in range(n_loc):
            locs.append(corner_cand(hx, hf, cnt, order[:, j]))
        loc = jnp.stack(locs, axis=1)                       # (k, n_loc, d)
        # class-4: farthest-point candidates — of 16 uniform probes, the
        # n_far with the largest distance to the evaluated history
        probes = lower + span * jax.random.uniform(kf_, (k, 16, d),
                                                   jnp.float32)
        d2p = jnp.sum((probes[:, :, None, :] - hx[:, None, :, :]) ** 2,
                      axis=-1)                              # (k, 16, B)
        live = (jnp.arange(budget)[None, None, :] < cnt)
        d2p = jnp.where(live, d2p, jnp.inf)
        mind = jnp.min(d2p, axis=2)                         # (k, 16)
        fari = jnp.argsort(-mind, axis=1)[:, :n_far]
        far = jnp.take_along_axis(probes, fari[:, :, None], axis=1)
        # class-5: uniform fill
        exp = lower + span * jax.random.uniform(
            ku, (k, q - n_loc - n_far, d), jnp.float32)
        cands = jnp.clip(jnp.concatenate([loc, far, exp], axis=1),
                         lower, upper)
        fs, _ = infid_b(cands.reshape(k * q, d), kc)
        fs = fs.reshape(k, q)
        hx = jax.lax.dynamic_update_slice(hx, cands, (0, cnt, 0))
        hf = jax.lax.dynamic_update_slice(hf, fs, (0, cnt))
        return hx, hf, key

    hx, hf, _ = jax.lax.fori_loop(0, rounds, round_body, (hx, hf, key))
    i = jnp.argmin(hf, axis=1)
    return (jnp.take_along_axis(hx, i[:, None, None], axis=1)[:, 0],
            1.0 - jnp.take_along_axis(hf, i[:, None], axis=1)[:, 0])


# ---- variant F: QUADRATIC box fit (VERDICT r3 #2, refinement of E) ----
# SNOBFIT's local model is a safeguarded quadratic, not linear: fit
# f(y) ~ f_i + g.dy + c*||dy||^2 to the d+2 nearest history neighbours
# and place the candidate at the fit minimizer CLIPPED TO THE CELL:
# convex fits step -g/(2c) (interior exploitation), flat/concave fits
# fall back to the cell corner (exploration) — the interpolation between
# variant E (pure corners, weaker than shipped) and variant D (gradient
# steps, stronger than shipped).

def variant_F(x0s, key, q=10, budget=300, n_loc=3, n_far=2, cmin=1e-6):
    k = x0s.shape[0]
    rounds = (budget - 1) // q
    hx = jnp.zeros((k, budget, d), jnp.float32)
    hf = jnp.full((k, budget), jnp.inf, jnp.float32)
    key, k0 = jax.random.split(key)
    f0, _ = infid_b(x0s, k0)
    hx = hx.at[:, 0].set(x0s)
    hf = hf.at[:, 0].set(f0)

    def quad_cand(hx, hf, cnt, idx):
        xi = jnp.take_along_axis(hx, idx[:, None, None], axis=1)[:, 0]
        fi = jnp.take_along_axis(hf, idx[:, None], axis=1)[:, 0]
        d2 = jnp.sum((hx - xi[:, None, :]) ** 2, axis=-1)
        mask = (jnp.arange(budget)[None, :] < cnt) & (d2 > 1e-14)
        d2 = jnp.where(mask, d2, jnp.inf)
        nbr = jnp.argsort(d2, axis=1)[:, :d + 3]
        nx = jnp.take_along_axis(hx, nbr[:, :, None], axis=1)
        nf = jnp.take_along_axis(hf, nbr, axis=1)
        w = jnp.isfinite(nf).astype(jnp.float32)
        nf = jnp.where(jnp.isfinite(nf), nf, fi[:, None])
        dx = (nx - xi[:, None, :]) * w[:, :, None]
        df = (nf - fi[:, None]) * w
        r2 = jnp.sum(dx * dx, axis=-1, keepdims=True)      # (k, m, 1)
        feat = jnp.concatenate([dx, r2], axis=-1)          # (k, m, d+1)
        ata = jnp.einsum("kqa,kqb->kab", feat, feat) + \
            1e-9 * jnp.eye(d + 1)[None]
        atb = jnp.einsum("kqa,kq->ka", feat, df)
        sol = jnp.linalg.solve(ata, atb[..., None])[..., 0]
        g, c = sol[:, :d], sol[:, d]
        halfw = jnp.maximum(jnp.max(jnp.abs(dx), axis=1),
                            1e-3 * span[None, :])
        sg = jnp.where(g > 0, 1.0, jnp.where(g < 0, -1.0, 0.0))
        corner = -halfw * sg
        interior = -g / (2.0 * jnp.maximum(c, cmin)[:, None])
        step = jnp.where((c > cmin)[:, None], interior, corner)
        step = jnp.clip(step, -halfw, halfw)
        return xi + step

    def round_body(r, carry):
        hx, hf, key = carry
        cnt = 1 + r * q
        key, ku, kf_, kc = jax.random.split(key, 4)
        order = jnp.argsort(hf, axis=1)
        loc = jnp.stack([quad_cand(hx, hf, cnt, order[:, j])
                         for j in range(n_loc)], axis=1)
        probes = lower + span * jax.random.uniform(kf_, (k, 16, d),
                                                   jnp.float32)
        d2p = jnp.sum((probes[:, :, None, :] - hx[:, None, :, :]) ** 2,
                      axis=-1)
        live = (jnp.arange(budget)[None, None, :] < cnt)
        d2p = jnp.where(live, d2p, jnp.inf)
        mind = jnp.min(d2p, axis=2)
        fari = jnp.argsort(-mind, axis=1)[:, :n_far]
        far = jnp.take_along_axis(probes, fari[:, :, None], axis=1)
        exp = lower + span * jax.random.uniform(
            ku, (k, q - n_loc - n_far, d), jnp.float32)
        cands = jnp.clip(jnp.concatenate([loc, far, exp], axis=1),
                         lower, upper)
        fs, _ = infid_b(cands.reshape(k * q, d), kc)
        fs = fs.reshape(k, q)
        hx = jax.lax.dynamic_update_slice(hx, cands, (0, cnt, 0))
        hf = jax.lax.dynamic_update_slice(hf, fs, (0, cnt))
        return hx, hf, key

    hx, hf, _ = jax.lax.fori_loop(0, rounds, round_body, (hx, hf, key))
    i = jnp.argmin(hf, axis=1)
    return (jnp.take_along_axis(hx, i[:, None, None], axis=1)[:, 0],
            1.0 - jnp.take_along_axis(hf, i[:, None], axis=1)[:, 0])


t0 = time.time()
if variant == "A":
    keys = jax.random.split(key, K)
    res = snob._run_batch(x0s, keys)
    xs, fids = np.asarray(res.x), np.asarray(res.fid)
elif variant == "B":
    fn = jax.jit(variant_B)
    xs, fids = fn(x0s, key); xs, fids = np.asarray(xs), np.asarray(fids)
elif variant == "B2":
    fn = jax.jit(lambda x, k: variant_B(x, k, k_loc=20))
    xs, fids = fn(x0s, key); xs, fids = np.asarray(xs), np.asarray(fids)
elif variant == "C":
    fn = jax.jit(variant_C)
    xs, fids = fn(x0s, key); xs, fids = np.asarray(xs), np.asarray(fids)
elif variant.startswith("E"):
    q = int(variant[1:]) if len(variant) > 1 else 10
    fn = jax.jit(lambda x, k: variant_E(x, k, q=q))
    xs, fids = fn(x0s, key); xs, fids = np.asarray(xs), np.asarray(fids)
elif variant.startswith("F"):
    q = int(variant[1:]) if len(variant) > 1 else 10
    fn = jax.jit(lambda x, k: variant_F(x, k, q=q))
    xs, fids = fn(x0s, key); xs, fids = np.asarray(xs), np.asarray(fids)
else:
    # "D<alpha>i<n_inf>", e.g. D1.0i2
    rest = variant[1:]
    if "i" in rest:
        a_s, i_s = rest.split("i"); alpha, n_inf = float(a_s or 1.0), int(i_s)
    else:
        alpha, n_inf = float(rest or 1.0), 3
    fn = jax.jit(lambda x, k: variant_D(x, k, alpha=alpha, n_inf=n_inf))
    xs, fids = fn(x0s, key); xs, fids = np.asarray(xs), np.asarray(fids)
order = np.argsort(-fids)[:TOP]
top_x = xs[order]
print(f"[{variant}] collected in {time.time()-t0:.0f}s")

sys.path.insert(0, os.path.join(os.getcwd(), "artifacts", "figparity"))
from snob_calibrate import rims_of
base = "/root/reference/experiments/pipeline_nmplus2/"
le_path = base + f"ppo_spin_{n}_0-{out}_c_1000.le"
if os.path.exists(le_path):
    shipped = np.asarray(json.load(open(le_path))
                         ["snob"][str(sigma)]["controller"])
    r_ours = rims_of(top_x, n, out, sigma, jax.random.key(0))
    r_ship = rims_of(shipped, n, out, sigma, jax.random.key(0))
    mode = "le+mc100"
else:
    # N=7 transitions ship no .le — but the .mcm metric tensors carry the
    # per-controller RIM rows of the reference's own snob set (br_1).
    # Compare B=1 RIM distributions: shipped row at sigma_sim == sigma
    # vs a fresh B=1 characterisation of our collected set.
    nl = ("[0.   0.01 0.02 0.03 0.04 0.05 0.06 0.07 0.08 0.09 0.1 ]")
    mcm = json.load(open(
        base + f"ppo_spin_{n}_0-{out}_c_1000.le_tn{sigma}_br_1_nlvl"
        + nl + ".mcm"))
    row = int(round(sigma / 0.01))
    r_ship = np.asarray(mcm["snob"][r"$W(.,\delta(x-1))$"])[row]
    r_ours = rims_of(top_x, n, out, sigma, jax.random.key(0), bootreps=1)
    mode = "mcm+mc1"
stat, p = scipy.stats.ks_2samp(r_ours, r_ship)
print(json.dumps({"variant": variant, "transition": f"N={n} 0->{out}",
                  "mode": mode,
                  "ours_median": round(float(np.median(r_ours)), 4),
                  "shipped_median": round(float(np.median(r_ship)), 4),
                  "ks": round(float(stat), 4), "p": float(p)}))
