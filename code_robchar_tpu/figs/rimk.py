"""p-RIM theory exploration (exploring_rimk.py, rim_analysis.py).

Not part of the 13-figure paper pipeline (SURVEY.md C23), but part of the
framework's analysis surface: how the p-order RIM relates to distribution
moments and tail shapes, plus Q-vs-RIM rank agreement.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Sequence

import numpy as np
import jax.numpy as jnp

from code_robchar_tpu.mc.datasim import MCDataSim
from code_robchar_tpu.metrics.rim import rim_p
from code_robchar_tpu.metrics.stats import get_ranks, quantile_yield


class ExploringRIMK(MCDataSim):
    """RIM_p vs moments studies over a cached fidelity-distribution tensor
    (exploring_rimk.py:9-238)."""

    def rim_k_tensor(self, algo: str, noise_index: int = 3, topk: int = 10,
                     p: int = 3) -> Dict[str, np.ndarray]:
        """{statistic name: (noise_res, topk)} with RIM_1..RIM_p, var, and
        observed-fidelity top-k filtering (exploring_rimk.py:13-47)."""
        ni = None if algo == "lbfgs" else str(self.noises[noise_index])
        pdf = np.array(self.get_fid_dists(ni, self.noises, algo)[algo])
        mean_fid0 = pdf[0].mean(axis=-1)
        keep = get_ranks(-mean_fid0) <= topk
        pdf = pdf[:, keep]
        out = {}
        for k in range(1, p + 1):
            out[f"RIM_{k}"] = np.asarray(rim_p(jnp.asarray(pdf), k))
        out["var"] = pdf.var(axis=-1)
        out["mean"] = pdf.mean(axis=-1)
        return out

    def q_vs_rim_rank_agreement(self, algo: str, noise_index: int = 3,
                                threshold: float = 0.95):
        """Spearman rank agreement between Q(th) and RIM_1 orderings of the
        controllers at one noise level (exploring_rimk capability)."""
        from scipy.stats import spearmanr
        ni = None if algo == "lbfgs" else str(self.noises[noise_index])
        pdf = np.array(self.get_fid_dists(ni, self.noises, algo)[algo])
        rim = np.asarray(rim_p(jnp.asarray(pdf[noise_index]), 1))
        q = -np.asarray(quantile_yield(jnp.asarray(pdf[noise_index]),
                                       threshold))
        return spearmanr(rim, q).statistic


# -------------------------------------------------------------------------
# synthetic tail studies (rim_analysis.py)
# -------------------------------------------------------------------------

def dom(a: float, b: float = 1.0, points: int = 100) -> np.ndarray:
    return np.linspace(a, b, points)


def right_tail(x: np.ndarray, power: float = 5) -> np.ndarray:
    f = 1.0 / x ** power
    return f / f.sum()


def left_tail(x: np.ndarray, power: float = 5) -> np.ndarray:
    return right_tail(x, power)[::-1]


def uniform(x: np.ndarray) -> np.ndarray:
    return np.full(len(x), 1.0 / len(x))


def gaussian(x: np.ndarray) -> np.ndarray:
    f = np.exp(-0.25 * (x - x.mean()) ** 2)
    return f / f.sum()


def p_order_rim(weights: np.ndarray, support: np.ndarray,
                p: float) -> float:
    """p-RIM of a weighted discrete fidelity distribution:
    (sum w (1-F)^p)^(1/p) (rim_analysis.py capability)."""
    return float(np.power((weights * (1 - support) ** p).sum(), 1.0 / p))


def moments_vs_tails(a: float = 0.001,
                     pdfs: Sequence[Callable] = (right_tail, left_tail,
                                                 gaussian, uniform),
                     fig_path: str | None = None):
    """Moment statistics of shifting-domain tail distributions
    (rim_analysis.py:32-57); returns {pdf name: {stat: curve}}."""
    a_grid = np.linspace(a, 1, 100)
    results = {}
    for pdf in pdfs:
        stats = {k: np.zeros(len(a_grid))
                 for k in ("mean", "std", "mom_2", "mom_3")}
        w = pdf(dom(0.5, 1, 50))
        for i, ai in enumerate(a_grid):
            x = dom(ai, 1, 50)
            mean = (w * x).sum()
            stats["mean"][i] = mean
            stats["std"][i] = np.sqrt((w * (x - mean) ** 2).sum())
            stats["mom_2"][i] = (w * x ** 2).sum()
            stats["mom_3"][i] = (w * x ** 3).sum()
        results[pdf.__name__] = stats

    if fig_path:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(ncols=len(results), figsize=(16, 4))
        for ax, (name, stats) in zip(np.atleast_1d(axes).ravel(),
                                     results.items()):
            for key, curve in stats.items():
                ax.plot(a_grid, curve, label=key)
            ax.set_title(name)
            ax.set_xlabel("a dom left")
        np.atleast_1d(axes).ravel()[0].legend(fontsize=7)
        os.makedirs(os.path.dirname(fig_path) or ".", exist_ok=True)
        fig.savefig(fig_path, bbox_inches="tight")
        plt.close(fig)
    return results


def p_rim_growth_curves(ps: Sequence[float] = (1, 2, 3, 4, 8),
                        tail: Callable = right_tail) -> Dict[float, float]:
    """RIM_p growth with p for a synthetic tail distribution."""
    x = dom(0.2, 1, 200)
    w = tail(x)
    return {p: p_order_rim(w, x, p) for p in ps}
