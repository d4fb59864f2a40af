"""FitzHugh–Nagumo system on t ∈ [0, 30]:

    dy/dt = y − y³/3 − w + I_ext
    dw/dt = (y + α − β·w) / τ          I_ext=0.5, α=0.7, β=0.8, τ=2.5

Reference: fitzhugh_nagumo.py — loss :53-97 (two residual means, one per
component via separate reverse taps, plus IC mean, SUMMED — not mean-of-sum),
sampling = 200-point linspace grid subsampled without replacement :124-131,
ground truth scipy.integrate.odeint :231, defaults 150000 iters / batch 100 /
lr 1e-4 / 50-node grid (the script's argparse default --batch-size is 100,
:204; the local ``batch_size = 256`` at :183 is overwritten — and 256 would
crash multinomial-without-replacement over the 200-point grid anyway),
DGM variant B 1→2 hidden 128 × 4 layers :211-214, IC y(0) = w(0) = 0.

TPU design: ONE forward-mode jvp along t yields d/dt of BOTH components
simultaneously (the reference pays two reverse taps, :74-84).
"""

from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp
# scipy is imported lazily in exact(): ~0.8 s of import time that only the
# FN ground-truth evaluation needs.

from differential_equations_dnn_tpu.equations.base import Problem, TrainDefaults
from differential_equations_dnn_tpu.models import DGM
from differential_equations_dnn_tpu.ops import GridSubsample, time_jacobian


def fzn_rhs(s, _t, i_ext=0.5, alpha=0.7, beta=0.8, tau=2.5):
    """Classical RHS used for the odeint ground truth (fitzhugh_nagumo.py:38-50)."""
    y, w = s
    return np.array([y - y**3 / 3.0 - w + i_ext, (y + alpha - beta * w) / tau])


@dataclass(frozen=True)
class FitzHughNagumo(Problem):
    name: str = "fitzhugh_nagumo"
    i_ext: float = 0.5
    alpha: float = 0.7
    beta: float = 0.8
    tau: float = 2.5
    t_max: float = 30.0
    grid_points: int = 200
    y_ic: float = 0.0
    # Architecture: "dgm" reproduces the reference (DGM variant B 1→2,
    # hidden 128 × 4, fitzhugh_nagumo.py:211-214) but is highly
    # init-sensitive (single-seed MAE anywhere in [0.005, 0.76]; use
    # ensemble=8..16). "fourier_mlp" is the recommended TPU-first choice:
    # a Fourier-feature MLP (σ=0.1) lands at MAE 0.0002-0.0025 on EVERY
    # seed tested (median 0.0009 vs the reference's published 0.0088).
    arch: str = "dgm"
    defaults: TrainDefaults = field(
        default_factory=lambda: TrainDefaults(iterations=150_000, batch_size=100, nodes=50)
    )
    constraint: str = "soft"  # "hard" = s(0) pinned exactly via t*N(t)
    # Causal residual weighting (Wang, Sankaran & Perdikaris 2022,
    # "Respecting causality is all you need"): weight the residual at time
    # t_i by exp(−ε · Σ_{j<i} ℓ_j·Δt) — points are only trained once the
    # solution BEFORE them is already resolved. This removes the DGM
    # arch's multi-stability (a single run used to land anywhere in MAE
    # [0.005, 0.76]; the physics residual converges to ~2e-4 on a wrong
    # branch because nothing orders the fit in time). 0 disables.
    # Collocation in causal mode is STRATIFIED-uniform (t_i ∈ the i-th of
    # B equal slices of [0, t_max]) so the batch is time-sorted by
    # construction and the cumulative sum approximates ∫₀^t ℓ dt.
    causal_eps: float = 5.0

    def default_model(self):
        if self.arch == "fourier_mlp":
            from differential_equations_dnn_tpu.models import MLP

            net = MLP(input_dim=1, output_dim=2, hidden_size=128,
                      num_layers=3, activation="tanh",
                      fourier_features=16, fourier_scale=0.1)
            if self.constraint == "hard":
                from differential_equations_dnn_tpu.models.hard import (
                    HardConstraint,
                    time_ic_ansatz,
                )

                return HardConstraint(net, time_ic_ansatz(self.y_ic, self.t_max))
            return net
        if self.arch != "dgm":
            raise ValueError(f"unknown arch {self.arch!r} (dgm | fourier_mlp)")
        net = DGM(input_dim=1, output_dim=2, hidden_size=128, num_layers=4,
                  activation="tanh", init_scheme="torch")
        if self.constraint == "hard":
            from differential_equations_dnn_tpu.models.hard import (
                HardConstraint,
                time_ic_ansatz,
            )

            return HardConstraint(net, time_ic_ansatz(self.y_ic, self.t_max))
        return net

    @property
    def max_sample_size(self):
        # Subsampling WITHOUT replacement from the fixed training grid
        # (reference fitzhugh_nagumo.py:130-131) caps the batch size.
        return self.grid_points

    def sample(self, key, n):
        if self.causal_eps > 0.0:
            # Stratified-uniform (one draw per equal slice of [0, t_max] —
            # gap-free, unlike the reference's fixed 200-point grid), in
            # SHUFFLED row order: the causal loss is permutation-invariant
            # (comparison-mask cumsum), and the population sweeps mask
            # trials to a row PREFIX — a time-sorted layout would make a
            # masked trial train only on the earliest fraction of the
            # domain.
            import jax

            ku, kp = jax.random.split(key)
            u = jax.random.uniform(ku, (n, 1))
            t = (jnp.arange(n, dtype=u.dtype)[:, None] + u) * (self.t_max / n)
            t = jax.random.permutation(kp, t, axis=0)
            return {"t": t, "t0": jnp.zeros((n, 1))}
        sampler = GridSubsample(0.0, self.t_max, self.grid_points)
        return {"t": sampler.sample(key, n), "t0": jnp.zeros((n, 1))}

    def validation_sample(self, key, n):
        # Dense OFF-grid points: training uses a fixed 200-point grid, and a
        # net can zero the residual on the grid while oscillating between
        # its points — uniform sampling catches that (see base.Problem).
        import jax

        t = self.t_max * jax.random.uniform(key, (n, 1))
        return {"t": t, "t0": jnp.zeros((n, 1))}

    def _residuals(self, apply_fn, params, batch):
        """Per-point residual energy ℓ_i = r_y² + r_w² [B] and IC energy [B]."""
        t, t0 = batch["t"], batch["t0"]
        s, dsdt = time_jacobian(lambda z: apply_fn(params, z), t)
        y, w = s[:, :1], s[:, 1:]
        dy, dw = dsdt[:, :1], dsdt[:, 1:]
        # Residuals written as in the reference (fitzhugh_nagumo.py:93-94).
        r_y = dy + (y**3 / 3.0 + w - self.i_ext - y)
        r_w = dw + (self.beta * w - self.alpha - y) / self.tau
        s0 = apply_fn(params, t0)
        ic = jnp.mean(jnp.square(s0 - self.y_ic), axis=1)
        return jnp.square(r_y)[:, 0] + jnp.square(r_w)[:, 0], ic

    def point_loss(self, apply_fn, params, batch):
        # Pointwise sum whose mean equals the reference's
        # mse(r_y)+mse(r_w)+mse(s0−y_ic) (fitzhugh_nagumo.py:93-97).
        res, ic = self._residuals(apply_fn, params, batch)
        return res + ic

    def loss(self, apply_fn, params, batch, mask=None):
        """Causal-weighted residual loss (``causal_eps > 0``; Wang et al.
        2022): L = mean_i(w_i·ℓ_i) + mse(IC) with
        w_i = stop_grad(exp(−ε·Δt·Σ_{j<i} ℓ_j)) over the TIME-SORTED batch.
        The weights gate each point on how well the trajectory before it is
        already fit, so training marches forward in time and cannot settle
        on a spurious branch; as the residual converges, w → 1 and the loss
        anneals back to the reference objective. Masked (population) calls
        keep the reference loss — causal is a single-run training protocol."""
        if self.causal_eps <= 0.0 or mask is not None:
            return super().loss(apply_fn, params, batch, mask)
        import jax

        res, ic = self._residuals(apply_fn, params, batch)
        t = batch["t"][:, 0]
        # Σ_{j: t_j < t_i} ℓ_j as ONE comparison-mask matmul — permutation
        # -invariant and sort-free (argsort + gather cost ~20x step time on
        # TPU: the gather's VJP is a scatter). For the stratified sampler's
        # time-sorted batches this mask IS the strictly-lower triangle.
        earlier = (t[None, :] < t[:, None]).astype(res.dtype)   # [B, B]
        dt = self.t_max / res.shape[0]
        cum = (earlier @ jax.lax.stop_gradient(res)) * dt
        wgt = jax.lax.stop_gradient(jnp.exp(-self.causal_eps * cum))
        return jnp.mean(wgt * res) + jnp.mean(ic)

    def grid_inputs(self, nodes):
        return jnp.linspace(0.0, self.t_max, nodes)[:, None]

    def solution_shape(self, nodes):
        return (nodes, 2)

    def exact(self, nodes):
        from scipy.integrate import odeint

        t = np.linspace(0.0, self.t_max, nodes)
        args = (self.i_ext, self.alpha, self.beta, self.tau)
        return odeint(fzn_rhs, [self.y_ic, self.y_ic], t, args=args)
