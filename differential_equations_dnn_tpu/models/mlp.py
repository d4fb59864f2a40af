"""Feed-forward MLP with optional pre-/post-activation BatchNorm.

Capability parity with the reference's three MLP flavours:

* plain MLP                      — neural_networks.py:180-270 (``MLP``)
* BN before activation ("pre")   — neural_networks.py:197-207 (``MLP(batch_norm=True)``)
                                   and batchnorm_effect_heat.py:113-188 (``MLPBNPre``)
* BN after activation ("post")   — batchnorm_effect_heat.py:34-110 (``MLPBNPost``)

TPU-first design differences (deliberate, documented):

* Hidden layers are *stacked* along a leading layer axis and traversed with
  ``lax.scan`` — one compiled layer body regardless of depth, and the layer
  axis is a clean vmap target for population sweeps.
* BatchNorm keeps one (gamma, beta) and one running-stat slot *per layer*.
  The reference reuses a single ``nn.BatchNorm1d`` instance across every
  layer (neural_networks.py:198, batchnorm_effect_heat.py:66,145) — a quirk,
  not a feature; per-layer statistics are the correct semantics.
* Init matches the reference's ``reset()`` (neural_networks.py:247-270):
  xavier-uniform with activation gain for tanh/sigmoid (output layer with
  gain 1), kaiming-uniform for relu/leaky_relu; biases keep the torch
  ``nn.Linear`` default U(±1/sqrt(fan_in)); BN variants drop Linear biases.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import lax

from differential_equations_dnn_tpu.core.activations import get_activation
from differential_equations_dnn_tpu.core.init import (
    calculate_gain,
    kaiming_uniform,
    torch_linear_default,
    xavier_uniform,
)
from differential_equations_dnn_tpu.core.precision import dense

_BN_EPS = 1e-5
_BN_MOMENTUM = 0.1


def _bn_train(x, gamma, beta):
    """Train-mode batch normalisation over the batch axis; returns the
    normalised activations plus the batch statistics for running updates."""
    mean = jnp.mean(x, axis=0)
    var = jnp.var(x, axis=0)
    xhat = (x - mean) * lax.rsqrt(var + _BN_EPS)
    return xhat * gamma + beta, (mean, var)


def _bn_eval(x, gamma, beta, mean, var):
    xhat = (x - mean) * lax.rsqrt(var + _BN_EPS)
    return xhat * gamma + beta


@dataclass(frozen=True)
class MLP:
    input_dim: int = 2
    output_dim: int = 1
    hidden_size: int = 50
    num_layers: int = 1
    activation: str = "relu"
    batch_norm: str | None = None  # None | "pre" | "post"
    # Random Fourier feature embedding (beyond the reference; Tancik et al.
    # 2020): x → [sin(2π B x), cos(2π B x)] with frozen B ~ N(0, σ²),
    # 2·fourier_features columns. Cures the spectral bias that makes plain
    # MLPs struggle on oscillatory solutions (e.g. FitzHugh–Nagumo).
    fourier_features: int = 0
    fourier_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    def __post_init__(self):
        if self.batch_norm not in (None, "pre", "post"):
            raise ValueError(f"batch_norm must be None|'pre'|'post', got {self.batch_norm!r}")
        # Unknown activation names fall back to relu (reference selector
        # behaviour, neural_networks.py:39-41) — normalised once here so init
        # gains and the forward pass agree.
        from differential_equations_dnn_tpu.core.activations import ACTIVATIONS

        if self.activation not in ACTIVATIONS:
            object.__setattr__(self, "activation", "relu")

    # ---- init ------------------------------------------------------------

    def _weight(self, key, shape, *, is_output: bool):
        if self.activation in ("relu", "leaky_relu"):
            return kaiming_uniform(key, shape, self.activation, self.dtype)
        gain = 1.0 if is_output else calculate_gain(self.activation)
        return xavier_uniform(key, shape, gain, self.dtype)

    @property
    def _embed_dim(self):
        return (2 * self.fourier_features if self.fourier_features
                else self.input_dim)

    def init(self, key):
        kin, khid, kout, kb, kf = jax.random.split(key, 5)
        H, L = self.hidden_size, self.num_layers
        use_bias = self.batch_norm is None

        params = {
            "fc_in": {
                "w": self._weight(kin, (self._embed_dim, H), is_output=False)
            },
            "hidden": {
                "w": jax.vmap(
                    lambda k: self._weight(k, (H, H), is_output=False)
                )(jax.random.split(khid, L))
                if L > 0
                else jnp.zeros((0, H, H), self.dtype)
            },
            "fc_out": {
                "w": self._weight(kout, (H, self.output_dim), is_output=True)
            },
        }
        if self.fourier_features:
            # Frozen embedding matrix (stop-gradient applied in the forward).
            params["fourier"] = {
                "b": self.fourier_scale * jax.random.normal(
                    kf, (self.input_dim, self.fourier_features), self.dtype)
            }
        if use_bias:
            # Reference reset() re-inits weights only; biases keep the torch
            # nn.Linear default distribution (neural_networks.py:247-270).
            kbi, kbh, kbo = jax.random.split(kb, 3)
            params["fc_in"]["b"] = torch_linear_default(
                kbi, (self._embed_dim, H), dtype=self.dtype
            )[1]
            params["hidden"]["b"] = (
                jax.vmap(lambda k: torch_linear_default(k, (H, H), dtype=self.dtype)[1])(
                    jax.random.split(kbh, L)
                )
                if L > 0
                else jnp.zeros((0, H), self.dtype)
            )
            params["fc_out"]["b"] = torch_linear_default(
                kbo, (H, self.output_dim), dtype=self.dtype
            )[1]
        else:
            params["fc_out"]["b"] = torch_linear_default(
                kb, (H, self.output_dim), dtype=self.dtype
            )[1]
            # One BN per layer (fc_in + each hidden layer).
            params["bn"] = {
                "gamma": jnp.ones((L + 1, H), self.dtype),
                "beta": jnp.zeros((L + 1, H), self.dtype),
            }
        return params

    def init_state(self):
        """Running BatchNorm statistics (only for BN variants)."""
        if self.batch_norm is None:
            return None
        L, H = self.num_layers, self.hidden_size
        return {
            "mean": jnp.zeros((L + 1, H), self.dtype),
            "var": jnp.ones((L + 1, H), self.dtype),
        }

    # ---- forward ---------------------------------------------------------

    def apply(self, params, x, state=None, train=True, unroll=False):
        """Forward pass. Stateless (no BN): returns ``y``. With BN: returns
        ``(y, new_state)`` where ``new_state`` holds updated running stats
        (``new_state is state`` when ``train=False``). ``unroll`` replaces
        the layer scan with a static Python loop (required when tracing
        inside a Pallas kernel body — Mosaic cannot lower extensive-input
        scans)."""
        act = get_activation(self.activation)
        squeeze = x.ndim == 1
        if squeeze:
            x = x[None, :]

        if self.fourier_features:
            B = lax.stop_gradient(params["fourier"]["b"])
            proj = 2.0 * jnp.pi * jnp.dot(x, B)
            x = jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)

        if self.batch_norm is None:
            h = act(dense(x, params["fc_in"]["w"], params["fc_in"].get("b")))
            if self.num_layers > 0:
                def body(h, layer):
                    return act(dense(h, layer["w"], layer.get("b"))), None

                if unroll:
                    # Static Python loop: Mosaic (Pallas TPU) has no lowering
                    # for scan with extensive inputs, and the generic fused
                    # training kernel traces this forward inside its body.
                    for l in range(self.num_layers):
                        layer = jax.tree.map(lambda a: a[l], params["hidden"])
                        h, _ = body(h, layer)
                else:
                    h, _ = lax.scan(body, h, params["hidden"])
            y = dense(h, params["fc_out"]["w"], params["fc_out"]["b"])
            return y[0] if squeeze else y

        # BN path -----------------------------------------------------------
        bn = params["bn"]

        def bn_block(h, i_gamma, i_beta, i_mean, i_var):
            if train:
                out, (m, v) = _bn_train(h, i_gamma, i_beta)
                new_m = (1 - _BN_MOMENTUM) * i_mean + _BN_MOMENTUM * m
                n = h.shape[0]
                unbiased = v * n / max(n - 1, 1)
                new_v = (1 - _BN_MOMENTUM) * i_var + _BN_MOMENTUM * unbiased
                return out, (new_m, new_v)
            return _bn_eval(h, i_gamma, i_beta, i_mean, i_var), (i_mean, i_var)

        def layer_fwd(h, w, idx):
            z = dense(h, w)
            if self.batch_norm == "pre":
                z, stats = bn_block(
                    z, bn["gamma"][idx], bn["beta"][idx], state["mean"][idx], state["var"][idx]
                )
                return act(z), stats
            z = act(z)
            return bn_block(
                z, bn["gamma"][idx], bn["beta"][idx], state["mean"][idx], state["var"][idx]
            )

        means, vars_ = [], []
        h, (m, v) = layer_fwd(x, params["fc_in"]["w"], 0)
        means.append(m)
        vars_.append(v)
        for i in range(self.num_layers):
            h, (m, v) = layer_fwd(h, params["hidden"]["w"][i], i + 1)
            means.append(m)
            vars_.append(v)
        y = dense(h, params["fc_out"]["w"], params["fc_out"]["b"])
        new_state = {"mean": jnp.stack(means), "var": jnp.stack(vars_)}
        if squeeze:
            y = y[0]
        return y, new_state

    __call__ = apply
