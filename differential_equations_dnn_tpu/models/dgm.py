"""DGM (Deep Galerkin Method) LSTM-like network, Sirignano & Spiliopoulos 2018.

One implementation subsumes both reference variants:

* variant A — neural_networks.py:44-177 (raw-parameter gates, xavier-uniform
  with relu gain on every gate matrix, relu-or-tanh activations, zero biases)
* variant B — dgm_net.py:20-119 (``nn.Linear`` pairs per gate, torch default
  init, fixed tanh)

Both compute the same gate algebra (dgm_net.py:63-68):

    Z = σ(s W_z + x U_z + b_z)
    G = σ(s W_g + x U_g + b_g)
    R = σ(s W_r + x U_r + b_r)
    H = σ((s ⊙ R) W_h + x U_h + b_h)
    s' = (1 − G) ⊙ H + Z ⊙ s

TPU-first design: the four gates' matmuls are fused — per layer the state
side is ONE [hidden, 4·hidden] matmul and the input side ONE
[input, 4·hidden] matmul (H's state-side operand differs by the R mask, so H
is computed from a second small matmul). Layers are stacked on a leading axis
and traversed with ``lax.scan``. ``init_scheme`` selects the reference init:
``"torch"`` (variant B) or ``"xavier_relu"`` (variant A).
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import lax

from differential_equations_dnn_tpu.core.activations import get_activation
from differential_equations_dnn_tpu.core.init import (
    torch_linear_default,
    xavier_uniform,
    calculate_gain,
)
from differential_equations_dnn_tpu.core.precision import dense


def dgm_cell(x, s, layer, act):
    """One DGM gate-layer update (see module docstring for the algebra).

    ``layer`` holds ``Wzgr`` [H, 3H], ``Uzgr`` [D, 3H], ``bzgr`` [3H] for the
    Z/G/R gates (fused) and ``Wh`` [H, H], ``Uh`` [D, H], ``bh`` [H] for H.
    """
    H = s.shape[-1]
    zgr = act(dense(s, layer["Wzgr"]) + dense(x, layer["Uzgr"]) + layer["bzgr"])
    z, g, r = zgr[..., :H], zgr[..., H : 2 * H], zgr[..., 2 * H :]
    h = act(dense(s * r, layer["Wh"]) + dense(x, layer["Uh"]) + layer["bh"])
    return (1.0 - g) * h + z * s


@dataclass(frozen=True)
class DGM:
    input_dim: int = 1
    output_dim: int = 1
    hidden_size: int = 50
    num_layers: int = 1
    activation: str = "tanh"  # variant B fixed tanh; variant A passes relu/tanh
    init_scheme: str = "torch"  # "torch" (variant B) | "xavier_relu" (variant A)
    dtype: jnp.dtype = jnp.float32

    def __post_init__(self):
        if self.init_scheme not in ("torch", "xavier_relu"):
            raise ValueError(f"unknown init_scheme {self.init_scheme!r}")

    # ---- init ------------------------------------------------------------

    def _gate_weight(self, key, shape):
        if self.init_scheme == "xavier_relu":
            # neural_networks.py:63-96: xavier_uniform with relu gain.
            return xavier_uniform(key, shape, calculate_gain("relu"), self.dtype)
        return torch_linear_default(key, shape, with_bias=False, dtype=self.dtype)[0]

    def _gate_bias(self, key, fan_in, size):
        if self.init_scheme == "xavier_relu":
            # variant A biases start at zero (neural_networks.py:92-96).
            return jnp.zeros((size,), self.dtype)
        # variant B: bias of the state-side nn.Linear, U(±1/sqrt(hidden)).
        bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, self.dtype))
        return jax.random.uniform(key, (size,), self.dtype, -bound, bound)

    def _layer_init(self, key):
        D, H = self.input_dim, self.hidden_size
        ks = jax.random.split(key, 10)
        wz, wg, wr = (self._gate_weight(ks[i], (H, H)) for i in range(3))
        uz, ug, ur = (self._gate_weight(ks[3 + i], (D, H)) for i in range(3))
        return {
            "Wzgr": jnp.concatenate([wz, wg, wr], axis=1),
            "Uzgr": jnp.concatenate([uz, ug, ur], axis=1),
            "bzgr": jnp.concatenate(
                [self._gate_bias(jax.random.fold_in(ks[6], j), H, H) for j in (0, 1, 2)]
            ),
            "Wh": self._gate_weight(ks[7], (H, H)),
            "Uh": self._gate_weight(ks[8], (D, H)),
            "bh": self._gate_bias(ks[9], H, H),
        }

    def init(self, key):
        kin, klay, kout = jax.random.split(key, 3)
        D, H = self.input_dim, self.hidden_size
        # Input/output projections. Variant A xavier-inits these weights
        # (neural_networks.py:160-161); variant B keeps torch defaults
        # (dgm_net.py:92,98). Both keep the torch-default bias.
        win, bin_ = torch_linear_default(kin, (D, H), dtype=self.dtype)
        wout, bout = torch_linear_default(kout, (H, self.output_dim), dtype=self.dtype)
        if self.init_scheme == "xavier_relu":
            win = xavier_uniform(jax.random.fold_in(kin, 1), (D, H), 1.0, self.dtype)
            wout = xavier_uniform(
                jax.random.fold_in(kout, 1), (H, self.output_dim), 1.0, self.dtype
            )
        layers = jax.vmap(self._layer_init)(jax.random.split(klay, self.num_layers))
        return {
            "s_in": {"w": win, "b": bin_},
            "layers": layers,
            "s_out": {"w": wout, "b": bout},
        }

    # ---- forward ---------------------------------------------------------

    def apply(self, params, x, unroll=False):
        """``unroll`` replaces the layer scan with a static Python loop
        (required inside Pallas kernel bodies — Mosaic cannot lower
        extensive-input scans)."""
        act = get_activation(self.activation)
        squeeze = x.ndim == 1
        if squeeze:
            x = x[None, :]

        s = act(dense(x, params["s_in"]["w"], params["s_in"]["b"]))

        def body(s, layer):
            return dgm_cell(x, s, layer, act), None

        if unroll:
            for l in range(self.num_layers):
                layer = jax.tree.map(lambda a: a[l], params["layers"])
                s, _ = body(s, layer)
        else:
            s, _ = lax.scan(body, s, params["layers"])
        y = dense(s, params["s_out"]["w"], params["s_out"]["b"])
        return y[0] if squeeze else y

    __call__ = apply
