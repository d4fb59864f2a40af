"""L-BFGS fine-tuning: the standard PINN polish after Adam.

Adam with fresh stochastic collocation converges to ~1e-5 losses; a
second-order method on a FIXED large collocation set then drives the
deterministic residual much lower (measured on heat: MAE 0.00049 → 0.00019
with 200 steps). The whole polish is one jitted ``lax.scan`` of
``optax.lbfgs`` steps — no host sync.

Beyond the reference (which only runs Adam, heat.py:115).
"""

from functools import partial

import numpy as np

import jax
import optax
from jax import lax


def finetune_lbfgs(problem, params, key, steps: int = 200,
                   batch_size: int = 4096, model=None, apply_fn=None):
    """Polish ``params`` with full-batch L-BFGS on a fixed collocation set.

    Returns (params, loss_history np[steps])."""
    apply_fn = apply_fn or (model or problem.default_model()).apply
    # Dense OFF-GRID collocation (validation_sample): polishing on a fixed
    # training grid would overfit it, and grid samplers cannot produce
    # more points than the grid holds anyway.
    batch = problem.validation_sample(key, batch_size)

    def loss_fn(p):
        return problem.loss(apply_fn, p, batch)

    opt = optax.lbfgs()
    value_and_grad = optax.value_and_grad_from_state(loss_fn)

    @partial(jax.jit, static_argnames=("n",))
    def run(params, n):
        state = opt.init(params)

        def step(carry, _):
            params, state = carry
            value, grad = value_and_grad(params, state=state)
            updates, state = opt.update(grad, state, params, value=value,
                                        grad=grad, value_fn=loss_fn)
            params = optax.apply_updates(params, updates)
            return (params, state), value

        (params, _), values = lax.scan(step, (params, state), None, length=n)
        return params, values

    params, values = run(params, steps)
    return params, np.asarray(values)
