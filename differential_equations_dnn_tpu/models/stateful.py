"""Stateful-model (BatchNorm) plumbing for the standard training path.

The reference trains its BatchNorm MLPs through the very same
``minimize_loss_dgm`` loop as every stateless net — the torch modules carry
their running statistics internally (batchnorm_effect_heat.py:239-290). In a
functional framework that state must be threaded explicitly, so the trainer
speaks one tiny protocol:

* ``model.init_state()``      — returns the mutable state pytree, or ``None``
                                for stateless models (every model without the
                                method is stateless by definition);
* ``model.apply(params, x, state=..., train=...)``
                              — returns ``(y, new_state)`` when stateful.

Two facts make the threading cheap:

1. In TRAIN mode the *output* never depends on the running state — BatchNorm
   normalises with the current batch statistics (models/mlp.py:_bn_train),
   exactly like torch's train-mode forward. So the loss/grad computation can
   close over any state snapshot; the gradients are state-independent.
2. The running statistics only matter for EVAL-mode forwards (grid
   evaluation, serving). The trainer refreshes them once per step with a
   single train-mode forward on the domain batch (``Problem.domain_inputs``),
   mirroring how the reference's stats track the training distribution.
"""


def init_model_state(model):
    """The model's initial mutable state (BatchNorm running stats), or None."""
    init_state = getattr(model, "init_state", None)
    return init_state() if init_state is not None else None


def train_apply(model, state):
    """A stateless-looking ``apply_fn(params, x)`` for LOSS evaluation.

    Train-mode batch statistics; the returned running-state update is
    discarded (see module docstring: it cannot affect the loss value)."""
    if state is None:
        return model.apply

    def apply_fn(params, x):
        y, _ = model.apply(params, x, state=state, train=True)
        return y

    return apply_fn


def eval_apply(model, state):
    """A stateless-looking ``apply_fn(params, x)`` for EVALUATION, using the
    trained running statistics (torch ``net.eval()`` semantics,
    fitzhugh_nagumo.py:171)."""
    if state is None:
        return model.apply

    def apply_fn(params, x):
        y, _ = model.apply(params, x, state=state, train=False)
        return y

    return apply_fn


def update_state(model, params, state, inputs):
    """One train-mode forward to refresh running statistics; no-op when
    stateless."""
    if state is None:
        return None
    _, new_state = model.apply(params, inputs, state=state, train=True)
    return new_state
