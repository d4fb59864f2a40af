"""Mesh construction helpers."""

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(axes: dict[str, int], devices=None) -> Mesh:
    """Build a Mesh from ``{axis_name: size}``. Sizes must multiply to the
    device count used (a prefix of ``jax.devices()`` by default), so the
    same code runs on 1 real chip, an 8-way CPU simulation, or a v4 pod
    slice. Axis order follows dict order — put the axis whose collectives
    matter most (usually 'data') innermost for ICI locality."""
    devices = list(devices if devices is not None else jax.devices())
    shape = tuple(axes.values())
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    grid = np.array(devices[:n]).reshape(shape)
    return Mesh(grid, tuple(axes.keys()))


def single_axis_mesh(name: str = "data", n: int | None = None, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = n if n is not None else len(devices)
    return make_mesh({name: n}, devices)
