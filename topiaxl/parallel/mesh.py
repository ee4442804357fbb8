"""Device-mesh construction.

The reference ships no multi-device execution at all (SURVEY.md §2.6); the
TPU-native scaling story is green-field: a named ``jax.sharding.Mesh``
over which training/inference are jit-compiled with NamedSharding
constraints, letting XLA place collectives on ICI. Axes:

* ``dp``   — data parallel (batch dim)
* ``fsdp`` — parameter/optimizer sharding (ZeRO-style, rides ICI)
* ``tp``   — tensor parallel (attention heads / MLP hidden)

Multi-host initialization is ``jax.distributed.initialize`` +
the same code; nothing here is host-count aware.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(axes: Mapping[str, int] | None = None,
              devices: Sequence[jax.Device] | None = None) -> Mesh:
    """Build a mesh from {axis: size}; one axis may be -1 (inferred).

    Default: all devices on a single ``dp`` axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    axes = dict(axes or {"dp": -1})
    known = int(np.prod([s for s in axes.values() if s != -1]))
    names, sizes = [], []
    for name, size in axes.items():
        if size == -1:
            if n % known:
                raise ValueError(f"{n} devices not divisible by {known}")
            size = n // known
        names.append(name)
        sizes.append(size)
    total = int(np.prod(sizes))
    if total > n:
        raise ValueError(f"mesh {dict(zip(names, sizes))} > {n} devices")
    # an explicit smaller mesh uses the first `total` devices
    dev_array = np.asarray(devices[:total]).reshape(sizes)
    return Mesh(dev_array, tuple(names))


def mesh_from_config(cfg) -> Mesh:
    """cfg like {'dp': -1} or {'dp': 2, 'tp': 4} (train.mesh config node)."""
    if cfg is None:
        return make_mesh()
    return make_mesh(dict(cfg))
