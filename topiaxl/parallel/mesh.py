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


def make_hybrid_mesh(ici_axes: Mapping[str, int],
                     dcn_axes: Mapping[str, int],
                     devices: Sequence[jax.Device] | None = None) -> Mesh:
    """Multi-slice mesh: ``dcn_axes`` span slices (data-center network),
    ``ici_axes`` stay within a slice (chip interconnect).

    The production layout for multi-pod training: gradient all-reduce for
    the dp axis crosses DCN once per step (tolerant of its latency/
    bandwidth), while fsdp/tp/sp collectives — issued per layer — ride
    ICI. E.g. ``make_hybrid_mesh({'fsdp': 4, 'tp': 2}, {'dp': 4})`` on
    4 slices of 8 chips.

    On hardware that reports ``slice_index`` (multi-slice TPU), device
    placement comes from ``mesh_utils.create_hybrid_device_mesh`` so each
    dcn coordinate is exactly one slice. Elsewhere (single slice, CPU
    test platform) the flattened device order is used — the same
    contiguous grouping, since JAX enumerates devices slice-major. Axis
    names must not repeat across the two groups; dcn axes are outermost
    in the returned mesh.
    """
    devices = list(devices if devices is not None else jax.devices())
    ici = {k: int(v) for k, v in ici_axes.items()}
    dcn = {k: int(v) for k, v in dcn_axes.items()}
    overlap = set(ici) & set(dcn)
    if overlap:
        raise ValueError(f"axes {sorted(overlap)} appear in both ici and dcn")
    n_ici = int(np.prod(list(ici.values()) or [1]))
    n_dcn = int(np.prod(list(dcn.values()) or [1]))
    total = n_ici * n_dcn
    if total > len(devices):
        raise ValueError(
            f"hybrid mesh {dict(**dcn, **ici)} > {len(devices)} devices")
    devices = devices[:total]
    names = tuple(dcn) + tuple(ici)
    sizes = tuple(dcn.values()) + tuple(ici.values())

    slice_ids = {getattr(d, "slice_index", 0) for d in devices}
    if len(slice_ids) > 1:
        from jax.experimental import mesh_utils

        # same ordered axis list for both networks: dcn axes are 1 on
        # ICI and vice versa
        dev_array = mesh_utils.create_hybrid_device_mesh(
            tuple([1] * len(dcn)) + tuple(ici.values()),
            tuple(dcn.values()) + tuple([1] * len(ici)),
            devices=devices,
        )
    else:
        dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, names)
