"""Model-level context parallelism (ring attention over a token axis).

For prim counts beyond one chip's attention budget: the DiT forward runs
under ``shard_map`` with the token dim sharded over ``sp`` — self-attn
uses the K/V ring (ops/ring_attention.py), cross-attn attends local q
shards against the replicated conditioning K/V, and every other op in
the block (embedder, LN+modulate, MLP, final layer) is per-token and
needs no communication at all.

This is the explicit-collective alternative to the GSPMD
``sequence_sharding`` layout (sharding.py): GSPMD all-gathers K/V per
layer; the ring keeps O(N/P) memory and overlaps transfer with compute.
Numerics equivalence vs the plain jit forward is tested in
tests/test_ring_attention.py.
"""

from __future__ import annotations

import jax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def make_cp_forward(model, mesh: Mesh, axis: str = "sp"):
    """Returns jitted ``fwd(params, x, t, y) -> out`` with x/out token-
    sharded over ``axis`` and ring self-attention inside.

    ``model`` is a DiT (or variant); its ``attn_backend`` is overridden
    with ``ring:<axis>``. The sequence length must divide the axis size.
    """
    cp_model = model.clone(attn_backend=f"ring:{axis}")

    def fwd(params, x, t, y):
        return cp_model.apply(params, x, t, y)

    x_spec = P(None, axis, None)
    f = shard_map(
        fwd, mesh=mesh,
        in_specs=(P(), x_spec, P(), P()),
        out_specs=x_spec,
        check_vma=False,
    )
    return jax.jit(f)
