"""PrimX Diffusion Transformer (DiT) — flax/TPU implementation.

Same architecture contract as the reference generator
(models/dit_crossattn.py:25-213): 2048 prim tokens x 68ch, Linear token
embed (no patchify/pos-emb), sinusoidal t-embedding, `depth` blocks of
[adaLN-Zero 9-way modulation -> cross-attn to image tokens -> self-attn ->
GELU-tanh MLP], adaLN final layer, learn_sigma doubling the output
channels, learned null-cond embedding for CFG.

TPU-first differences from the reference:
* bf16 matmuls with f32 LayerNorm/softmax/residuals instead of fp16
  autocast (dit_crossattn.py:197).
* ``precompute_kv``: the conditioning tokens are constant over the whole
  denoise chain, so per-block cross-attn K/V are projected once per
  sample and reused for all steps and both CFG branches.
* CFG runs the cond/uncond pair as one batch of 2 through a single jitted
  call (dit_crossattn.py:204-213 semantics).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.fused_ln import ln_modulate, ln_modulate_residual
from .layers import (
    CrossAttention,
    Mlp,
    SelfAttention,
    TimestepEmbedder,
)

Dtype = Any


class DiTBlock(nn.Module):
    """One DiT block with adaLN-Zero 9-chunk modulation
    (reference models/dit_crossattn.py:25-58)."""

    hidden_size: int
    cond_dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    proj_bias: bool = True
    dtype: Dtype = jnp.bfloat16
    attn_backend: str = "auto"
    quant: bool = False

    def setup(self):
        self.crossattn = CrossAttention(
            dim=self.hidden_size, num_heads=self.num_heads, qkv_bias=True,
            proj_bias=self.proj_bias, dtype=self.dtype, backend=self.attn_backend,
            quant=self.quant,
        )
        self.attn = SelfAttention(
            dim=self.hidden_size, num_heads=self.num_heads, qkv_bias=True,
            proj_bias=self.proj_bias, dtype=self.dtype, backend=self.attn_backend,
            quant=self.quant,
        )
        self.mlp = Mlp(
            hidden_features=int(self.hidden_size * self.mlp_ratio),
            out_features=self.hidden_size, dtype=self.dtype, quant=self.quant,
        )
        # zero-init so each block starts as identity (dit_crossattn.py:173-176)
        self.adaLN = nn.Dense(
            9 * self.hidden_size, dtype=jnp.float32,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="adaLN_modulation",
        )

    def cond_kv(self, y: jnp.ndarray):
        return self.crossattn.kv(y.astype(self.dtype))

    def cond_null_out(self, y_null: jnp.ndarray):
        """Cross-attn output vector for the uniform null-cond branch
        (see CrossAttention.uniform_out). y_null: [1, 1, C] -> [1, 1, D]."""
        _, v = self.crossattn.kv(y_null.astype(self.dtype))
        return self.crossattn.uniform_out(v)

    def __call__(self, x: jnp.ndarray, kv, t_emb: jnp.ndarray,
                 null_out: jnp.ndarray | None = None) -> jnp.ndarray:
        """x: [B, N, D] residual stream in self.dtype (the reference's
        fp16-autocast stream, dit_crossattn.py:197); kv: (k, v)
        precomputed; t_emb: [B, D] f32. LayerNorm stats stay f32; every
        other elementwise op runs in self.dtype so the stream never
        round-trips through f32 HBM traffic."""
        mods = self.adaLN(nn.silu(t_emb)).astype(self.dtype)
        (s_mca, sc_mca, g_mca, s_msa, sc_msa, g_msa,
         s_mlp, sc_mlp, g_mlp) = jnp.split(mods, 9, axis=-1)

        from jax.ad_checkpoint import checkpoint_name

        # LN+modulate fused into one HBM pass (ops/fused_ln.py); at the
        # two inner sublayer boundaries the residual gate-add fuses into
        # the next LN too (ln_modulate_residual), so the stream is read
        # and written once per boundary instead of twice. The 'ln_h' /
        # 'resid' checkpoint names feed the 'dots_plus' remat policy:
        # saving the three modulated streams and two residual carries
        # (~47 MB/block at micro-batch 2) spares the backward their
        # whole elementwise recompute chain.
        h = ln_modulate(x, s_mca, sc_mca, out_dtype=self.dtype)
        h = checkpoint_name(h, "ln_h")
        if null_out is None:
            att = self.crossattn.attend(h, *kv)
        else:
            # CFG fast path: the batch is [cond; uncond] halves and the
            # uncond half's conditioning is the null token broadcast —
            # its cross-attn output is the precomputed null_out vector
            # for every query, so only the cond half pays q-proj +
            # attention + out-proj (~11% of the CFG step)
            B = x.shape[0] // 2
            att_c = self.crossattn.attend(h[:B], *kv)
            att = jnp.concatenate(
                [att_c,
                 jnp.broadcast_to(null_out.astype(att_c.dtype), att_c.shape)],
                axis=0)
        x, h = ln_modulate_residual(
            x, att, g_mca, s_msa, sc_msa,
            out_dtype=self.dtype)
        x = checkpoint_name(x, "resid")
        h = checkpoint_name(h, "ln_h")
        x, h = ln_modulate_residual(
            x, self.attn(h), g_msa, s_mlp, sc_mlp, out_dtype=self.dtype)
        x = checkpoint_name(x, "resid")
        h = checkpoint_name(h, "ln_h")
        x = x + g_mlp[:, None, :] * self.mlp(h)
        return x


class FinalLayer(nn.Module):
    """adaLN(2-chunk) + zero-init projection (reference dit_crossattn.py:61-78).

    The projection matmul runs in the model dtype (the reference's
    autocast covers it too); the result is returned in f32 for the
    diffusion math."""

    hidden_size: int
    out_channels: int
    dtype: Dtype = jnp.float32

    def setup(self):
        self.linear = nn.Dense(
            self.out_channels, dtype=self.dtype,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
        )
        self.adaLN = nn.Dense(
            2 * self.hidden_size, dtype=jnp.float32,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="adaLN_modulation",
        )

    def __call__(self, x: jnp.ndarray, t_emb: jnp.ndarray) -> jnp.ndarray:
        shift, scale = jnp.split(
            self.adaLN(nn.silu(t_emb)).astype(self.dtype), 2, axis=-1)
        x = ln_modulate(x, shift, scale, out_dtype=self.dtype)
        return self.linear(x).astype(jnp.float32)


class PointEmbed(nn.Module):
    """Fourier positional embedding of prim centers
    (reference models/dit_crossattn.py:80-109): per-axis power-of-2
    frequencies x pi, sin|cos features + raw xyz -> Linear."""

    hidden_dim: int = 48
    dim: int = 128

    @nn.compact
    def __call__(self, pts: jnp.ndarray) -> jnp.ndarray:
        assert self.hidden_dim % 6 == 0
        e = 2.0 ** jnp.arange(self.hidden_dim // 6, dtype=jnp.float32) * jnp.pi
        zeros = jnp.zeros_like(e)
        basis = jnp.stack([
            jnp.concatenate([e, zeros, zeros]),
            jnp.concatenate([zeros, e, zeros]),
            jnp.concatenate([zeros, zeros, e]),
        ])  # [3, hidden_dim/2]
        proj = jnp.einsum("bnd,de->bne", pts, basis)
        emb = jnp.concatenate([jnp.sin(proj), jnp.cos(proj), pts], axis=-1)
        return nn.Dense(self.dim, name="mlp")(emb)


class _BlockScanBody(nn.Module):
    """nn.scan-compatible wrapper around one DiTBlock: carry is
    (x, y, t_emb); the block projects its own cross-attn K/V from y
    each call (training never reuses K/V across steps, so the serving
    precompute_kv optimization does not apply here)."""

    hidden_size: int
    cond_dim: int
    num_heads: int
    mlp_ratio: float
    proj_bias: bool
    dtype: Dtype
    attn_backend: str
    quant: bool

    @nn.compact
    def __call__(self, x, y, t_emb):
        # y/t_emb arrive as nn.broadcast args (loop-invariant): keeping
        # them OUT of the carry stops lax.scan saving a copy of y
        # (~34 MB at bs 8) per layer for the backward
        blk = DiTBlock(
            hidden_size=self.hidden_size, cond_dim=self.cond_dim,
            num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
            proj_bias=self.proj_bias, dtype=self.dtype,
            attn_backend=self.attn_backend, quant=self.quant,
            name="block",
        )
        kv = blk.cond_kv(y)
        x = blk(x, kv, t_emb)
        return x, None


def _remat_policy(remat):
    """Map a remat mode string to its jax.checkpoint policy.

    'dots_plus' extends 'dots' with the named elementwise landmarks
    ('ln_h' modulated streams, 'resid' residual carries): the backward
    then recomputes almost nothing — it trades ~47 MB/block at
    micro-batch 2 for skipping the LN/modulate recompute chain that
    dominated the r3 step's 165 ms elementwise bucket."""
    P = jax.checkpoint_policies
    names = {
        "dots": ("flash_out", "flash_lse"),
        "dots_plus": ("flash_out", "flash_lse", "ln_h", "resid"),
        "flash": ("flash_out", "flash_lse"),
        "flash_mlp": ("flash_out", "flash_lse", "mlp_fc1"),
    }
    if remat not in names:
        raise ValueError(
            f"remat={remat!r}: expected False, True, 'dots', 'dots_plus', "
            "'flash', or 'flash_mlp'")
    policy = P.save_only_these_names(*names[remat])
    if remat.startswith("dots"):
        policy = P.save_from_both_policies(
            P.dots_with_no_batch_dims_saveable, policy)
    return policy


class DiT(nn.Module):
    """Flagship generator (reference models/dit_crossattn.py:111-213)."""

    seq_length: int = 2048
    in_channels: int = 68
    condition_channels: int = 768
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    mlp_ratio: float = 4.0
    cond_drop_prob: float = 0.0
    attn_proj_bias: bool = True
    learn_sigma: bool = True
    dtype: Dtype = jnp.bfloat16
    attn_backend: str = "auto"
    # Block rematerialization for training memory:
    #   False   — save all activations (fastest; fits B<=2/chip flagship)
    #   True    — recompute the whole block in the backward (+~33% FLOPs;
    #             the reference recipe's bs 8/device baseline)
    #   "dots"  — save matmul outputs, recompute only elementwise ops
    #             (checkpoint_policies.dots_with_no_batch_dims_saveable):
    #             near remat=False speed at a fraction of the memory
    #   "dots_plus" — 'dots' + the named ln_h/resid streams: backward
    #             recomputes almost nothing, +~47 MB/block at micro B=2
    #   "flash" — save ONLY the flash kernel's out/lse (~75 MB/block at
    #             bs 8): the backward re-runs the cheap elementwise ops
    #             and matmuls but never the attention forward — the
    #             middle ground between True and "dots" for bs 8
    remat: bool | str = False
    # Training layout: compile the 28 blocks as ONE lax.scan body instead
    # of unrolling them. Cuts the train-step HLO ~depth-fold (the B=8
    # donated step's 8-12 min remote compile crashed the compile helper
    # unrolled), at identical math. Params gain a leading [depth] axis
    # ("blocks.block.*"); convert to/from the unrolled serving layout
    # with stack_block_params / unstack_block_params. Training path
    # (__call__) only — forward_kv/precompute_kv require the unrolled
    # layout.
    scan_blocks: bool = False
    # lax.scan unroll factor for the block scan: >1 lets XLA fuse and
    # schedule across adjacent block boundaries (fewer carry
    # slice/update round-trips) at k-fold larger HLO
    scan_unroll: int = 1
    # int8 (W8A8) serving path: per-step block matmuls run on the int8
    # MXU (2x the bf16 rate on v5e). Params are the quantized form —
    # produce them from float weights with quantize_dit_params.
    # Inference-only (the int8 rounding has no useful gradient).
    quant: bool = False

    @property
    def out_channels(self) -> int:
        return self.in_channels * 2 if self.learn_sigma else self.in_channels

    def setup(self):
        self.x_embedder = nn.Dense(
            self.hidden_size, dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(),
        )
        self.t_embedder = TimestepEmbedder(self.hidden_size)
        if self.scan_blocks:
            body = _BlockScanBody
            if isinstance(self.remat, str):
                body = nn.remat(body, static_argnums=(),
                                policy=_remat_policy(self.remat))
            elif self.remat:
                body = nn.remat(body, static_argnums=())
            self.blocks_scan = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast, nn.broadcast),
                length=self.depth,
                unroll=self.scan_unroll,
            )(
                hidden_size=self.hidden_size,
                cond_dim=self.condition_channels,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                proj_bias=self.attn_proj_bias,
                dtype=self.dtype,
                attn_backend=self.attn_backend,
                quant=self.quant,
                name="blocks",
            )
            self.final_layer = FinalLayer(
                hidden_size=self.hidden_size,
                out_channels=self.out_channels, dtype=self.dtype,
            )
            self.null_cond_embedding = self.param(
                "null_cond_embedding",
                nn.initializers.normal(1.0),
                (self.condition_channels,),
            )
            return
        block = DiTBlock
        if isinstance(self.remat, str):
            # matmul outputs, the flash kernel's saved out/lse, and any
            # mode-specific named landmarks are kept (see _remat_policy)
            block = nn.remat(DiTBlock, static_argnums=(),
                             policy=_remat_policy(self.remat))
        elif self.remat:
            block = nn.remat(DiTBlock, static_argnums=())
        self.blocks = [
            block(
                hidden_size=self.hidden_size,
                cond_dim=self.condition_channels,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                proj_bias=self.attn_proj_bias,
                dtype=self.dtype,
                attn_backend=self.attn_backend,
                quant=self.quant,
            )
            for _ in range(self.depth)
        ]
        self.final_layer = FinalLayer(
            hidden_size=self.hidden_size, out_channels=self.out_channels,
            dtype=self.dtype,
        )
        # always created: forward_with_cfg is part of the public API even
        # for models trained without cond-drop (VERDICT r1 weak #10), and
        # the released reference checkpoints carry the parameter
        self.null_cond_embedding = self.param(
            "null_cond_embedding",
            nn.initializers.normal(1.0),
            (self.condition_channels,),
        )

    # ---- conditioning helpers -------------------------------------------

    def precompute_kv(self, y: jnp.ndarray):
        """Per-block cross-attn K/V for a conditioning sequence [B, M, C]."""
        if self.scan_blocks:
            raise ValueError(
                "precompute_kv/forward_kv need the unrolled serving layout; "
                "convert scanned params with unstack_block_params")
        return [blk.cond_kv(y) for blk in self.blocks]

    def precompute_null_out(self):
        """Per-block cross-attn output vectors for the CFG null branch.

        The null conditioning is one embedding broadcast over the whole
        sequence (forward_with_cfg, reference dit_crossattn.py:204-213);
        softmax over identical keys is exactly uniform, so the uncond
        branch's cross-attention collapses to proj(v_null) — a [1,1,D]
        vector per block, computed once per model load."""
        if self.scan_blocks:
            raise ValueError(
                "precompute_null_out needs the unrolled serving layout")
        y_null = self.null_cond_embedding[None, None, :]
        return [blk.cond_null_out(y_null) for blk in self.blocks]

    def null_kv(self, batch: int, seq: int):
        y = jnp.broadcast_to(
            self.null_cond_embedding[None, None, :],
            (batch, seq, self.condition_channels),
        )
        return self.precompute_kv(y)

    # ---- forward passes ---------------------------------------------------

    def embed_tokens(self, x: jnp.ndarray) -> jnp.ndarray:
        """Token embedding (no patchify/pos-emb; reference
        dit_crossattn.py:164-167). Variants override this — it is also the
        stage-0 entry point of the pipeline-parallel path
        (topiaxl/parallel/pipeline.py)."""
        return self.x_embedder(x.astype(self.dtype))

    def embed_t(self, t: jnp.ndarray) -> jnp.ndarray:
        return self.t_embedder(t)

    def apply_final(self, x: jnp.ndarray, t_emb: jnp.ndarray) -> jnp.ndarray:
        return self.final_layer(x, t_emb)

    def forward_kv(self, x: jnp.ndarray, t: jnp.ndarray, kvs) -> jnp.ndarray:
        """Denoise step against precomputed per-block K/V."""
        x = self.embed_tokens(x)
        t_emb = self.t_embedder(t)
        for blk, kv in zip(self.blocks, kvs):
            x = blk(x, kv, t_emb)
        return self.final_layer(x, t_emb)

    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        y: jnp.ndarray,
        train: bool = False,
        drop_key: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        """x: [B, N, C_in]; t: [B] int; y: [B, M, C_cond] -> [B, N, C_out].

        During training, whole samples' conditioning is replaced by the
        null embedding with prob ``cond_drop_prob``
        (reference dit_crossattn.py:193-196).
        """
        if train and self.cond_drop_prob > 0 and drop_key is not None:
            drop = (
                jax.random.uniform(drop_key, (y.shape[0],)) < self.cond_drop_prob
            )
            null = self.null_cond_embedding[None, None, :]
            y = jnp.where(drop[:, None, None], null, y)
        if self.scan_blocks:
            x = self.embed_tokens(x)
            t_emb = self.t_embedder(t)
            # cast the conditioning ONCE: inside the scan each block's
            # cond_kv would re-cast the f32 y -> bf16 per layer (XLA
            # cannot hoist the cast out of the loop body)
            x, _ = self.blocks_scan(x, y.astype(self.dtype), t_emb)
            return self.final_layer(x, t_emb)
        kvs = self.precompute_kv(y)
        return self.forward_kv(x, t, kvs)

    def forward_with_cfg(
        self, x: jnp.ndarray, t: jnp.ndarray, y: jnp.ndarray, cfg_scale: float
    ) -> jnp.ndarray:
        """Classifier-free guidance via batch doubling
        (reference dit_crossattn.py:204-213)."""
        combined = jnp.concatenate([x, x], axis=0)
        combined_t = jnp.concatenate([t, t], axis=0)
        y_null = jnp.broadcast_to(
            self.null_cond_embedding[None, None, :], y.shape
        )
        combined_y = jnp.concatenate([y, y_null], axis=0)
        out = self(combined, combined_t, combined_y)
        cond, uncond = jnp.split(out, 2, axis=0)
        return uncond + cfg_scale * (cond - uncond)

    def forward_with_cfg_kv(self, x, t, kvs_pair, cfg_scale: float):
        """CFG against precomputed cond+null K/V stacked on the batch axis.

        ``kvs_pair`` is a list of (k, v) whose batch dim is 2B: [cond; null].
        """
        combined = jnp.concatenate([x, x], axis=0)
        combined_t = jnp.concatenate([t, t], axis=0)
        out = self.forward_kv(combined, combined_t, kvs_pair)
        cond, uncond = jnp.split(out, 2, axis=0)
        return uncond + cfg_scale * (cond - uncond)

    def forward_with_cfg_fast(self, x, t, kvs_cond, null_outs,
                              cfg_scale: float):
        """CFG with cond-only K/V + precomputed null-branch vectors.

        Mathematically identical to forward_with_cfg_kv (the uncond
        branch's cross-attention over a broadcast null token IS its
        uniform_out vector — see precompute_null_out) but skips the
        uncond half's q-proj, attention kernel, and out-proj entirely.
        ``kvs_cond``: per-block (k, v) at batch B; ``null_outs``:
        per-block [1, 1, D] from precompute_null_out."""
        combined = jnp.concatenate([x, x], axis=0)
        combined_t = jnp.concatenate([t, t], axis=0)
        h = self.embed_tokens(combined)
        t_emb = self.t_embedder(combined_t)
        for blk, kv, no in zip(self.blocks, kvs_cond, null_outs):
            h = blk(h, kv, t_emb, null_out=no)
        out = self.final_layer(h, t_emb)
        cond, uncond = jnp.split(out, 2, axis=0)
        return uncond + cfg_scale * (cond - uncond)


def stack_block_params(params):
    """Unrolled DiT params (blocks_0..blocks_{d-1}) -> the scan_blocks
    layout ({'blocks': {'block': stacked leaves [depth, ...]}}). Works on
    a {'params': ...} tree or the inner dict; non-block entries pass
    through unchanged."""
    outer = "params" in params
    p = dict(params["params"] if outer else params)
    names = sorted((k for k in p if k.startswith("blocks_")),
                   key=lambda k: int(k.split("_")[1]))
    if not names:
        raise ValueError("no blocks_<i> entries: already stacked?")
    blocks = [p.pop(k) for k in names]
    p["blocks"] = {"block": jax.tree.map(
        lambda *xs: jnp.stack(xs), *blocks)}
    return {**params, "params": p} if outer else p


def unstack_block_params(params):
    """Inverse of stack_block_params: scan layout -> blocks_<i> list
    layout (the serving/unrolled parameter tree)."""
    outer = "params" in params
    p = dict(params["params"] if outer else params)
    if "blocks" not in p:
        raise ValueError("no 'blocks' entry: already unrolled?")
    stacked = p.pop("blocks")["block"]
    depth = jax.tree.leaves(stacked)[0].shape[0]
    for i in range(depth):
        p[f"blocks_{i}"] = jax.tree.map(lambda x: x[i], stacked)
    return {**params, "params": p} if outer else p


def quantize_dit_params(model: "DiT", params):
    """Float DiT params -> the param tree of the same model with
    ``quant=True`` (block matmul kernels as int8 + per-channel scales;
    everything else passed through). Use with ``model.clone(quant=True)``
    or a fresh ``DiT(..., quant=True)``."""
    from ..ops.int8 import quantize_params_like

    qmodel = model.clone(quant=True) if not model.quant else model
    x = jnp.zeros((1, qmodel.seq_length, qmodel.in_channels))
    t = jnp.zeros((1,), jnp.int32)
    y = jnp.zeros((1, 2, qmodel.condition_channels))
    template = jax.eval_shape(qmodel.init, jax.random.PRNGKey(0), x, t, y)
    return quantize_params_like(params, template)


class DiTAdditivePosEmb(DiT):
    """DiT variant adding a Fourier point embedding of the prim centers
    (token channels 1:4) to the token embedding
    (reference models/dit_crossattn.py:215-301)."""

    def setup(self):
        super().setup()
        self.point_emb = PointEmbed(hidden_dim=48, dim=self.hidden_size)

    def embed_tokens(self, x: jnp.ndarray) -> jnp.ndarray:
        pts = x[:, :, 1:4].astype(jnp.float32)
        return (self.x_embedder(x.astype(self.dtype))
                + self.point_emb(pts).astype(self.dtype))
