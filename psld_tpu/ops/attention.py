"""Fused full-spatial attention kernel (Pallas, TPU).

NCSN++'s only attention is single-head over H*W <= 16*16 = 256 tokens
(reference layerspp.py:62-91; SURVEY.md section 5: no sequence sharding
needed -- the whole score matrix fits in VMEM). This kernel fuses
QK^T -> softmax -> V into one VMEM-resident program per batch element,
never materializing the (B, N, N) attention matrix in HBM.

Numerically stable softmax; f32 accumulation on the MXU. The jnp fallback
(`attention_reference`) mirrors the reference einsum chain and serves CPU
tests and unfriendly shapes.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def attention_reference(q, k, v, scale):
    """(B, N, C) einsum attention (reference layerspp.py:82-86)."""
    w = jnp.einsum("bqc,bkc->bqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    w = jax.nn.softmax(w, axis=-1)
    return jnp.einsum("bqk,bkc->bqc", w, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    w = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    w = w - jnp.max(w, axis=-1, keepdims=True)
    w = jnp.exp(w)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    o = jnp.dot(w, v.astype(jnp.float32),
                preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _lane_pad(c: int) -> int:
    """Channel count rounded up to the 128-lane multiple the MXU tiles.

    Odd widths (the AFHQ family's nf=160) are zero-padded to the next
    lane multiple before the kernel and sliced back after: zero channels
    add nothing to QK^T and produce zero output channels, so the result
    is exact while the kernel sees only friendly shapes."""
    return -(-c // 128) * 128


def _pallas_ok(n: int, c: int, dtype) -> bool:
    from psld_tpu import knobs

    # one batch slice must fit comfortably in VMEM: q,k,v,o (N,C) + (N,N),
    # at the lane-padded width actually staged
    cp = _lane_pad(c)
    if cp != c and not knobs.pad_attn():
        # measured on-chip (AFHQv2-128 train shape, 256 tokens x C=320
        # padded to 384): the lane-padded kernel LOSES to the einsum
        # fallback (108.3 vs 113.4 img/s — padding FLOPs beat the fusion
        # win), so non-aligned widths default to the fallback;
        # model.score_fn.pad_attn=true (env PSLD_PAD_ATTN=1) opts back in
        return False
    bytes_needed = (4 * n * cp + n * n) * 4
    return n % 8 == 0 and bytes_needed < 8 * 1024 * 1024


def _pallas_attention(q, k, v, scale: float):
    b, n, c = q.shape
    cp = _lane_pad(c)
    if cp != c:
        pad = [(0, 0), (0, 0), (0, cp - c)]
        q, k, v = (jnp.pad(a, pad) for a in (q, k, v))
        return _pallas_attention(q, k, v, scale)[..., :c]
    # index-map zeros must stay i32: under jax_enable_x64 a literal 0 traces
    # as i64, which Mosaic cannot legalize ("failed to legalize func.return");
    # deriving them from the (strongly-typed i32) grid index keeps the dtype
    spec = pl.BlockSpec((1, n, c), lambda i: (i, i * 0, i * 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, n, c), q.dtype),
        grid=(b,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
    )(q, k, v)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _attention_vjp(scale, q, k, v):
    return _pallas_attention(q, k, v, scale)


def _attention_fwd(scale, q, k, v):
    return _pallas_attention(q, k, v, scale), (q, k, v)


def _attention_bwd(scale, res, g):
    # exact gradient of the same function: recompute the (tiny, <=256-token)
    # probability matrix and pull back through the reference einsum chain --
    # Pallas kernels have no automatic reverse-mode rule
    q, k, v = res
    _, pullback = jax.vjp(lambda q_, k_, v_:
                          attention_reference(q_, k_, v_, scale), q, k, v)
    return pullback(g)


_attention_vjp.defvjp(_attention_fwd, _attention_bwd)


@partial(jax.jit, static_argnames=("scale", "force"))
def fused_attention(q, k, v, scale: float, force: bool | None = None):
    """(B, N, C) -> (B, N, C); Pallas on TPU for friendly shapes, einsum
    fallback otherwise. Differentiable either way (custom VJP on the Pallas
    path). ``force=True/False`` overrides dispatch (tests)."""
    b, n, c = q.shape
    use = force if force is not None else (
        jax.default_backend() == "tpu" and _pallas_ok(n, c, q.dtype)
    )
    if not use:
        return attention_reference(q, k, v, scale)
    return _attention_vjp(scale, q, k, v)
