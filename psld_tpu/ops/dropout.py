"""Hardware-PRNG dropout that regenerates its mask in the backward pass.

The last measured train-step bottleneck: dropout costs 28% of the
flagship bf16 step (PARITY round-3 §2 — 437 vs 610 img/s at dropout 0).
Two XLA-level levers were refuted on-chip: the hardware-RNG swap (rbg)
was neutral, and ``jax.checkpoint`` mask recomputation was 2% *slower*
because the recompute re-reads the input activation. This op removes the
residual WITHOUT recomputing from the input: the forward seeds the TPU
core-local PRNG from the (folded) dropout key + grid position inside a
Pallas kernel, and the custom-VJP backward re-seeds identically and
regenerates the same mask, so the backward reads only the cotangent.

Per-site HBM traffic: stock ``nn.Dropout`` moves
``fwd(read x, write y, write mask) + bwd(read g, read mask, write dx)``;
this kernel moves ``fwd(read x, write y) + bwd(read g, write dx)``.

Semantics are ``nn.Dropout``'s (inverted scaling by 1/keep; the
reference drops inside every resblock, song_sde/layerspp.py:187/235) but
the bit-stream is the TPU hardware PRNG, not threefry — statistically
equivalent, not bit-identical; ships opt-in (``PSLD_DROPOUT_PALLAS=1``).
Off-TPU the op falls back to a jnp path with the same
regenerate-in-backward structure (used by the CPU tests; the interpret
mode of this JAX has no lowering for the TPU PRNG primitives).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import dtypes
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_TILE = 1024
_LANES = 128


def _threshold(rate: float) -> int:
    """uint32 threshold with P(bits >= threshold) = 1 - rate (to 2^-32)."""
    return min(int(round(rate * 2.0 ** 32)), 2 ** 32 - 1)


def _mask_kernel(seed_ref, x_ref, o_ref, *, threshold: int, scale: float,
                 n_seed: int):
    # Mosaic accepts at most TWO seed words: fold the key words (2 for
    # threefry keys, 4 for rbg) into two and mix the grid position in
    # with a Weyl increment so every block draws a distinct stream.
    s0 = seed_ref[0]
    s1 = seed_ref[1] if n_seed > 1 else jnp.uint32(0x9E3779B9)
    for i in range(2, n_seed):
        if i % 2 == 0:
            s0 = s0 ^ seed_ref[i]
        else:
            s1 = s1 ^ seed_ref[i]
    pid = pl.program_id(0).astype(jnp.uint32)
    pltpu.prng_seed(s0 + pid * jnp.uint32(2654435761), s1)
    bits = pltpu.prng_random_bits(x_ref.shape)
    if bits.dtype != jnp.uint32:
        bits = pltpu.bitcast(bits, jnp.uint32)
    keep = bits >= jnp.uint32(threshold)
    o_ref[:] = jnp.where(keep, x_ref[:] * scale, 0)


def _should_use_pallas(use_pallas):
    if use_pallas is not None:
        return use_pallas
    return jax.default_backend() == "tpu"


def _apply(x, seed, rate, use_pallas):
    """Masked-and-scaled x; identical mask for identical (seed, shape)."""
    if _should_use_pallas(use_pallas) and x.size % _LANES == 0 and x.size:
        flat = x.reshape(-1, _LANES)
        rows = flat.shape[0]
        # i * 0 (not literal 0): under x64 a literal traces as i64, which
        # Mosaic cannot legalize in index maps (CLAUDE.md trap).
        spec = pl.BlockSpec((_ROW_TILE, _LANES), lambda i: (i, i * 0),
                            memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            partial(_mask_kernel, threshold=_threshold(rate),
                    scale=1.0 / (1.0 - rate), n_seed=seed.shape[0]),
            grid=(pl.cdiv(rows, _ROW_TILE),),
            in_specs=[pl.BlockSpec(seed.shape, lambda i: (i * 0,),
                                   memory_space=pltpu.SMEM), spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(flat.shape, x.dtype),
        )(seed, flat)
        return out.reshape(x.shape)
    # jnp fallback: same contract (mask is a pure function of seed+shape,
    # regenerated — not saved — by the backward rule below).
    key = jax.random.wrap_key_data(seed[:2], impl="threefry2x32")
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x * (1.0 / (1.0 - rate)), 0)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def hw_dropout(x: jax.Array, seed: jax.Array, rate: float,
               use_pallas: bool | None = None) -> jax.Array:
    """Dropout(x) with the keep-mask derived from ``seed`` (1-D uint32).

    ``d/dx = mask * 1/(1-rate)`` is computed by re-running the mask
    kernel on the cotangent — no residual is saved except ``seed``.
    """
    return _apply(x, seed, rate, use_pallas)


def _hw_fwd(x, seed, rate, use_pallas):
    return _apply(x, seed, rate, use_pallas), seed


def _hw_bwd(rate, use_pallas, seed, g):
    seed_ct = np.zeros(seed.shape, dtype=dtypes.float0)
    return _apply(g, seed, rate, use_pallas), seed_ct


hw_dropout.defvjp(_hw_fwd, _hw_bwd)
