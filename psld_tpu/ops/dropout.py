"""Counter-hash dropout that regenerates its mask in the backward pass.

The last measured train-step bottleneck: dropout costs 28% of the
flagship bf16 step (PARITY round-3 §2 — 437 vs 610 img/s at dropout 0).
Two XLA-level levers were refuted on-chip: the hardware-RNG swap (rbg)
was neutral, and ``jax.checkpoint`` mask recomputation was 2% *slower*
because the recompute re-reads the input activation. This op removes the
residual WITHOUT recomputing from the input: the keep-mask is a pure
counter-based hash of (seed, global element position), so the forward
computes it on the fly inside a Pallas kernel and the custom-VJP
backward recomputes the identical mask from only (seed, cotangent) —
no mask or activation residual ever reaches HBM.

Per-site HBM traffic: stock ``nn.Dropout`` moves
``fwd(read x, write y, write mask) + bwd(read g, read mask, write dx)``;
this kernel moves ``fwd(read x, write y) + bwd(read g, write dx)``.

Mask bits: two rounds of the murmur3 finalizer over the 128-lane row and
lane counters keyed by the (folded) dropout key — statistically a
Bernoulli stream (tested), NOT the threefry stream ``nn.Dropout`` draws,
so checkpoints/recipes switching impls see a different (equivalent)
regularization noise. The hash is implemented identically in the Pallas
kernel and the jnp fallback, so CPU tests pin the exact TPU mask bits.

SPMD: the op carries a ``custom_partitioning`` rule. The mask depends on
an element's GLOBAL flat position, so the per-shard lowering adds the
shard's flat offset (derived from the batch-dim ``axis_index``) and any
sharding is forced to batch-dim-only (the partitioner reshards around
the op; inner-dim shards — e.g. spatial activation parallelism — pay a
gather/scatter at each dropout site, batch/FSDP layouts pay nothing).
Result: the mask is bit-identical across ANY mesh layout, which also
guarantees the forward and backward passes agree on the mask no matter
how GSPMD shards the cotangent.

Reference parity note: the reference drops inside every resblock
(song_sde/layerspp.py:187/235) with torch's save-the-mask dropout; this
op is the TPU-native equivalent with inverted 1/keep scaling. Enable per
model via ``model.score_fn.dropout_impl=hw`` (env override
``PSLD_DROPOUT_PALLAS=1``).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import dtypes
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import (SdyShardingRule,
                                                  custom_partitioning)
from jax.sharding import NamedSharding, PartitionSpec as P

_ROW_TILE = 1024
_LANES = 128
_R_MUL = 0x9E3779B1  # odd Weyl constants decorrelating the two counters
_L_MUL = 0x27D4EB2F


def _threshold(rate: float) -> int:
    """uint32 threshold with P(bits >= threshold) = 1 - rate (to 2^-32)."""
    return min(int(round(rate * 2.0 ** 32)), 2 ** 32 - 1)


def _fold_seed(seed):
    """Fold an n-word uint32 key (2 threefry / 4 rbg words) into two words;
    extra words xor in alternately so distinct keys stay distinct."""
    n = seed.shape[0]
    s0 = seed[0]
    s1 = seed[1] if n > 1 else jnp.uint32(0x9E3779B9)
    for i in range(2, n):
        if i % 2 == 0:
            s0 = s0 ^ seed[i]
        else:
            s1 = s1 ^ seed[i]
    return s0, s1


def _fmix32(h):
    """murmur3 32-bit finalizer (a full-period mixing permutation)."""
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    return h ^ (h >> 16)


def _hash_bits(s0, s1, r, l):
    """uint32 stream for global (row, lane) counters under key (s0, s1)."""
    h = _fmix32(s0 ^ (r * jnp.uint32(_R_MUL)))
    return _fmix32(h ^ s1 ^ (l * jnp.uint32(_L_MUL)))


def _mask_kernel(seed_ref, off_ref, x_ref, o_ref, *, threshold: int,
                 scale: float):
    s0, s1 = _fold_seed(seed_ref)
    rows, lanes = x_ref.shape
    pid = pl.program_id(0).astype(jnp.uint32)
    r0 = off_ref[0] + pid * jnp.uint32(rows)
    r = r0 + jax.lax.broadcasted_iota(jnp.uint32, (rows, lanes), 0)
    l = jax.lax.broadcasted_iota(jnp.uint32, (rows, lanes), 1)
    keep = _hash_bits(s0, s1, r, l) >= jnp.uint32(threshold)
    o_ref[:] = jnp.where(keep, x_ref[:] * scale, 0)


def _should_use_pallas(use_pallas):
    if use_pallas is not None:
        return use_pallas
    return jax.default_backend() == "tpu"


def _mask_apply(x, seed, elem_off, threshold: int, scale: float,
                use_pallas, off_row_aligned: bool):
    """Masked-and-scaled x for a block whose first element sits at GLOBAL
    flat position ``elem_off``; same bits from the kernel and jnp paths."""
    if (_should_use_pallas(use_pallas) and x.size % _LANES == 0 and x.size
            and off_row_aligned):
        flat = x.reshape(-1, _LANES)
        rows = flat.shape[0]
        # i * 0 (not literal 0): under x64 a literal traces as i64, which
        # Mosaic cannot legalize in index maps (CLAUDE.md trap).
        spec = pl.BlockSpec((_ROW_TILE, _LANES), lambda i: (i, i * 0),
                            memory_space=pltpu.VMEM)
        row_off = (elem_off >> jnp.uint32(7)).reshape(1)
        out = pl.pallas_call(
            partial(_mask_kernel, threshold=threshold, scale=scale),
            grid=(pl.cdiv(rows, _ROW_TILE),),
            in_specs=[pl.BlockSpec(seed.shape, lambda i: (i * 0,),
                                   memory_space=pltpu.SMEM),
                      pl.BlockSpec((1,), lambda i: (i * 0,),
                                   memory_space=pltpu.SMEM), spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(flat.shape, x.dtype),
        )(seed, row_off, flat)
        return out.reshape(x.shape)
    # jnp path: identical bits for any shape/offset (used off-TPU, for
    # non-lane-multiple sizes, and for shards at non-row-aligned offsets)
    s0, s1 = _fold_seed(seed)
    idx = elem_off + jnp.arange(x.size, dtype=jnp.uint32).reshape(x.shape)
    keep = _hash_bits(s0, s1, idx >> jnp.uint32(7),
                      idx & jnp.uint32(_LANES - 1)) >= jnp.uint32(threshold)
    return jnp.where(keep, x * scale, 0)


def _batch_only(mesh, sharding, ndim):
    """The layout this op computes under: batch-dim sharding kept, inner
    dims replicated (the partitioner reshards operands/results to match)."""
    try:
        spec = sharding.spec
    except AttributeError:  # non-named shardings: replicate
        return NamedSharding(mesh, P(*([None] * ndim)))
    dim0 = spec[0] if len(spec) else None
    return NamedSharding(mesh, P(*([dim0] + [None] * (ndim - 1))))


@lru_cache(maxsize=None)
def _masked_op(threshold: int, scale: float, use_pallas):
    """custom_partitioning-wrapped masked-scale for one (rate, impl) pair.

    The per-shard lowering adds the shard's global flat offset so the mask
    is bit-identical across mesh layouts — including between a forward x
    and a backward cotangent that GSPMD sharded differently."""

    @custom_partitioning
    def op(x, seed):
        return _mask_apply(x, seed, jnp.uint32(0), threshold, scale,
                           use_pallas, True)

    def _rule(mesh, arg_shapes, result_shape):
        dims = tuple(f"d{i}" for i in range(len(arg_shapes[0].shape)))
        return SdyShardingRule((dims, ("s",)), (dims,))

    def _infer(mesh, arg_shapes, shape):
        return _batch_only(mesh, arg_shapes[0].sharding, len(shape.shape))

    def _partition(mesh, arg_shapes, result_shape):
        gshape = arg_shapes[0].shape
        out_sharding = _batch_only(mesh, result_shape.sharding, len(gshape))
        spec0 = out_sharding.spec[0]
        stride0 = int(np.prod(gshape[1:], dtype=np.int64)) if len(gshape) \
            else 1
        axes = (() if spec0 is None else
                (spec0 if isinstance(spec0, tuple) else (spec0,)))
        nshards = int(np.prod([mesh.shape[a] for a in axes], dtype=np.int64)
                      ) if axes else 1
        shard_elems = (gshape[0] // nshards) * stride0 if gshape else 0
        aligned = shard_elems % _LANES == 0

        def lower_fn(x, seed):
            lin = jnp.uint32(0)
            for a in axes:
                lin = lin * jnp.uint32(mesh.shape[a]) + \
                    jax.lax.axis_index(a).astype(jnp.uint32)
            off = lin * jnp.uint32(shard_elems)
            return _mask_apply(x, seed, off, threshold, scale, use_pallas,
                               aligned)

        arg_shardings = (out_sharding, NamedSharding(mesh, P()))
        return mesh, lower_fn, out_sharding, arg_shardings

    op.def_partition(partition=_partition,
                     infer_sharding_from_operands=_infer,
                     sharding_rule=_rule)
    return op


def _apply(x, seed, rate, use_pallas):
    return _masked_op(_threshold(rate), 1.0 / (1.0 - rate), use_pallas)(
        x, seed)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def hw_dropout(x: jax.Array, seed: jax.Array, rate: float,
               use_pallas: bool | None = None) -> jax.Array:
    """Dropout(x) with the keep-mask derived from ``seed`` (1-D uint32).

    ``d/dx = mask * 1/(1-rate)`` is computed by re-running the mask
    kernel on the cotangent — no residual is saved except ``seed``.
    """
    if not 0.0 <= rate < 1.0:
        if rate == 1.0:
            return jnp.zeros_like(x)
        raise ValueError(f"dropout rate must be in [0, 1]; got {rate}")
    if rate == 0.0:
        return x
    return _apply(x, seed, rate, use_pallas)


def _hw_fwd(x, seed, rate, use_pallas):
    return hw_dropout(x, seed, rate, use_pallas), seed


def _hw_bwd(rate, use_pallas, seed, g):
    seed_ct = np.zeros(seed.shape, dtype=dtypes.float0)
    if rate >= 1.0:
        return jnp.zeros_like(g), seed_ct
    if rate == 0.0:
        return g, seed_ct
    return _apply(g, seed, rate, use_pallas), seed_ct


hw_dropout.defvjp(_hw_fwd, _hw_bwd)
