"""Ops tests: upfirdn2d vs the numpy oracle transcribing the reference's
native fallback (op/upfirdn2d.py:159-200), FIR resampling invariants,
fused bias+LeakyReLU vs jnp."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torch
import torch.nn.functional as F

from psld_tpu.ops import (
    conv_downsample_2d,
    downsample_2d,
    fused_leaky_relu,
    naive_downsample_2d,
    naive_upsample_2d,
    setup_kernel,
    upfirdn2d,
    upsample_2d,
    upsample_conv_2d,
)
from oracles import upfirdn2d_oracle

FIR_K = [1.0, 3.0, 3.0, 1.0]


def rand(shape, seed=0):
    return np.asarray(
        jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
    )


@pytest.mark.parametrize(
    "up,down,pad,ksize",
    [
        (1, 1, (1, 1), 3),
        (1, 1, (2, 1), 4),
        (2, 1, (2, 1), 4),
        (2, 1, (3, 1), 4),
        (1, 2, (1, 1), 4),
        (1, 2, (2, 2), 4),
        (1, 1, (-1, 2), 3),  # negative pad = crop
        (3, 2, (2, 2), 4),
    ],
)
def test_upfirdn2d_matches_oracle(up, down, pad, ksize):
    x = rand((2, 8, 8, 3), seed=up * 10 + down)
    k = np.outer(np.arange(1, ksize + 1), np.arange(ksize, 0, -1)).astype(
        np.float32
    )
    got = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k), up, down, pad))
    want = upfirdn2d_oracle(x, k, up, down, pad)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_upsample_2d_shape_and_gain():
    x = jnp.ones((1, 8, 8, 2))
    y = upsample_2d(x, FIR_K, factor=2)
    assert y.shape == (1, 16, 16, 2)
    # normalized kernel * factor^2 preserves constant signals (interior)
    np.testing.assert_allclose(np.asarray(y)[0, 4:12, 4:12, 0], 1.0, rtol=1e-5)


def test_downsample_2d_shape_and_gain():
    x = jnp.ones((1, 16, 16, 2))
    y = downsample_2d(x, FIR_K, factor=2)
    assert y.shape == (1, 8, 8, 2)
    np.testing.assert_allclose(np.asarray(y)[0, 2:6, 2:6, 0], 1.0, rtol=1e-5)


def test_up_down_roundtrip_identity_on_constants():
    x = jnp.full((1, 8, 8, 1), 3.0)
    y = downsample_2d(upsample_2d(x, FIR_K), FIR_K)
    np.testing.assert_allclose(np.asarray(y)[0, 2:6, 2:6, 0], 3.0, rtol=1e-4)


def test_naive_resampling():
    x = rand((2, 4, 4, 3))
    up = np.asarray(naive_upsample_2d(jnp.asarray(x)))
    assert up.shape == (2, 8, 8, 3)
    np.testing.assert_allclose(up[:, ::2, ::2], x)
    np.testing.assert_allclose(up[:, 1::2, 1::2], x)
    down = np.asarray(naive_downsample_2d(jnp.asarray(up)))
    np.testing.assert_allclose(down, x, rtol=1e-6)


def _torch_upsample_conv(x_nhwc, w_hwio, k):
    """Reference chain (up_or_down_sampling.py:72-141) executed with torch
    as an independent oracle: conv_transpose2d + upfirdn2d_native pads."""
    x = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))
    # HWIO -> torch conv_transpose weight (inC, outC, kh, kw) with the
    # double-flip the reference applies to its (outC, inC, kh, kw) weight
    w_oihw = np.transpose(w_hwio, (3, 2, 0, 1))
    wt = torch.from_numpy(w_oihw[:, :, ::-1, ::-1].copy()).permute(1, 0, 2, 3)
    factor = 2
    y = F.conv_transpose2d(x, wt, stride=factor, padding=0)
    kk = setup_kernel(k) * (factor**2)
    p = (kk.shape[0] - factor) - (w_oihw.shape[2] - 1)
    y_nhwc = np.transpose(y.numpy(), (0, 2, 3, 1))
    out = upfirdn2d_oracle(
        y_nhwc, kk, up=1, down=1, pad=((p + 1) // 2 + factor - 1, p // 2 + 1)
    )
    return out


def test_upsample_conv_2d_matches_torch_reference_chain():
    x = rand((2, 8, 8, 4), seed=3)
    w = rand((3, 3, 4, 5), seed=4)  # HWIO
    got = np.asarray(upsample_conv_2d(jnp.asarray(x), jnp.asarray(w), FIR_K))
    want = _torch_upsample_conv(x, w, FIR_K)
    assert got.shape == want.shape == (2, 16, 16, 5)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_conv_downsample_2d_matches_torch_reference_chain():
    x = rand((2, 16, 16, 4), seed=5)
    w = rand((3, 3, 4, 5), seed=6)
    got = np.asarray(conv_downsample_2d(jnp.asarray(x), jnp.asarray(w), FIR_K))
    # reference: upfirdn pad ((p+1)//2, p//2) then stride-2 VALID conv
    kk = setup_kernel(FIR_K)
    p = (kk.shape[0] - 2) + (3 - 1)
    y = upfirdn2d_oracle(x, kk, pad=((p + 1) // 2, p // 2))
    yt = torch.from_numpy(np.transpose(y, (0, 3, 1, 2)))
    wt = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)).copy())
    want = np.transpose(F.conv2d(yt, wt, stride=2).numpy(), (0, 2, 3, 1))
    assert got.shape == want.shape == (2, 8, 8, 5)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_upfirdn2d_gradients_flow():
    x = jnp.asarray(rand((1, 8, 8, 2)))
    k = jnp.asarray(setup_kernel(FIR_K))

    def loss(x):
        return jnp.sum(upfirdn2d(x, k, up=2, pad=(2, 1)) ** 2)

    g = jax.grad(loss)(x)
    assert g.shape == x.shape
    assert bool(jnp.isfinite(g).all())
    # second-order gradients (the reference hand-writes these,
    # op/upfirdn2d.py:19-142; JAX gets them for free)
    h = jax.grad(lambda x: jnp.sum(jax.grad(loss)(x) ** 2))(x)
    assert bool(jnp.isfinite(h).all())


def test_fused_leaky_relu_matches_jnp():
    x = jnp.asarray(rand((2, 4, 4, 6), seed=7))
    b = jnp.asarray(rand((6,), seed=8))
    got = fused_leaky_relu(x, b, use_pallas=False)
    y = x + b[None, None, None, :]
    want = jnp.where(y >= 0, y, 0.2 * y) * np.sqrt(2.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_fused_leaky_relu_pallas_interpret():
    """Pallas path in interpreter mode (no TPU in CI)."""
    from jax.experimental.pallas import tpu as pltpu

    x = jnp.asarray(rand((2, 4, 4, 8), seed=9))
    b = jnp.asarray(rand((8,), seed=10))
    with pltpu.force_tpu_interpret_mode():
        got = fused_leaky_relu(x, b, use_pallas=True)
    want = fused_leaky_relu(x, b, use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_fused_leaky_relu_grad():
    x = jnp.asarray(rand((2, 3, 3, 4), seed=11))
    b = jnp.asarray(rand((4,), seed=12))

    def loss(x, b):
        return jnp.sum(fused_leaky_relu(x, b, use_pallas=False) ** 2)

    gx, gb = jax.grad(loss, argnums=(0, 1))(x, b)
    # finite-difference check on bias
    e = 1e-3
    for i in range(4):
        db = b.at[i].add(e)
        num = (loss(x, db) - loss(x, b)) / e
        np.testing.assert_allclose(float(gb[i]), float(num), rtol=2e-2)


def test_fused_attention_matches_einsum():
    from psld_tpu.ops.attention import attention_reference, fused_attention
    import jax.numpy as jnp

    q = jnp.asarray(rand((3, 256, 128), seed=20))
    k = jnp.asarray(rand((3, 256, 128), seed=21))
    v = jnp.asarray(rand((3, 256, 128), seed=22))
    scale = 128**-0.5
    want = np.asarray(attention_reference(q, k, v, scale))
    got = np.asarray(fused_attention(q, k, v, scale, force=False))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # Pallas path in interpreter mode
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        got_p = np.asarray(fused_attention(q, k, v, scale, force=True))
    np.testing.assert_allclose(got_p, want, rtol=1e-4, atol=1e-4)


def test_fused_attention_grad_matches_einsum_grad():
    from psld_tpu.ops.attention import attention_reference, fused_attention
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    q = jnp.asarray(rand((2, 64, 128), seed=30))
    k = jnp.asarray(rand((2, 64, 128), seed=31))
    v = jnp.asarray(rand((2, 64, 128), seed=32))
    scale = 128**-0.5

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v, scale) ** 2)

    def loss_pal(q, k, v):
        return jnp.sum(fused_attention(q, k, v, scale, force=True) ** 2)

    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_pal, argnums=(0, 1, 2))(q, k, v)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-4, atol=1e-4)


def test_fused_attention_lane_padded_channels(monkeypatch):
    """C % 128 != 0 (the AFHQ family's nf=160) lane-pads exactly, value and
    grad — but the padded path is OPT-IN (PSLD_PAD_ATTN=1): on-chip it
    measured slower than the einsum fallback (PARITY round-3 §2), so the
    default dispatch declines odd widths."""
    from psld_tpu.ops.attention import (_pallas_ok, attention_reference,
                                        fused_attention)
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    assert not _pallas_ok(256, 160, jnp.float32)
    monkeypatch.setenv("PSLD_PAD_ATTN", "1")
    assert _pallas_ok(256, 160, jnp.float32)
    q = jnp.asarray(rand((2, 256, 160), seed=40))
    k = jnp.asarray(rand((2, 256, 160), seed=41))
    v = jnp.asarray(rand((2, 256, 160), seed=42))
    scale = 160**-0.5
    want = np.asarray(attention_reference(q, k, v, scale))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_attention(q, k, v, scale, force=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def loss_pal(q, k, v):
        return jnp.sum(fused_attention(q, k, v, scale, force=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v, scale) ** 2)

    want_g = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got_g = jax.grad(loss_pal, argnums=(0, 1, 2))(q, k, v)
    for g, w in zip(got_g, want_g):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-4, atol=1e-4)


def test_fused_group_norm_matches_flax():
    import flax.linen as nn
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from psld_tpu.ops.group_norm import (
        fused_group_norm_act,
        group_norm_act_reference,
    )

    x = jnp.asarray(rand((2, 8, 8, 256), seed=40))
    scale = jnp.asarray(rand((256,), seed=41)) + 1.0
    bias = jnp.asarray(rand((256,), seed=42))
    g = min(256 // 4, 32)

    gn = nn.GroupNorm(num_groups=g, epsilon=1e-6)
    params = {"params": {"scale": scale, "bias": bias}}
    want = np.asarray(jax.nn.silu(gn.apply(params, x)))

    ref = np.asarray(group_norm_act_reference(x, scale, bias, g, 1e-6,
                                              "swish"))
    np.testing.assert_allclose(ref, want, rtol=1e-5, atol=1e-5)

    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_group_norm_act(x, scale, bias, g, 1e-6,
                                              "swish", force=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fused_group_norm_grad():
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from psld_tpu.ops.group_norm import (
        fused_group_norm_act,
        group_norm_act_reference,
    )

    x = jnp.asarray(rand((2, 4, 4, 128), seed=43))
    scale = jnp.asarray(rand((128,), seed=44)) + 1.0
    bias = jnp.asarray(rand((128,), seed=45))
    g = 32

    def loss_ref(x, s, b):
        return jnp.sum(group_norm_act_reference(x, s, b, g, 1e-6, "swish") ** 2)

    def loss_pal(x, s, b):
        return jnp.sum(fused_group_norm_act(x, s, b, g, 1e-6, "swish",
                                            force=True) ** 2)

    want = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_pal, argnums=(0, 1, 2))(x, scale, bias)
    for gg, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(w),
                                   rtol=1e-4, atol=1e-4)


def test_fused_group_norm_unfriendly_shape_falls_back():
    import jax.numpy as jnp

    from psld_tpu.ops.group_norm import fused_group_norm_act

    # C=96 not a lane multiple -> jnp fallback must engage
    x = jnp.asarray(rand((2, 4, 4, 96), seed=46))
    out = fused_group_norm_act(x, jnp.ones((96,)), jnp.zeros((96,)),
                               min(96 // 4, 32), 1e-6, "elu")
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_fused_attention_unfriendly_shape_falls_back():
    from psld_tpu.ops.attention import fused_attention
    import jax.numpy as jnp

    # C=96 not a lane multiple -> einsum fallback must engage
    q = jnp.asarray(rand((2, 64, 96), seed=23))
    out = fused_attention(q, q, q, 96**-0.5)
    assert out.shape == (2, 64, 96)
    assert np.isfinite(np.asarray(out)).all()


def test_group_norm_gn_bf16_knob(monkeypatch):
    """PSLD_GN_BF16 (the 256px bandwidth lever): f32 inputs must be
    BIT-unchanged with the knob on; bf16 inputs with the knob on must stay
    within bf16 resolution of the f32-chain result (moment sums stay f32
    either way)."""
    import jax
    import jax.numpy as jnp

    from psld_tpu.ops.group_norm import group_norm_act_reference

    key = jax.random.PRNGKey(0)
    x32 = jax.random.normal(key, (2, 8, 8, 64), jnp.float32) * 3.0 + 1.0
    scale = jnp.linspace(0.5, 1.5, 64, dtype=jnp.float32)
    bias = jnp.linspace(-0.2, 0.2, 64, dtype=jnp.float32)

    monkeypatch.delenv("PSLD_GN_BF16", raising=False)
    ref32 = np.asarray(group_norm_act_reference(x32, scale, bias, 16,
                                                1e-6, "swish"))
    ref16 = np.asarray(group_norm_act_reference(
        x32.astype(jnp.bfloat16), scale, bias, 16, 1e-6, "swish")
        .astype(jnp.float32))
    monkeypatch.setenv("PSLD_GN_BF16", "1")
    on32 = np.asarray(group_norm_act_reference(x32, scale, bias, 16,
                                               1e-6, "swish"))
    on16 = np.asarray(group_norm_act_reference(
        x32.astype(jnp.bfloat16), scale, bias, 16, 1e-6, "swish")
        .astype(jnp.float32))

    np.testing.assert_array_equal(on32, ref32)  # f32: knob is a no-op
    # bf16 chain vs f32 chain on the same bf16 input: bf16-resolution close
    np.testing.assert_allclose(on16, ref16, atol=0.05, rtol=0.05)
    assert np.abs(on16 - ref16).mean() < 0.01
