"""InceptionV3 (FID variant) feature extractor in pure JAX, NHWC.

Implements the pool3-feature graph used by pytorch-fid / torch-fidelity
(the TF-ported ``pt_inception-2015-12-05`` network): torchvision InceptionV3
wiring with the FID modifications -- average pools with
``count_include_pad=False``, and a max-pool pool-branch in the final
InceptionE block (Mixed_7c).

Weights load from the standard ``pt_inception-2015-12-05-*.pth`` torch
checkpoint (no download here: TPU hosts are egress-restricted; supply the
file). BatchNorm (eps=1e-3) is folded into each conv's scale/shift at load
time, so inference is conv+bias+relu only -- MXU-friendly. Random-init mode
exists for tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

FID_DIM = 2048
N_LOGITS = 1008  # TF-ported head: 1000 classes + 8 legacy background units


# ---------------------------------------------------------------------------
# Graph spec: every conv is (name, in_ch, out_ch, (kh, kw), stride, padding).
# Names follow the torch state_dict so weight porting is mechanical.
# ---------------------------------------------------------------------------

def _stem_spec():
    return [
        ("Conv2d_1a_3x3", 3, 32, (3, 3), 2, (0, 0)),
        ("Conv2d_2a_3x3", 32, 32, (3, 3), 1, (0, 0)),
        ("Conv2d_2b_3x3", 32, 64, (3, 3), 1, (1, 1)),
        ("maxpool", None, None, None, None, None),
        ("Conv2d_3b_1x1", 64, 80, (1, 1), 1, (0, 0)),
        ("Conv2d_4a_3x3", 80, 192, (3, 3), 1, (0, 0)),
        ("maxpool", None, None, None, None, None),
    ]


def _a_spec(prefix, in_ch, pool_features):
    return {
        f"{prefix}.branch1x1": (in_ch, 64, (1, 1), 1, (0, 0)),
        f"{prefix}.branch5x5_1": (in_ch, 48, (1, 1), 1, (0, 0)),
        f"{prefix}.branch5x5_2": (48, 64, (5, 5), 1, (2, 2)),
        f"{prefix}.branch3x3dbl_1": (in_ch, 64, (1, 1), 1, (0, 0)),
        f"{prefix}.branch3x3dbl_2": (64, 96, (3, 3), 1, (1, 1)),
        f"{prefix}.branch3x3dbl_3": (96, 96, (3, 3), 1, (1, 1)),
        f"{prefix}.branch_pool": (in_ch, pool_features, (1, 1), 1, (0, 0)),
    }


def _b_spec(prefix, in_ch):
    return {
        f"{prefix}.branch3x3": (in_ch, 384, (3, 3), 2, (0, 0)),
        f"{prefix}.branch3x3dbl_1": (in_ch, 64, (1, 1), 1, (0, 0)),
        f"{prefix}.branch3x3dbl_2": (64, 96, (3, 3), 1, (1, 1)),
        f"{prefix}.branch3x3dbl_3": (96, 96, (3, 3), 2, (0, 0)),
    }


def _c_spec(prefix, in_ch, c7):
    return {
        f"{prefix}.branch1x1": (in_ch, 192, (1, 1), 1, (0, 0)),
        f"{prefix}.branch7x7_1": (in_ch, c7, (1, 1), 1, (0, 0)),
        f"{prefix}.branch7x7_2": (c7, c7, (1, 7), 1, (0, 3)),
        f"{prefix}.branch7x7_3": (c7, 192, (7, 1), 1, (3, 0)),
        f"{prefix}.branch7x7dbl_1": (in_ch, c7, (1, 1), 1, (0, 0)),
        f"{prefix}.branch7x7dbl_2": (c7, c7, (7, 1), 1, (3, 0)),
        f"{prefix}.branch7x7dbl_3": (c7, c7, (1, 7), 1, (0, 3)),
        f"{prefix}.branch7x7dbl_4": (c7, c7, (7, 1), 1, (3, 0)),
        f"{prefix}.branch7x7dbl_5": (c7, 192, (1, 7), 1, (0, 3)),
        f"{prefix}.branch_pool": (in_ch, 192, (1, 1), 1, (0, 0)),
    }


def _d_spec(prefix, in_ch):
    return {
        f"{prefix}.branch3x3_1": (in_ch, 192, (1, 1), 1, (0, 0)),
        f"{prefix}.branch3x3_2": (192, 320, (3, 3), 2, (0, 0)),
        f"{prefix}.branch7x7x3_1": (in_ch, 192, (1, 1), 1, (0, 0)),
        f"{prefix}.branch7x7x3_2": (192, 192, (1, 7), 1, (0, 3)),
        f"{prefix}.branch7x7x3_3": (192, 192, (7, 1), 1, (3, 0)),
        f"{prefix}.branch7x7x3_4": (192, 192, (3, 3), 2, (0, 0)),
    }


def _e_spec(prefix, in_ch):
    return {
        f"{prefix}.branch1x1": (in_ch, 320, (1, 1), 1, (0, 0)),
        f"{prefix}.branch3x3_1": (in_ch, 384, (1, 1), 1, (0, 0)),
        f"{prefix}.branch3x3_2a": (384, 384, (1, 3), 1, (0, 1)),
        f"{prefix}.branch3x3_2b": (384, 384, (3, 1), 1, (1, 0)),
        f"{prefix}.branch3x3dbl_1": (in_ch, 448, (1, 1), 1, (0, 0)),
        f"{prefix}.branch3x3dbl_2": (448, 384, (3, 3), 1, (1, 1)),
        f"{prefix}.branch3x3dbl_3a": (384, 384, (1, 3), 1, (0, 1)),
        f"{prefix}.branch3x3dbl_3b": (384, 384, (3, 1), 1, (1, 0)),
        f"{prefix}.branch_pool": (in_ch, 192, (1, 1), 1, (0, 0)),
    }


def all_conv_specs() -> dict:
    specs = {}
    for name, i, o, k, s, p in _stem_spec():
        if name != "maxpool":
            specs[name] = (i, o, k, s, p)
    specs.update(_a_spec("Mixed_5b", 192, 32))
    specs.update(_a_spec("Mixed_5c", 256, 64))
    specs.update(_a_spec("Mixed_5d", 288, 64))
    specs.update(_b_spec("Mixed_6a", 288))
    for name, c7 in (("Mixed_6b", 128), ("Mixed_6c", 160), ("Mixed_6d", 160),
                     ("Mixed_6e", 192)):
        specs.update(_c_spec(name, 768, c7))
    specs.update(_d_spec("Mixed_7a", 768))
    specs.update(_e_spec("Mixed_7b", 1280))
    specs.update(_e_spec("Mixed_7c", 2048))
    return specs


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------

def random_params(key, with_fc: bool = False) -> dict:
    """Random folded-conv params (tests / smoke only)."""
    params = {}
    for name, (i, o, (kh, kw), _, _) in all_conv_specs().items():
        key, k1 = jax.random.split(key)
        scale = float(1.0 / np.sqrt(i * kh * kw))
        params[name] = {
            "w": jax.random.normal(k1, (kh, kw, i, o), jnp.float32) * scale,
            "b": jnp.zeros((o,), jnp.float32),
        }
    if with_fc:
        key, k1 = jax.random.split(key)
        params["fc"] = {
            "w": jax.random.normal(k1, (FID_DIM, N_LOGITS), jnp.float32)
            * float(1.0 / np.sqrt(FID_DIM)),
            "b": jnp.zeros((N_LOGITS,), jnp.float32),
        }
    return params


def load_torch_checkpoint(path: str) -> dict:
    """Load pt_inception-2015-12-05-*.pth and fold BN into conv scale/shift.

    torch layout per conv block: `<name>.conv.weight` (O,I,KH,KW) and
    `<name>.bn.{weight,bias,running_mean,running_var}`; BN eps = 1e-3.
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    params = {}
    for name, (i, o, (kh, kw), _, _) in all_conv_specs().items():
        w = sd[f"{name}.conv.weight"].numpy()
        gamma = sd[f"{name}.bn.weight"].numpy()
        beta = sd[f"{name}.bn.bias"].numpy()
        mean = sd[f"{name}.bn.running_mean"].numpy()
        var = sd[f"{name}.bn.running_var"].numpy()
        assert w.shape == (o, i, kh, kw), (name, w.shape)
        inv_std = gamma / np.sqrt(var + 1e-3)
        w_folded = w * inv_std[:, None, None, None]
        b_folded = beta - mean * inv_std
        params[name] = {
            "w": jnp.asarray(w_folded.transpose(2, 3, 1, 0)),  # OIHW -> HWIO
            "b": jnp.asarray(b_folded),
        }
    if "fc.weight" in sd:  # 1008-way logits head (needed for ISC only)
        fw = sd["fc.weight"].numpy()  # [1008, 2048]
        fb = sd["fc.bias"].numpy()
        assert fw.shape == (N_LOGITS, FID_DIM), fw.shape
        params["fc"] = {"w": jnp.asarray(fw.T), "b": jnp.asarray(fb)}
    return params


# ---------------------------------------------------------------------------
# Forward graph
# ---------------------------------------------------------------------------

_DN = ("NHWC", "HWIO", "NHWC")


def _conv(params, name, x, stride=1, padding=(0, 0)):
    p = params[name]
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride),
        ((padding[0], padding[0]), (padding[1], padding[1])),
        dimension_numbers=_DN,
    )
    return jax.nn.relu(y + p["b"])


def _run(params, specs, name, x):
    i, o, k, s, p = specs[name]
    return _conv(params, name, x, stride=s, padding=p)


def _maxpool(x, k=3, s=2, pad=0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )


def _avgpool_nocountpad(x, k=3, s=1, pad=1):
    """Average pool with count_include_pad=False (the FID modification)."""
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, s, s, 1),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, k, k, 1), (1, s, s, 1),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )
    return summed / counts


def _block_a(params, specs, prefix, x):
    b1 = _run(params, specs, f"{prefix}.branch1x1", x)
    b5 = _run(params, specs, f"{prefix}.branch5x5_2",
              _run(params, specs, f"{prefix}.branch5x5_1", x))
    b3 = _run(params, specs, f"{prefix}.branch3x3dbl_3",
              _run(params, specs, f"{prefix}.branch3x3dbl_2",
                   _run(params, specs, f"{prefix}.branch3x3dbl_1", x)))
    bp = _run(params, specs, f"{prefix}.branch_pool",
              _avgpool_nocountpad(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _block_b(params, specs, prefix, x):
    b3 = _run(params, specs, f"{prefix}.branch3x3", x)
    bd = _run(params, specs, f"{prefix}.branch3x3dbl_3",
              _run(params, specs, f"{prefix}.branch3x3dbl_2",
                   _run(params, specs, f"{prefix}.branch3x3dbl_1", x)))
    bp = _maxpool(x)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _block_c(params, specs, prefix, x):
    b1 = _run(params, specs, f"{prefix}.branch1x1", x)
    b7 = x
    for suffix in ("_1", "_2", "_3"):
        b7 = _run(params, specs, f"{prefix}.branch7x7{suffix}", b7)
    bd = x
    for suffix in ("_1", "_2", "_3", "_4", "_5"):
        bd = _run(params, specs, f"{prefix}.branch7x7dbl{suffix}", bd)
    bp = _run(params, specs, f"{prefix}.branch_pool",
              _avgpool_nocountpad(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _block_d(params, specs, prefix, x):
    b3 = _run(params, specs, f"{prefix}.branch3x3_2",
              _run(params, specs, f"{prefix}.branch3x3_1", x))
    b7 = x
    for suffix in ("_1", "_2", "_3", "_4"):
        b7 = _run(params, specs, f"{prefix}.branch7x7x3{suffix}", b7)
    bp = _maxpool(x)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _block_e(params, specs, prefix, x, pool: str):
    b1 = _run(params, specs, f"{prefix}.branch1x1", x)
    b3 = _run(params, specs, f"{prefix}.branch3x3_1", x)
    b3 = jnp.concatenate([
        _run(params, specs, f"{prefix}.branch3x3_2a", b3),
        _run(params, specs, f"{prefix}.branch3x3_2b", b3),
    ], axis=-1)
    bd = _run(params, specs, f"{prefix}.branch3x3dbl_2",
              _run(params, specs, f"{prefix}.branch3x3dbl_1", x))
    bd = jnp.concatenate([
        _run(params, specs, f"{prefix}.branch3x3dbl_3a", bd),
        _run(params, specs, f"{prefix}.branch3x3dbl_3b", bd),
    ], axis=-1)
    if pool == "avg":
        bp = _avgpool_nocountpad(x)
    else:  # Mixed_7c FID variant uses max pooling here
        bp = _maxpool(x, k=3, s=1, pad=1)
    bp = _run(params, specs, f"{prefix}.branch_pool", bp)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def extract_features(params: dict, images: jax.Array,
                     resize: bool = True) -> jax.Array:
    """images: NHWC float in [0, 1]; returns [N, 2048] pool3 features.

    Preprocessing matches pytorch-fid: bilinear resize to 299x299
    (half-pixel centers, no antialias), then x -> 2x - 1.
    """
    specs = all_conv_specs()
    x = images.astype(jnp.float32)
    if resize and x.shape[1:3] != (299, 299):
        b, _, _, c = x.shape
        x = jax.image.resize(x, (b, 299, 299, c), method="bilinear",
                             antialias=False)
    x = 2.0 * x - 1.0

    x = _conv(params, "Conv2d_1a_3x3", x, stride=2)
    x = _conv(params, "Conv2d_2a_3x3", x)
    x = _conv(params, "Conv2d_2b_3x3", x, padding=(1, 1))
    x = _maxpool(x)
    x = _conv(params, "Conv2d_3b_1x1", x)
    x = _conv(params, "Conv2d_4a_3x3", x)
    x = _maxpool(x)

    x = _block_a(params, specs, "Mixed_5b", x)
    x = _block_a(params, specs, "Mixed_5c", x)
    x = _block_a(params, specs, "Mixed_5d", x)
    x = _block_b(params, specs, "Mixed_6a", x)
    x = _block_c(params, specs, "Mixed_6b", x)
    x = _block_c(params, specs, "Mixed_6c", x)
    x = _block_c(params, specs, "Mixed_6d", x)
    x = _block_c(params, specs, "Mixed_6e", x)
    x = _block_d(params, specs, "Mixed_7a", x)
    x = _block_e(params, specs, "Mixed_7b", x, pool="avg")
    x = _block_e(params, specs, "Mixed_7c", x, pool="max")

    return x.mean(axis=(1, 2))  # adaptive avg pool -> [N, 2048]


def logits_from_features(params: dict, feats: jax.Array,
                         unbiased: bool = True) -> jax.Array:
    """[N, 2048] pool3 features -> [N, 1008] classifier logits (for ISC).

    torch-fidelity derives the Inception Score from ``logits_unbiased``
    (its default ``feature_layer_isc``): the fc matmul over the same pool3
    features FID uses, WITHOUT fc.bias. ``unbiased=True`` (default)
    reproduces that; ``unbiased=False`` adds the bias (the checkpoint's
    actual classifier head). The weights ride in the same
    ``pt_inception-2015-12-05`` checkpoint (keys fc.weight/fc.bias).
    """
    if "fc" not in params:
        raise ValueError(
            "checkpoint has no fc head (fc.weight/fc.bias) — the Inception "
            "Score needs the full pt_inception-2015-12-05 state_dict")
    logits = feats @ params["fc"]["w"]
    return logits if unbiased else logits + params["fc"]["b"]


def make_feature_fn(params: dict):
    return jax.jit(partial(extract_features, params))


def make_feature_logits_fn(params: dict):
    """jitted images -> (pool3 features [N,2048], logits [N,1008])."""

    def fn(images):
        feats = extract_features(params, images)
        return feats, logits_from_features(params, feats)

    return jax.jit(fn)
