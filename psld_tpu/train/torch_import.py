"""Import mandt-lab/PSLD (PyTorch Lightning) checkpoints into psld-tpu.

The reference publishes pretrained Lightning checkpoints (README.md:138-140)
whose NCSN++ lives in a flat ``all_modules`` ModuleList walked with a cursor
(reference ncsnpp.py:168-284, ncsnpp_clf.py:100-196); the Lightning wrapper
stores it under ``score_fn.`` with the EMA copy under ``ema_score_fn.``
(wrapper.py:31), classifiers under ``clf_fn.`` (clf_wrapper.py).

This module replays BOTH construction orders -- the reference's
``all_modules`` append order and our flax auto-naming order (one per-class
counter per compact scope) -- to map ``all_modules.{i}`` onto the flax
top-level module names, then converts each parameter by layer type:

* Conv2d  weight (O, I, kh, kw)  -> Conv/FIRConv2d kernel (kh, kw, I, O)
* Linear  weight (O, I)          -> Dense kernel (I, O)
* GroupNorm weight/bias          -> GroupNormAct scale/bias
* NIN W (in, out) / b            -> NIN/Dense_0 kernel/bias (same layout)
* GaussianFourierProjection W    -> W
* classifier head Linear (n_cls, C*H*W) -> (H*W*C, n_cls) with the
  NCHW -> NHWC flatten permutation (torch flattens channel-major,
  ncsnpp_clf.py:279; we flatten NHWC)
"""

from __future__ import annotations

import logging
from collections import defaultdict

import numpy as np

logger = logging.getLogger(__name__)


def _namer():
    counts: dict[str, int] = {}

    def new(cls: str) -> str:
        n = counts.get(cls, 0)
        counts[cls] = n + 1
        return f"{cls}_{n}"

    return new


def _common_walk(kw, new, names):
    """Embedding + encoder trunk, shared by the score net and the classifier
    (reference ncsnpp.py:80-208 / ncsnpp_clf.py:78-190). Appends the flax
    name for each reference ``all_modules`` entry to ``names``; paramless
    flax modules bump their class counter without consuming an entry."""
    resblock = ("ResnetBlockDDPM" if kw["resblock_type"] == "ddpm"
                else "ResnetBlockBigGAN")
    num_res = len(kw["ch_mult"])
    all_res = [kw["image_size"] // (2 ** i) for i in range(num_res)]
    attn_res = set(kw["attn_resolutions"])

    if kw["embedding_type"] == "fourier":
        names.append(new("GaussianFourierProjection"))
    if kw["noise_cond"]:
        names.append(new("Dense"))
        names.append(new("Dense"))
    names.append(new("Conv"))  # input conv3x3

    for i_level in range(num_res):
        for _ in range(kw["num_res_blocks"]):
            names.append(new(resblock))
            if all_res[i_level] in attn_res:
                names.append(new("AttnBlock"))
        if i_level != num_res - 1:
            if kw["resblock_type"] == "ddpm":
                names.append(new("Downsample"))
            else:
                names.append(new(resblock))
            if kw["progressive_input"] == "input_skip":
                new("Downsample")  # paramless pyramid downsample
                names.append(new("Combine"))
            elif kw["progressive_input"] == "residual":
                names.append(new("Downsample"))

    names.append(new(resblock))  # middle
    names.append(new("AttnBlock"))
    names.append(new(resblock))
    return resblock, num_res, all_res, attn_res


def score_module_walk(kw) -> list[str]:
    """flax top-level module name per ``all_modules`` index for NCSNpp
    (reference ncsnpp.py:168-284; psld_tpu/models/ncsnpp.py call order)."""
    new = _namer()
    names: list[str] = []
    resblock, num_res, all_res, attn_res = _common_walk(kw, new, names)

    for i_level in reversed(range(num_res)):
        for _ in range(kw["num_res_blocks"] + 1):
            names.append(new(resblock))
        if all_res[i_level] in attn_res:
            names.append(new("AttnBlock"))
        if kw["progressive"] != "none":
            if i_level == num_res - 1:
                names.append(new("GroupNormAct"))
                names.append(new("Conv"))
            elif kw["progressive"] == "output_skip":
                new("Upsample")  # paramless pyramid upsample
                names.append(new("GroupNormAct"))
                names.append(new("Conv"))
            else:  # residual
                names.append(new("Upsample"))
        if i_level != 0:
            if kw["resblock_type"] == "ddpm":
                names.append(new("Upsample"))
            else:
                names.append(new(resblock))

    if kw["progressive"] != "output_skip":
        names.append(new("GroupNormAct"))
        names.append(new("Conv"))
    return names


def clf_module_walk(kw) -> list[str]:
    """Same for NCSNppClassifier: encoder trunk + bias-free flatten head
    (reference ncsnpp_clf.py:78-196)."""
    new = _namer()
    names: list[str] = []
    _common_walk(kw, new, names)
    names.append(new("Dense"))  # flatten head (special-cased in conversion)
    return names


def _conv_kernel(arr):
    return np.transpose(arr, (2, 3, 1, 0))  # OIHW -> HWIO


def _map_suffix(suffix: str, arr: np.ndarray):
    """(flax subpath, converted array) for one torch parameter inside a
    module group."""
    parts = suffix.split(".")
    if len(parts) == 1:
        name = parts[0]
        if name == "W":  # GaussianFourierProjection
            return ("W",), arr
        if name == "weight":
            if arr.ndim == 4:
                return ("kernel",), _conv_kernel(arr)
            if arr.ndim == 2:
                return ("kernel",), arr.T
            if arr.ndim == 1:  # top-level GroupNorm
                return ("scale",), arr
        if name == "bias":
            return ("bias",), arr
        raise ValueError(f"unrecognized parameter `{suffix}`")
    mod, param = parts[0], parts[1]
    if mod.startswith("GroupNorm_"):
        sub = mod.replace("GroupNorm_", "GroupNormAct_")
        return (sub, "scale" if param == "weight" else "bias"), arr
    if mod.startswith("NIN_"):
        return (mod, "Dense_0", "kernel" if param == "W" else "bias"), arr
    if mod.startswith("Conv2d_"):  # FIR up_or_down_sampling.Conv2d
        sub = mod.replace("Conv2d_", "FIRConv2d_")
        if param == "weight":
            return (sub, "kernel"), _conv_kernel(arr)
        return (sub, "bias"), arr
    if mod.startswith("Conv_"):
        if param == "weight":
            return (mod, "kernel"), _conv_kernel(arr)
        return (mod, "bias"), arr
    if mod.startswith("Dense_"):
        if param == "weight":
            return (mod, "kernel"), arr.T
        return (mod, "bias"), arr
    raise ValueError(f"unrecognized parameter `{suffix}`")


def _set_path(tree: dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _convert(sd: dict[str, np.ndarray], names: list[str], kw,
             clf_head: bool = False) -> dict:
    groups: dict[int, dict[str, np.ndarray]] = defaultdict(dict)
    for key, val in sd.items():
        if not key.startswith("all_modules."):
            raise ValueError(f"unexpected key `{key}` (not all_modules.*)")
        _, idx, suffix = key.split(".", 2)
        groups[int(idx)][suffix] = np.asarray(val, np.float32)
    if sorted(groups) != list(range(len(names))):
        raise ValueError(
            f"module-count mismatch: checkpoint has {len(groups)} "
            f"all_modules entries, the config implies {len(names)}; check "
            "the model overrides match the checkpoint's training config")

    tree: dict = {}
    for i, name in enumerate(names):
        for suffix, arr in groups[i].items():
            if not kw["noise_cond"] and suffix.startswith("Dense_0."):
                # the reference always constructs the temb Dense
                # (temb_dim=nf*4 unconditionally, ncsnpp.py:146,158) but
                # never calls it when noise_cond=False; we only create it
                # when used -- drop the dead parameters
                continue
            if clf_head and i == len(names) - 1 and suffix == "weight":
                # flatten-head permutation: torch flattens NCHW
                # channel-major (ncsnpp_clf.py:279), we flatten NHWC
                n_cls, flat = arr.shape
                res = kw["image_size"] // (2 ** (len(kw["ch_mult"]) - 1))
                ch = flat // (res * res)
                assert ch * res * res == flat, (arr.shape, res)
                arr = (arr.reshape(n_cls, ch, res, res)
                       .transpose(2, 3, 1, 0).reshape(flat, n_cls))
                _set_path(tree, (name, "kernel"), arr)
                continue
            path, val = _map_suffix(suffix, arr)
            _set_path(tree, (name,) + path, val)
    return {"params": tree}


def verify_tree(converted, abstract) -> None:
    """Raise with a readable diff if the converted tree's paths/shapes do
    not exactly match a freshly initialized parameter tree."""
    import jax

    def flat(tree):
        return {
            "/".join(str(k.key) for k in path): tuple(leaf.shape)
            for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    got, want = flat(converted), flat(abstract)
    problems = []
    for k in sorted(set(want) - set(got)):
        problems.append(f"missing: {k} {want[k]}")
    for k in sorted(set(got) - set(want)):
        problems.append(f"unexpected: {k} {got[k]}")
    for k in sorted(set(got) & set(want)):
        if got[k] != want[k]:
            problems.append(f"shape: {k} got {got[k]} want {want[k]}")
    if problems:
        raise ValueError("converted checkpoint does not match the model:\n"
                         + "\n".join(problems))


def load_lightning_state_dict(path: str) -> dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt.get("state_dict", ckpt)
    return {k: np.asarray(v.detach().cpu().numpy())
            for k, v in sd.items() if hasattr(v, "numpy")}


def _strip(sd: dict, prefix: str) -> dict:
    return {k[len(prefix):]: v for k, v in sd.items()
            if k.startswith(prefix)}


def _maybe_scan_layout(params, kw, clf: bool = False):
    """Re-stack a per-block tree into the scan_blocks layout when the
    target config enables it (models/scan_params.py)."""
    if params is None or not kw.get("scan_blocks"):
        return params
    import jax
    import jax.numpy as jnp

    from psld_tpu.models.ncsnpp import NCSNpp, NCSNppClassifier
    from psld_tpu.models.scan_params import to_scanned

    net = (NCSNppClassifier if clf else NCSNpp)(**kw)
    x = jnp.zeros((1, kw["image_size"], kw["image_size"], kw["in_ch"]),
                  jnp.float32)
    t = jnp.full((1,), 0.5, jnp.float32)
    abstract = jax.eval_shape(net.init, jax.random.PRNGKey(0), x, t)
    return to_scanned(params, abstract)


def convert_score_checkpoint(path: str, config):
    """Lightning score checkpoint -> (params, ema_params) flax trees.

    ``config`` is the diffusion config subtree; the model overrides must
    match the checkpoint's training config (the walk is config-derived).
    When the config enables ``scan_blocks``, the trees come back in the
    stacked layout the scanned model expects.
    """
    from psld_tpu.models.ncsnpp import _model_kwargs

    kw = _model_kwargs(config)
    names = score_module_walk(kw)
    sd = load_lightning_state_dict(path)
    online = _strip(sd, "score_fn.")
    ema = _strip(sd, "ema_score_fn.")
    if not online and not ema:
        # a bare NCSNpp state_dict rather than a Lightning wrapper
        online = sd
    params = _convert(online, names, kw) if online else None
    ema_params = _convert(ema, names, kw) if ema else params
    if params is None:
        params = ema_params
    params = _maybe_scan_layout(params, kw)
    ema_params = _maybe_scan_layout(ema_params, kw)
    logger.info("converted %d modules (%d online / %d EMA tensors)",
                len(names), len(online), len(ema))
    return params, ema_params


def convert_clf_checkpoint(path: str, config):
    """Lightning classifier checkpoint -> params flax tree (``config`` is
    the clf config subtree)."""
    from psld_tpu.models.ncsnpp import _model_kwargs_clf

    kw = _model_kwargs_clf(config)
    names = clf_module_walk(kw)
    sd = load_lightning_state_dict(path)
    clf = _strip(sd, "clf_fn.")
    if not clf:
        clf = {k: v for k, v in sd.items() if k.startswith("all_modules.")}
    return _maybe_scan_layout(_convert(clf, names, kw, clf_head=True),
                              kw, clf=True)
