"""Export psld-tpu parameters back into reference (mandt-lab/PSLD) form.

The inverse of :mod:`psld_tpu.train.torch_import`: walks the same
config-derived module order (reference ``all_modules`` append order,
ncsnpp.py:168-284 / ncsnpp_clf.py:100-196) and converts each flax
parameter back to the reference's torch layout, producing a Lightning-style
``{"state_dict": {...}}`` checkpoint the reference wrapper can
``load_state_dict`` strictly (wrapper.py:31 key prefixes). This closes the
interop loop: models trained here can be evaluated or fine-tuned with the
reference's own tooling (e.g. torch-fidelity FID on GPU hosts).

Layout inverses:

* Conv/FIRConv2d kernel (kh, kw, I, O) -> Conv2d weight (O, I, kh, kw)
* Dense kernel (I, O)                  -> Linear weight (O, I)
* GroupNormAct scale/bias              -> GroupNorm weight/bias
* NIN Dense_0 kernel/bias              -> NIN W (in, out) / b
* classifier head (H*W*C, n_cls)       -> (n_cls, C*H*W) with the NHWC ->
  NCHW flatten permutation (ncsnpp_clf.py:279)

Only ``noise_cond=True`` models are exportable (every published reference
config): with ``noise_cond=False`` the reference still constructs dead
per-resblock temb Dense parameters (ncsnpp.py:146,158) that we never
create, so a strict state_dict cannot be reconstructed.
"""

from __future__ import annotations

import numpy as np

from psld_tpu.train.torch_import import clf_module_walk, score_module_walk


def _conv_kernel_inv(arr):
    return np.ascontiguousarray(np.transpose(arr, (3, 2, 0, 1)))  # HWIO -> OIHW


def _flatten(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, prefix + (k,))
    else:
        yield prefix, np.asarray(tree, np.float32)


def _unmap(path, arr):
    """Inverse of torch_import._map_suffix: flax subpath inside one module
    group -> torch suffix + torch-layout array."""
    if len(path) == 1:
        name = path[0]
        if name == "W":
            return "W", arr
        if name == "kernel":
            if arr.ndim == 4:
                return "weight", _conv_kernel_inv(arr)
            return "weight", np.ascontiguousarray(arr.T)
        if name == "scale":
            return "weight", arr
        if name == "bias":
            return "bias", arr
        raise ValueError(f"unrecognized flax parameter {path}")
    mod = path[0]
    if mod.startswith("GroupNormAct_"):
        tmod = mod.replace("GroupNormAct_", "GroupNorm_")
        return (f"{tmod}.weight" if path[1] == "scale" else f"{tmod}.bias",
                arr)
    if mod.startswith("NIN_"):
        # flax: NIN_k/Dense_0/{kernel,bias}; torch NIN stores W (in, out)
        # and b in the SAME layout as the Dense kernel -- no transpose
        param = "W" if path[2] == "kernel" else "b"
        return f"{mod}.{param}", arr
    if mod.startswith("FIRConv2d_"):
        tmod = mod.replace("FIRConv2d_", "Conv2d_")
        if path[1] == "kernel":
            return f"{tmod}.weight", _conv_kernel_inv(arr)
        return f"{tmod}.bias", arr
    if mod.startswith("Conv_"):
        if path[1] == "kernel":
            return f"{mod}.weight", _conv_kernel_inv(arr)
        return f"{mod}.bias", arr
    if mod.startswith("Dense_"):
        if path[1] == "kernel":
            return f"{mod}.weight", np.ascontiguousarray(arr.T)
        return f"{mod}.bias", arr
    raise ValueError(f"unrecognized flax parameter {path}")


def _export(params: dict, names: list[str], kw,
            clf_head: bool = False) -> dict[str, np.ndarray]:
    if not kw["noise_cond"]:
        raise ValueError(
            "export requires noise_cond=True: the reference constructs "
            "dead temb Dense parameters we cannot reconstruct")
    tree = params["params"] if "params" in params else params
    from psld_tpu.models.scan_params import SCAN_RE, from_scanned

    if any(SCAN_RE.match(k) for k in tree):
        # scan_blocks layout: unstack to per-block before the walk
        tree = from_scanned(tree)
    unknown = sorted(set(tree) - set(names))
    if unknown:
        raise ValueError(f"modules not in the reference walk: {unknown}")
    sd: dict[str, np.ndarray] = {}
    index_of = {}
    for i, name in enumerate(names):
        # a flax name can only appear once (namer counters are unique)
        index_of[name] = i
    for name, sub in tree.items():
        i = index_of[name]
        if clf_head and i == len(names) - 1:
            # flatten head: (H*W*C, n_cls) NHWC-major -> (n_cls, C*H*W)
            arr = np.asarray(sub["kernel"], np.float32)
            flat, n_cls = arr.shape
            res = kw["image_size"] // (2 ** (len(kw["ch_mult"]) - 1))
            ch = flat // (res * res)
            assert ch * res * res == flat, (arr.shape, res)
            sd[f"all_modules.{i}.weight"] = np.ascontiguousarray(
                arr.reshape(res, res, ch, n_cls)
                .transpose(3, 2, 0, 1).reshape(n_cls, flat))
            continue
        for path, arr in _flatten(sub):
            suffix, out = _unmap(path, arr)
            sd[f"all_modules.{i}.{suffix}"] = out
    return sd


def export_score_state_dict(params, ema_params, config) -> dict:
    """(params, ema_params) flax trees -> reference Lightning ``state_dict``
    with ``score_fn.`` / ``ema_score_fn.`` prefixes (wrapper.py:31)."""
    from psld_tpu.models.ncsnpp import _model_kwargs

    kw = _model_kwargs(config)
    names = score_module_walk(kw)
    sd = {}
    for key, val in _export(params, names, kw).items():
        sd[f"score_fn.{key}"] = val
    for key, val in _export(ema_params, names, kw).items():
        sd[f"ema_score_fn.{key}"] = val
    return sd


def export_clf_state_dict(params, config) -> dict:
    """Classifier flax tree -> reference ``state_dict`` with the
    ``clf_fn.`` prefix (clf_wrapper.py)."""
    from psld_tpu.models.ncsnpp import _model_kwargs_clf

    kw = _model_kwargs_clf(config)
    names = clf_module_walk(kw)
    return {f"clf_fn.{key}": val
            for key, val in _export(params, names, kw,
                                    clf_head=True).items()}


def save_lightning_checkpoint(path: str, state_dict: dict,
                              step: int = 0) -> None:
    """Write a torch-loadable Lightning-style checkpoint file."""
    import torch

    torch.save(
        {"state_dict": {k: torch.from_numpy(np.array(v, copy=True))
                        for k, v in state_dict.items()},
         "global_step": int(step), "epoch": 0},
        path)
