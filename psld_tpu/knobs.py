"""Resolved performance knobs: config-keyed, env-overridable, recorded.

Round-3 verdict finding: behavior-changing performance toggles lived only
in env vars, invisible to run metadata — a run's numerics could differ
with no trace in its config or checkpoints. This module makes the config
tree the source of truth and the env vars overrides:

==================  =============================  ====================
config key          meaning                         env override
==================  =============================  ====================
model.score_fn.     Pallas fused GroupNorm->act     PSLD_FUSED_GN=1/0
  fused_gn          kernel (measured SLOWER on the
                    flagship — default False,
                    PARITY "Measured TPU numbers")
model.score_fn.     lane-pad non-128-multiple       PSLD_PAD_ATTN=1/0
  pad_attn          attention widths for the
                    Pallas kernel (measured slower
                    at C=320 — default False)
model.score_fn.     resblock dropout impl           PSLD_DROPOUT_PALLAS /
  dropout_impl      (save_mask | hw |               PSLD_DROPOUT_REMAT
                    hw_inline | remat)
model.score_fn.     GroupNorm normalize/act chain   PSLD_GN_BF16=1/0
  gn_bf16           in the input dtype for bf16
                    inputs (moment sums stay f32);
                    the 256px bandwidth lever
==================  =============================  ====================

``dropout_impl`` threads through the model constructor
(models/ncsnpp.py); ``fused_gn`` / ``pad_attn`` are dispatch decisions
deep inside ops with no config in scope, so ``configure(config)`` — run
by the model builders (train/loop.py) — latches them process-globally
before anything traces. ``resolved(config)`` reports the effective
values; the training loop writes them into the metrics-JSONL header and
every checkpoint's ``.meta.json`` so numerics are reproducible from
artifacts (reference: the Hydra config tree as the public API,
README.md:68-99).
"""

from __future__ import annotations

import os

_DEFAULTS = {"fused_gn": False, "pad_attn": False, "gn_bf16": False}
# None = not configured yet (ops fall back to env-or-default)
_state: dict = {k: None for k in _DEFAULTS}


def _env_bool(name: str) -> bool | None:
    v = os.environ.get(name)
    if v is None or v == "":
        return None
    return v == "1"


def configure(config) -> dict:
    """Latch the op-level knobs from a diffusion/clf config subtree
    (``model.score_fn`` or ``model.clf_fn``); returns :func:`resolved`.
    Later calls overwrite — the last model built wins, matching the
    one-model-per-process entry points."""
    model = config.get("model") if hasattr(config, "get") else None
    sf = None
    if model is not None:
        sf = model.get("score_fn") or model.get("clf_fn")
    for key in _DEFAULTS:
        if sf is not None and sf.get(key) is not None:
            _state[key] = bool(sf.get(key))
    return resolved(config)


def fused_gn() -> bool:
    env = _env_bool("PSLD_FUSED_GN")
    if env is not None:
        return env
    v = _state["fused_gn"]
    return _DEFAULTS["fused_gn"] if v is None else v


def pad_attn() -> bool:
    env = _env_bool("PSLD_PAD_ATTN")
    if env is not None:
        return env
    v = _state["pad_attn"]
    return _DEFAULTS["pad_attn"] if v is None else v


def gn_bf16() -> bool:
    env = _env_bool("PSLD_GN_BF16")
    if env is not None:
        return env
    v = _state["gn_bf16"]
    return _DEFAULTS["gn_bf16"] if v is None else v


def resolved(config=None) -> dict:
    """The effective knob values (env overrides applied) for run metadata.
    With a config, also reports the model-threaded ``dropout_impl``."""
    from psld_tpu.models.layers import resolve_dropout_impl

    out = {"fused_gn": fused_gn(), "pad_attn": pad_attn(),
           "gn_bf16": gn_bf16()}
    if config is not None:
        sf = None
        model = config.get("model") if hasattr(config, "get") else None
        if model is not None:
            sf = model.get("score_fn") or model.get("clf_fn")
        impl = str(sf.get("dropout_impl", "save_mask")) if sf is not None \
            else "save_mask"
        out["dropout_impl"] = resolve_dropout_impl(impl)
    return out
