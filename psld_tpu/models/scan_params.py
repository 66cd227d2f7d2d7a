"""Parameter-layout converters for ``model.score_fn.scan_blocks``.

``scan_blocks=True`` folds each same-shape run of (ResBlock [+ Attn]) into
one ``nn.scan`` stack whose parameters carry a leading stack axis under a
self-describing module name ``scan_rb<first>_at<first|-1>_n<len>``: the
indexes are exactly the flax auto-names the UNSCANNED model assigns
(``ResnetBlockBigGAN_<first+s>`` / ``AttnBlock_<first+s>``), and every
non-folded module keeps its unscanned name (pinned explicitly by the model
in scan mode). So conversion is a local stack/unstack per run — no replay
of module-construction order is needed in the scanned->per-block direction,
and the reverse only needs the scanned model's abstract shapes.

Used by: checkpoint migration (per-block orbax ckpts <-> scan_blocks runs)
and the reference-checkpoint import/export path (torch_import/torch_export
always speak the per-block layout; these functions bridge it).
"""

from __future__ import annotations

import re

import jax
import numpy as np

SCAN_RE = re.compile(r"^scan_rb(\d+)_at(-?\d+)_n(\d+)$")


def _unwrap(tree):
    """({'params': t} or t) -> (t, had_params_wrapper)."""
    if isinstance(tree, dict) and set(tree.keys()) == {"params"}:
        return dict(tree["params"]), True
    return dict(tree), False


def _rewrap(tree, wrapped):
    return {"params": tree} if wrapped else tree


def _block_key(inner: dict) -> str:
    """The scan body's single resblock module name (ResnetBlock*_0)."""
    keys = [k for k in inner if k.startswith("ResnetBlock")]
    assert len(keys) == 1, f"scan body with {keys!r} resblocks"
    return keys[0]


def from_scanned(params):
    """scan_blocks layout -> per-block layout (host-side numpy).

    Self-contained: the stack names carry everything needed.
    """
    tree, wrapped = _unwrap(params)
    out = {}
    for name, sub in tree.items():
        m = SCAN_RE.match(name)
        if not m:
            out[name] = sub
            continue
        rb0, at0, n = int(m.group(1)), int(m.group(2)), int(m.group(3))
        bkey = _block_key(sub)
        base = bkey.rsplit("_", 1)[0]  # ResnetBlockBigGAN / ResnetBlockDDPM
        for s in range(n):
            out[f"{base}_{rb0 + s}"] = jax.tree.map(
                lambda a, s=s: np.asarray(a[s]), sub[bkey])
            if at0 >= 0:
                out[f"AttnBlock_{at0 + s}"] = jax.tree.map(
                    lambda a, s=s: np.asarray(a[s]), sub["AttnBlock_0"])
    return _rewrap(out, wrapped)


def to_scanned(params, scanned_abstract):
    """per-block layout -> scan_blocks layout.

    ``scanned_abstract`` is the scanned model's (abstract or concrete)
    param tree — e.g. ``jax.eval_shape(net.init, key, x, t)`` with
    ``scan_blocks=True`` — which tells us which runs exist.
    """
    tree, wrapped = _unwrap(params)
    ab, _ = _unwrap(scanned_abstract)
    out = {}
    consumed: set[str] = set()
    for name, sub in ab.items():
        m = SCAN_RE.match(name)
        if not m:
            continue
        rb0, at0, n = int(m.group(1)), int(m.group(2)), int(m.group(3))
        bkey = _block_key(sub)
        base = bkey.rsplit("_", 1)[0]
        slot_names = [f"{base}_{rb0 + s}" for s in range(n)]
        stacked = {bkey: jax.tree.map(
            lambda *xs: np.stack([np.asarray(x) for x in xs]),
            *[tree[k] for k in slot_names])}
        consumed.update(slot_names)
        if at0 >= 0:
            at_names = [f"AttnBlock_{at0 + s}" for s in range(n)]
            stacked["AttnBlock_0"] = jax.tree.map(
                lambda *xs: np.stack([np.asarray(x) for x in xs]),
                *[tree[k] for k in at_names])
            consumed.update(at_names)
        out[name] = stacked
    for name, sub in tree.items():
        if name not in consumed:
            if name not in ab:
                raise ValueError(
                    f"module {name!r} has no home in the scanned layout")
            out[name] = sub
    missing = set(ab) - set(out)
    if missing:
        raise ValueError(f"scanned layout expects modules {sorted(missing)} "
                         "absent from the per-block tree")
    return _rewrap(out, wrapped)
