"""Speed-vs-quality sweep: sampler x NFE x stride -> JSONL.

Productizes the paper's FID-vs-NFE study (the reference runs it by hand,
editing n_discrete_steps in
scripts_psld/sota/uncond/cifar10/sample_uncond_psld.sh:31-33 between runs):
one command samples the same checkpoint under every requested
(sampler, NFE, stride) combination and emits one JSON line per combination
with throughput plus whatever quality metric the host can compute --
FID when Inception weights are supplied, weight-free pixel statistics
against a reference directory otherwise.

Compile-cost note for tunneled TPU backends: compiled sampler programs are
shared across combinations through a jit cache keyed on (sampler, NFE)
-- the timestep grid is a traced argument, so stride changes reuse the
program. Each (sampler, NFE) pair pays one compile, folded into the first
stride's elapsed time and flagged `includes_compile` in its record.
"""

from __future__ import annotations

import json
import logging
import os
import time

logger = logging.getLogger(__name__)


def _make_quality_fn(ref_dir, ref_stats, weights, batch, swd=False,
                     kid=False):
    """Builds the per-directory quality metric closure ONCE: the Inception
    net, its jitted feature fn, and the reference-side moments are
    invariant across the sweep (recomputing the data moments per combo
    would push the full reference set through InceptionV3 dozens of
    times)."""
    if not (ref_dir or weights):
        return lambda gen_dir: {}

    feature_fn = mu2 = cov2 = ref_feats = None
    if weights:
        from psld_tpu.cli.fid import collect
        from psld_tpu.eval.fid import (load_stats, load_torch_checkpoint,
                                       make_feature_fn)

        feature_fn = make_feature_fn(load_torch_checkpoint(weights))
        if kid and not ref_dir:
            raise ValueError("KID needs --ref-dir (raw features, not .npz "
                             "moments)")
        if ref_stats and not kid:
            mu2, cov2 = load_stats(ref_stats)
        elif ref_dir:
            m2, ref_feats, _ = collect(ref_dir, feature_fn, batch,
                                       want_feats=kid, want_logits=False)
            mu2, cov2 = m2.finalize()
        else:
            raise ValueError("FID needs --ref-dir or --ref-stats")

    def quality(gen_dir):
        out = {}
        if ref_dir:
            from psld_tpu.eval.pixel_stats import compare_dirs

            out["pixel_stats"] = compare_dirs(gen_dir, ref_dir)
            if swd:
                from psld_tpu.eval.swd import swd_dirs

                out["swd"] = swd_dirs(gen_dir, ref_dir)
        if feature_fn is not None:
            from psld_tpu.cli.fid import collect
            from psld_tpu.eval.fid import frechet_distance, kid_from_features

            m1, gen_feats, _ = collect(gen_dir, feature_fn, batch,
                                       want_feats=kid, want_logits=False)
            mu1, cov1 = m1.finalize()
            out["fid"] = float(frechet_distance(mu1, cov1, mu2, cov2))
            if kid:
                kid_mean, kid_std = kid_from_features(gen_feats, ref_feats)
                out["kid"] = kid_mean
                out["kid_std"] = kid_std
        return out

    return quality


def run_sweep(config, samplers, nfes, strides, out_dir, ref_dir=None,
              ref_stats=None, weights=None, fid_batch=64,
              swd=False, kid=False, preloaded=None, jit_cache=None) -> list:
    """Sample `config`'s checkpoint under every combination; returns the
    list of result records (also appended to <out_dir>/sweep.jsonl).

    ``preloaded=(net, params)`` / ``jit_cache`` (caller-owned dict) let a
    driver split one logical sweep across several calls — e.g. different
    NFE subsets per stride — without reloading the checkpoint or
    recompiling shared sampler programs between calls."""
    from psld_tpu.config import ConfigDict
    from psld_tpu.eval.generate import load_eval_state, sample

    if str(config.evaluation.save_mode) != "image":
        raise ValueError("the sweep's quality metrics read PNG directories;"
                         " set evaluation.save_mode=image")
    if preloaded is None:
        preloaded = load_eval_state(config)
    quality = _make_quality_fn(ref_dir, ref_stats, weights, fid_batch,
                               swd=swd, kid=kid)
    os.makedirs(out_dir, exist_ok=True)
    jsonl = os.path.join(out_dir, "sweep.jsonl")
    if jit_cache is None:
        jit_cache = {}
    results = []
    compiled = set()
    for sampler_name in samplers:
        for nfe in nfes:
            for stride in strides:
                cfg = ConfigDict(config.to_dict())
                ecfg = cfg.evaluation
                ecfg.sampler.name = sampler_name
                ecfg.n_discrete_steps = int(nfe)
                ecfg.stride_type = stride
                tag = f"{sampler_name}_nfe{nfe}_{stride}"
                save = os.path.join(out_dir, tag)
                ecfg.save_path = save
                first = (sampler_name, int(nfe)) not in compiled
                compiled.add((sampler_name, int(nfe)))
                logger.info("sweep: %s", tag)
                t0 = time.time()
                n = sample(cfg, preloaded=preloaded, jit_cache=jit_cache)
                elapsed = time.time() - t0
                rec = {
                    "sampler": sampler_name,
                    "nfe": int(nfe),
                    "stride": stride,
                    "n_samples": int(n),
                    "elapsed_s": round(elapsed, 3),
                    "img_per_s": round(n / elapsed, 4) if elapsed else None,
                    # one-time XLA compile lands in the first stride of
                    # each (sampler, NFE); later strides reuse the program
                    "includes_compile": first,
                }
                gen_dir = save
                prefix = str(ecfg.path_prefix)
                if prefix:
                    gen_dir = os.path.join(gen_dir, prefix)
                gen_dir = os.path.join(gen_dir, "images")
                try:
                    rec.update(quality(gen_dir))
                except Exception as e:  # quality is best-effort per combo
                    rec["quality_error"] = str(e)
                results.append(rec)
                with open(jsonl, "a") as f:
                    f.write(json.dumps(rec) + "\n")
                print(json.dumps(rec), flush=True)
    return results
