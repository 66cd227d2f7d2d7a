"""psld-tpu: a TPU-native JAX/XLA/Pallas framework for Phase Space Langevin
Diffusion (PSLD) generative models.

Re-implements, TPU-first, the capabilities of the reference PyTorch codebase
(mandt-lab/PSLD): SDE-defined score-based diffusion training (HSM/DSM),
Euler--Maruyama / SSCS / guided / inpainting / probability-flow-ODE sampling,
noise-conditional classifier guidance, and on-device FID evaluation.

Design stance (not a port):
  * pure-functional SDE math over pytrees (no global state),
  * NHWC layouts and flax.linen score networks,
  * samplers as single compiled ``lax.scan`` programs (zero host sync/step),
  * data parallelism via ``jax.sharding.Mesh`` + jit sharding over ICI,
  * per-batch scalar SDE coefficients in float64 (software floats on TPU are
    cheap at per-batch-scalar shapes), tensors in float32/bfloat16.

Entry points mirror the reference CLI surface (see ``psld_tpu.cli``).
"""

__version__ = "0.1.0"

from psld_tpu.registry import register_module, get_module  # noqa: F401


def enable_x64() -> None:
    """Enable float64 in JAX.

    The PSLD perturbation-kernel coefficient pipeline (functions of the
    per-batch time vector only) needs float64 near t -> 0; all entry points
    call this before touching jax. Library code adapts to either mode via
    :func:`psld_tpu.utils.numerics.time_dtype`.

    Every entry point runs through here, so it also applies the host
    allocator tuning for slow-page-fault hosts (utils/hostmem.py;
    PSLD_NO_MALLOC_TUNE=1 to skip).
    """
    from psld_tpu.utils.hostmem import tune_host_allocator

    tune_host_allocator()

    import jax

    jax.config.update("jax_enable_x64", True)


def setup_cache(path: str = "/root/.cache/jax_comp") -> None:
    """Enable the persistent XLA compilation cache (entry points call this;
    first-compile of the 100M-param nets is ~30s+, cached afterwards)."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without the knobs
        pass


def import_modules_into_registry() -> None:
    """Import all component packages so their ``@register_module`` decorators
    populate the registry (reference parity: main/util.py:116-121)."""
    import psld_tpu.sde  # noqa: F401
    import psld_tpu.models  # noqa: F401
    import psld_tpu.losses  # noqa: F401
    import psld_tpu.samplers  # noqa: F401
    import psld_tpu.data  # noqa: F401
