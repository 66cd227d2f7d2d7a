"""SDEdit-style guided-editing entry point (TPU-native extension; no
reference counterpart -- the reference's guided paths are classifier
guidance, main/eval/class_cond_sample.py, and inpainting,
main/eval/inpaint.py).

Usage mirrors the other eval CLIs::

    python -m psld_tpu.cli.edit +dataset=cifar10/cifar10_psld \
        dataset.diffusion.evaluation.chkpt_path=... \
        dataset.diffusion.evaluation.save_path=... \
        +dataset.diffusion.evaluation.sampler.edit_t0=0.4 \
        dataset.diffusion.evaluation.sampler.name=edit_em_sde
"""

from psld_tpu.cli._common import bootstrap, console as _console


def main(argv=None):
    cfg = bootstrap(argv)
    from psld_tpu.eval.generate import edit

    return edit(cfg.dataset.diffusion)


cli = _console(main)


if __name__ == "__main__":
    main()
