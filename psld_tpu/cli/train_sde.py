"""Unconditional score-model training entry point
(reference main/train_sde.py). Usage:

    python -m psld_tpu.cli.train_sde +dataset=cifar10/cifar10_psld \
        dataset.diffusion.data.root=... dataset.diffusion.training.results_dir=...
"""

from psld_tpu.cli._common import bootstrap, console as _console


def main(argv=None):
    cfg = bootstrap(argv)
    from psld_tpu.train.loop import train_sde

    return train_sde(cfg.dataset.diffusion)


cli = _console(main)


if __name__ == "__main__":
    main()
