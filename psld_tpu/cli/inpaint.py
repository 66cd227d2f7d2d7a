"""Inpainting entry point (reference main/eval/inpaint.py)."""

from psld_tpu.cli._common import bootstrap, console as _console


def main(argv=None):
    cfg = bootstrap(argv)
    from psld_tpu.eval.generate import inpaint

    return inpaint(cfg.dataset.diffusion)


cli = _console(main)


if __name__ == "__main__":
    main()
