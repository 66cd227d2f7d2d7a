"""Classifier-guided sampling entry point
(reference main/eval/class_cond_sample.py)."""

from psld_tpu.cli._common import bootstrap, console as _console


def main(argv=None):
    cfg = bootstrap(argv)
    from psld_tpu.eval.generate import class_cond_sample

    return class_cond_sample(cfg.dataset)


cli = _console(main)


if __name__ == "__main__":
    main()
