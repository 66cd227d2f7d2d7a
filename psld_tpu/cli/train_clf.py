"""Noise-conditional classifier training entry point
(reference main/train_clf.py)."""

from psld_tpu.cli._common import bootstrap, console as _console


def main(argv=None):
    cfg = bootstrap(argv)
    from psld_tpu.train.loop import train_clf

    return train_clf(cfg.dataset)


cli = _console(main)


if __name__ == "__main__":
    main()
