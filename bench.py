"""Driver benchmark: CIFAR-10 img/sec/chip at 1000-NFE EM sampling.

Thin wrapper over :mod:`psld_tpu.eval.bench` (also installed as the
``psld-bench`` console script). Prints ONE JSON line.
"""

from psld_tpu.eval.bench import main

if __name__ == "__main__":
    main()
