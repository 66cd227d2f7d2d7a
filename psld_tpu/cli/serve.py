"""Sampler serving entry point: load a checkpoint, compile the sampler
ONCE, and answer sample requests over a Unix socket (JSON lines; protocol
in psld_tpu/serve/server.py). Repeated sampling jobs stop paying model
load + XLA compile per invocation.

Usage::

    python -m psld_tpu.cli.serve --socket /tmp/psld.sock \
        +dataset=cifar10/cifar10_psld \
        dataset.diffusion.evaluation.chkpt_path=... <overrides>

    # then, from any process:
    python - <<'PY'
    from psld_tpu.serve import request
    print(request("/tmp/psld.sock",
                  {"cmd": "sample", "n": 64, "seed": 1, "out": "/tmp/out"}))
    PY
"""

from __future__ import annotations

import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    socket_path = "/tmp/psld.sock"
    if "--socket" in argv:
        i = argv.index("--socket")
        socket_path = argv[i + 1]
        del argv[i:i + 2]

    from psld_tpu.cli._common import bootstrap

    cfg = bootstrap(argv)

    from psld_tpu.serve.server import serve_unix

    serve_unix(cfg.dataset.diffusion, socket_path)


if __name__ == "__main__":
    main()
