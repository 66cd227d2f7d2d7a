from psld_tpu.serve.server import SamplerService, serve_unix  # noqa: F401
from psld_tpu.serve.client import request  # noqa: F401
