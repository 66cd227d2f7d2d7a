from psld_tpu.sde.base import SDE  # noqa: F401
from psld_tpu.sde.psld import PSLD  # noqa: F401
from psld_tpu.sde.vpsde import VPSDE  # noqa: F401
