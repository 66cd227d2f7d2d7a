from psld_tpu.samplers.base import Sampler, make_timesteps  # noqa: F401
from psld_tpu.samplers.sde_samplers import (  # noqa: F401
    ClassCondEulerMaruyamaSampler,
    EulerMaruyamaInpainter,
    EulerMaruyamaSampler,
    SSCSSampler,
)
from psld_tpu.samplers.ode import BBODESampler, RKODESampler  # noqa: F401
from psld_tpu.samplers.correctors import (  # noqa: F401
    LangevinCorrector,
    build_corrector,
)
