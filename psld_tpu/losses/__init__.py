from psld_tpu.losses.score import (  # noqa: F401
    PSLDScoreLoss,
    PSLDTimeCELoss,
    ScoreLoss,
)
