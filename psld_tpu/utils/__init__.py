from psld_tpu.utils.numerics import bcast_right, time_dtype  # noqa: F401
